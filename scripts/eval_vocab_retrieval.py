"""Retrieval-quality evaluation for ORB vocabularies (VERDICT round-2 #4).

Protocol: held-out ring sequences (seeds >= 9000, never in the training
corpus) where the camera orbits a cylindrical scene twice — lap 2 revisits
lap 1's viewpoints, giving unambiguous ground truth: frame j is RELEVANT
to query i iff their orbit angles are within `angle_tol` and |i-j| is
outside the temporal-neighbor window (the loop detector's covisibility
exclusion, reference KeyFrameDatabase.cc:92-196 excludes connected KFs).

For each vocabulary we report precision@1 / precision@5 / recall@5 over
all queries with at least one relevant frame, plus the mean score margin
between the best relevant and best irrelevant candidate (what the 0.75x
accumulated-score cut actually acts on). The reference ships a ~1M-word
vocabulary trained on real imagery (src/main.cc:94-108); this measures
how retrieval changes as our vocabulary scales toward that regime.

Usage: python scripts/eval_vocab_retrieval.py vocabA.npz [vocabB.npz ...]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp


def held_out_sequences(n_frames=96, seeds=(9001, 9011)):
    from orb_slam_tpu.io.synthetic import SyntheticScene, ring_trajectory
    seqs = []
    for seed in seeds:
        scene = SyntheticScene(n_points=800, seed=seed, width=640,
                               height=480, ring=True,
                               depth_range=(6.0, 11.0))
        # two laps: angle(i) = 4*pi * i / n_frames
        poses = ring_trajectory(n_frames, orbit_radius=1.8,
                                total_angle=4.0 * np.pi)
        angles = 4.0 * np.pi * np.arange(n_frames) / n_frames
        seqs.append((scene, poses, angles))
    return seqs


def extract_docs(scene, poses):
    from orb_slam_tpu.frontend.orb_extractor import (
        ORBConfig, ORBExtractor, _extract_stacked,
    )
    cfg = ORBConfig(n_features=1000, n_levels=8)
    ex = ORBExtractor(cfg)
    consts = ex.pyramid_consts((scene.height, scene.width))
    prng = np.random.default_rng(5)
    descs, valids = [], []
    for i, T in enumerate(poses):
        img = jnp.asarray(scene.render_image(
            T, exposure=float(prng.uniform(0.9, 1.1)), noise=1.5,
            quantize=True, photo_seed=i))
        f = _extract_stacked(img, consts, config=cfg)
        descs.append(np.asarray(f.desc_u32))
        valids.append(np.asarray(f.valid))
        print(f"\rextract {i+1}/{len(poses)}", end="", file=sys.stderr)
    print(file=sys.stderr)
    return descs, valids


def eval_vocab(voc, descs, valids, angles, angle_tol=0.35, neighbor=8):
    from orb_slam_tpu.place.vocabulary import transform, bow_vector, l1_score

    n = len(descs)
    bows = []
    for d, v in zip(descs, valids):
        words = np.asarray(transform(voc, jnp.asarray(d), jnp.asarray(v)))
        w = np.asarray(voc.word_weight)
        ids, wv = bow_vector(words[words >= 0], w)
        bows.append((np.asarray(ids), np.asarray(wv)))

    ang = np.asarray(angles)
    d_ang = np.abs(((ang[:, None] - ang[None, :]) + np.pi) % (2 * np.pi)
                   - np.pi)
    relevant = d_ang < angle_tol
    idx = np.arange(n)
    excluded = np.abs(idx[:, None] - idx[None, :]) <= neighbor
    relevant = relevant & ~excluded

    p1 = p5 = r5 = 0.0
    margins = []
    n_q = 0
    for i in range(n):
        rel = relevant[i]
        if not rel.any():
            continue
        n_q += 1
        scores = np.full(n, -1.0)
        for j in range(n):
            if excluded[i, j]:
                continue
            scores[j] = float(l1_score(*bows[i], *bows[j]))
        order = np.argsort(-scores)
        top5 = order[:5]
        p1 += float(rel[order[0]])
        p5 += float(rel[top5].sum()) / 5.0
        r5 += float(rel[top5].sum()) / min(5, int(rel.sum()))
        best_rel = scores[rel].max()
        irr = ~rel & ~excluded[i]
        best_irr = scores[irr].max() if irr.any() else 0.0
        margins.append(best_rel - best_irr)
    return {
        "n_words": int(voc.n_words),
        "p_at_1": round(p1 / n_q, 3),
        "p_at_5": round(p5 / n_q, 3),
        "r_at_5": round(r5 / n_q, 3),
        "mean_margin": round(float(np.mean(margins)), 4),
        "n_queries": n_q,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vocabs", nargs="+")
    ap.add_argument("--n-frames", type=int, default=96)
    args = ap.parse_args()

    from orb_slam_tpu.place.vocabulary import load_npz

    seqs = held_out_sequences(args.n_frames)
    cached = [extract_docs(scene, poses) for scene, poses, _ in seqs]

    results = {}
    for path in args.vocabs:
        voc = load_npz(path)
        per_seq = []
        for (descs, valids), (_, _, angles) in zip(cached, seqs):
            per_seq.append(eval_vocab(voc, descs, valids, angles))
            print(f"{path}: {per_seq[-1]}", file=sys.stderr)
        agg = {k: round(float(np.mean([s[k] for s in per_seq])), 3)
               for k in ("p_at_1", "p_at_5", "r_at_5", "mean_margin")}
        agg["n_words"] = per_seq[0]["n_words"]
        agg["per_seq"] = per_seq
        results[os.path.basename(path)] = agg
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
