"""Deterministic ORB vocabulary build (the reference ships a pre-trained
~1M-word ORBvoc.txt, README.md:119; we cannot download it offline, so we
train a real-scale k=10 L=4 (~10^4-word) vocabulary on a rendered corpus
through the REAL extractor and check in the compact artifact).

Usage: python scripts/build_vocab.py [--L 4] [--out orb_slam_tpu/data/vocab_k10L4.npz]
Deterministic: fixed seeds everywhere."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def make_corpus_scenes(n_scenes, frames_per_scene, seed0=11):
    """A varied rendered corpus: scenes differ in point density, world
    extent, depth range, geometry (billboard wall vs cylindrical ring),
    trajectory shape and (via the caller) billboard texture scale and
    photometric conditions. Held-out seeds >= 9000 are reserved for
    retrieval evaluation (scripts/eval_vocab_retrieval.py) and never
    appear here."""
    from orb_slam_tpu.io.synthetic import (
        SyntheticScene, lateral_trajectory, ring_trajectory,
    )
    rng = np.random.default_rng(seed0)
    out = []
    for s in range(n_scenes):
        ring = (s % 3 == 2)
        n_points = int(rng.integers(400, 1000))
        seed = seed0 + 101 * s
        if ring:
            scene = SyntheticScene(
                n_points=n_points, seed=seed, width=640, height=480,
                ring=True,
                depth_range=(float(rng.uniform(5.5, 8.0)),
                             float(rng.uniform(9.0, 14.0))))
            traj = ring_trajectory(frames_per_scene,
                                   orbit_radius=float(rng.uniform(1.2, 2.5)))
        else:
            scene = SyntheticScene(
                n_points=n_points, seed=seed, width=640, height=480,
                extent=(float(rng.uniform(6.0, 12.0)),
                        float(rng.uniform(4.0, 8.0)),
                        float(rng.uniform(2.0, 5.0))),
                depth_range=(float(rng.uniform(4.0, 6.0)),
                             float(rng.uniform(8.0, 16.0))))
            traj = lateral_trajectory(
                frames_per_scene, step=float(rng.uniform(0.06, 0.15)),
                yaw_rate=float(rng.uniform(0.0, 0.02)))
        out.append((scene, traj))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--n-images", type=int, default=96)
    ap.add_argument("--n-scenes", type=int, default=12)
    ap.add_argument("--out", default="orb_slam_tpu/data/vocab_k10L4.npz")
    args = ap.parse_args()

    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor, _extract_stacked
    from orb_slam_tpu.place.vocabulary import train_vocabulary, save_npz, transform

    cfg = ORBConfig(n_features=1200, n_levels=8)
    ex = ORBExtractor(cfg)

    docs = []
    t0 = time.time()
    scenes = make_corpus_scenes(args.n_scenes,
                                args.n_images // args.n_scenes)
    consts_cache = {}
    photo_rng = np.random.default_rng(777)
    for s_i, (scene, poses) in enumerate(scenes):
        shape = (scene.height, scene.width)
        if shape not in consts_cache:
            consts_cache[shape] = ex.pyramid_consts(shape)
        for i, T in enumerate(poses):
            # per-frame photometric variation: the corpus should span the
            # appearance conditions the database will see, not one fixed
            # exposure (the reference's ORBvoc is trained on varied real
            # imagery, README.md:119)
            img = jnp.asarray(scene.render_image(
                T, patch=3 + (s_i % 4),
                exposure=float(photo_rng.uniform(0.8, 1.2)),
                bias=float(photo_rng.uniform(-6, 6)),
                vignette=float(photo_rng.uniform(0.0, 0.3)),
                noise=float(photo_rng.uniform(0.0, 2.5)),
                quantize=True, photo_seed=int(photo_rng.integers(1 << 30))))
            feats = _extract_stacked(img, consts_cache[shape], config=cfg)
            d = np.asarray(feats.desc_u32)[np.asarray(feats.valid)]
            docs.append(d)
            print(f"\rscene {s_i} frame {i}: {len(d)} descs "
                  f"(total {sum(len(x) for x in docs)})", end="",
                  file=sys.stderr)
    print(file=sys.stderr)

    corpus = np.concatenate(docs)
    print(f"corpus: {len(corpus)} descriptors from {len(docs)} images "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    t0 = time.time()
    voc = train_vocabulary(corpus, k=args.k, L=args.L, seed=0,
                           documents=docs)
    print(f"trained: {voc.n_words} words, {len(voc.node_desc)} nodes "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    save_npz(voc, args.out)
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out)/1e6:.2f} MB)", file=sys.stderr)


if __name__ == "__main__":
    main()
