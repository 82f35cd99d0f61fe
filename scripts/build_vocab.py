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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--n-images", type=int, default=96)
    ap.add_argument("--out", default="orb_slam_tpu/data/vocab_k10L4.npz")
    args = ap.parse_args()

    from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor, _extract_stacked
    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory, ring_trajectory
    from orb_slam_tpu.place.vocabulary import train_vocabulary, save_npz, transform

    cfg = ORBConfig(n_features=1200, n_levels=8)
    ex = ORBExtractor(cfg)

    docs = []
    t0 = time.time()
    n_per = args.n_images // 4
    scenes = [
        (SyntheticScene(n_points=500, seed=11, width=640, height=480),
         lateral_trajectory(n_per, step=0.1)),
        (SyntheticScene(n_points=700, seed=23, width=640, height=480,
                        extent=(10.0, 6.0, 4.0), depth_range=(5.0, 14.0)),
         lateral_trajectory(n_per, step=0.12, yaw_rate=0.01)),
        (SyntheticScene(n_points=900, seed=37, width=640, height=480,
                        ring=True, depth_range=(7.0, 12.0)),
         ring_trajectory(n_per, orbit_radius=2.0)),
        (SyntheticScene(n_points=600, seed=51, width=640, height=480,
                        ring=True, depth_range=(6.0, 10.0)),
         ring_trajectory(n_per, orbit_radius=1.5)),
    ]
    consts_cache = {}
    for s_i, (scene, poses) in enumerate(scenes):
        shape = (scene.height, scene.width)
        if shape not in consts_cache:
            consts_cache[shape] = ex.pyramid_consts(shape)
        for i, T in enumerate(poses):
            img = jnp.asarray(scene.render_image(T, patch=6))
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
