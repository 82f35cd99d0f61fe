"""Pretrained vocabulary artifact loader.

The reference loads ~1M-word ORBvoc.txt at startup (main.cc:94-108). This
package ships a real-scale vocabulary trained on a rendered corpus through
the real extractor (scripts/build_vocab.py, deterministic); `load_pretrained`
returns it, cached per process, or None if no artifact is present."""

from __future__ import annotations

import os

_CACHE = {}

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def load_pretrained(name: str = None):
    """Default: the largest shipped vocabulary (the reference defaults to
    its ~1M-word ORBvoc, main.cc:94-108; we ship a ~1e5-word k=10 L=5
    tree trained on a varied rendered corpus, falling back to the compact
    k=10 L=4 artifact)."""
    if name is None:
        for cand in ("vocab_k10L5.npz", "vocab_k10L4.npz"):
            if os.path.exists(os.path.normpath(
                    os.path.join(DATA_DIR, cand))):
                name = cand
                break
        else:
            return None
    if name in _CACHE:
        return _CACHE[name]
    path = os.path.normpath(os.path.join(DATA_DIR, name))
    voc = None
    if os.path.exists(path):
        from orb_slam_tpu.place.vocabulary import load_npz

        voc = load_npz(path)
    _CACHE[name] = voc
    return voc
