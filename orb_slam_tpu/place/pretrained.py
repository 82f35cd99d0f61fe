"""Pretrained vocabulary artifact loader.

The reference loads ~1M-word ORBvoc.txt at startup (main.cc:94-108). This
package ships a real-scale vocabulary trained on a rendered corpus through
the real extractor (scripts/build_vocab.py, deterministic); `load_pretrained`
returns it, cached per process, or None if no artifact is present."""

from __future__ import annotations

import os

_CACHE = {}

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def load_pretrained(name: str = "vocab_k10L4.npz"):
    if name in _CACHE:
        return _CACHE[name]
    path = os.path.normpath(os.path.join(DATA_DIR, name))
    voc = None
    if os.path.exists(path):
        from orb_slam_tpu.place.vocabulary import load_npz

        voc = load_npz(path)
    _CACHE[name] = voc
    return voc
