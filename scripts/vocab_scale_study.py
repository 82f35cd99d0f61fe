"""Vocabulary machinery at the reference's REAL scale (VERDICT r4 #5).

The reference ships ORBvoc.txt: a k=10, L=6 tree with ~1M words /
~1.11M nodes that main.cc:94-108 loads at startup and
TemplatedVocabulary.h:1213-1260 descends per descriptor. Training such a
vocabulary is corpus-bound (PERF.md reasoned stop), but the MACHINERY —
text parse, memory footprint, batched transform, retrieval — must be
demonstrated at that node count, not extrapolated. This study synthesizes
a full k=10 L=6 tree (random node descriptors; no training claim) and
measures:

  1. DBoW2-text write + NATIVE mmap parse time at ~1.11M nodes;
  2. host + device memory footprint of the flat arrays;
  3. batched transform latency at 1000 desc/frame (the production
     per-frame BoW cost), cold and steady-state;
  4. retrieval sanity on a synthetic corpus (perturbed re-observations
     must out-score distinct images).

Usage: python scripts/vocab_scale_study.py [--out VOCABSCALE.json]
       [--k 10] [--L 6] [--backend cpu|default]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_full_tree(k: int, L: int, seed: int = 0):
    """A complete k-ary tree of depth L with random binary node
    descriptors, in the same flat-array layout train_vocabulary emits.
    Leaves = the k^L level-L nodes -> word ids in node order."""
    from orb_slam_tpu.place.vocabulary import Vocabulary

    rng = np.random.default_rng(seed)
    n_nodes = (k ** (L + 1) - 1) // (k - 1)
    n_words = k ** L
    n_internal = n_nodes - n_words

    children = np.full((n_nodes, k), -1, np.int32)
    internal = np.arange(n_internal, dtype=np.int64)
    children[:n_internal] = (internal[:, None] * k + 1
                             + np.arange(k, dtype=np.int64)[None, :])

    node_desc = rng.integers(0, 2 ** 32, (n_nodes, 8), dtype=np.uint32)
    node_desc[0] = 0  # root descriptor is not stored in the text format
    # (TemplatedVocabulary.h saveToTextFile writes non-root nodes only)
    # and never consulted during descent
    is_leaf = np.zeros(n_nodes, bool)
    is_leaf[n_internal:] = True
    word_of_node = np.full(n_nodes, -1, np.int32)
    word_of_node[n_internal:] = np.arange(n_words)
    level = np.zeros(n_nodes, np.int32)
    # level boundaries of a complete tree
    start = 0
    for lvl in range(L + 1):
        cnt = k ** lvl
        level[start:start + cnt] = lvl
        start += cnt
    return Vocabulary(
        children=children, node_desc=node_desc, is_leaf=is_leaf,
        word_of_node=word_of_node,
        node_of_word=np.arange(n_internal, n_nodes, dtype=np.int32),
        word_weight=rng.uniform(0.1, 2.0, n_words).astype(np.float32),
        level_of_node=level, k=k, L=L)


def save_text_fast(voc, path: str):
    """Vectorized DBoW2-text writer (the per-line Python join in
    vocabulary.save_text takes minutes at 1M nodes). BFS node order of the
    complete tree means parent = (nid-1)//k."""
    n_nodes = len(voc.node_desc)
    nids = np.arange(1, n_nodes, dtype=np.int64)
    parent = (nids - 1) // voc.k
    bytes_ = np.asarray(voc.node_desc).view(np.uint8).reshape(-1, 32)[1:]
    leaf = voc.is_leaf[1:].astype(np.int64)
    w = np.zeros(n_nodes - 1, np.float32)
    leaf_rows = voc.is_leaf[1:]
    w[leaf_rows] = voc.word_weight[voc.word_of_node[1:][leaf_rows]]
    cols = np.column_stack(
        [parent, leaf] + [bytes_[:, i].astype(np.int64) for i in range(32)])
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.L} 0 0\n")
        # chunked formatting keeps peak memory bounded
        CH = 200_000
        for s in range(0, len(cols), CH):
            e = min(s + CH, len(cols))
            body = cols[s:e]
            ws = w[s:e]
            lines = [
                " ".join(map(str, row)) + f" {wv:.6f}\n"
                for row, wv in zip(body.tolist(), ws.tolist())
            ]
            f.writelines(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="VOCABSCALE.json")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=6)
    ap.add_argument("--backend", default="cpu",
                    help="cpu (default; the reference loads on CPU too) "
                         "or 'default' for the session's TPU")
    args = ap.parse_args()
    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from orb_slam_tpu.place.vocabulary import transform, bow_vector, l1_score
    from orb_slam_tpu.place.database import KeyFrameDatabase

    res = {"k": args.k, "L": args.L}

    t0 = time.perf_counter()
    voc = synth_full_tree(args.k, args.L)
    res["n_nodes"] = int(len(voc.node_desc))
    res["n_words"] = int(voc.n_words)
    res["synth_s"] = round(time.perf_counter() - t0, 2)
    host_bytes = (voc.children.nbytes + voc.node_desc.nbytes
                  + voc.word_of_node.nbytes + voc.word_weight.nbytes
                  + voc.level_of_node.nbytes + voc.is_leaf.nbytes
                  + voc.node_of_word.nbytes)
    res["host_mb"] = round(host_bytes / 2 ** 20, 1)
    print(f"[synth] {res['n_nodes']} nodes / {res['n_words']} words, "
          f"{res['host_mb']} MB host, {res['synth_s']} s", file=sys.stderr)

    # --- 1. text write + native parse (main.cc:94-108 analog) ----------
    tmp = tempfile.mkdtemp(prefix="vocab_scale_")
    txt = os.path.join(tmp, "synthvoc.txt")
    t0 = time.perf_counter()
    save_text_fast(voc, txt)
    res["text_write_s"] = round(time.perf_counter() - t0, 2)
    res["text_mb"] = round(os.path.getsize(txt) / 2 ** 20, 1)

    from orb_slam_tpu.place.vocabulary import load_text
    from orb_slam_tpu.native import parse_vocab_text
    t0 = time.perf_counter()
    native = parse_vocab_text(txt)
    res["native_parse_s"] = round(time.perf_counter() - t0, 2)
    res["native_parser_used"] = native is not None
    t0 = time.perf_counter()
    voc2 = load_text(txt)
    res["load_text_total_s"] = round(time.perf_counter() - t0, 2)
    assert voc2.n_words == voc.n_words, (voc2.n_words, voc.n_words)
    assert np.array_equal(voc2.node_desc, voc.node_desc)
    print(f"[parse] text {res['text_mb']} MB; native parse "
          f"{res['native_parse_s']} s; full load "
          f"{res['load_text_total_s']} s", file=sys.stderr)
    os.unlink(txt)

    # --- 2/3. device transform at 1000 desc/frame ----------------------
    rng = np.random.default_rng(3)
    N = 1000
    descs = jnp.asarray(
        rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    valid = jnp.ones(N, bool)
    dev = voc.device_arrays()
    res["device_mb"] = round(
        sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in dev) / 2 ** 20,
        1)
    res["backend"] = jax.default_backend()

    t0 = time.perf_counter()
    w0, n0 = transform(voc, descs, valid)
    jax.block_until_ready((w0, n0))
    res["transform_cold_s"] = round(time.perf_counter() - t0, 2)
    reps = 20
    t0 = time.perf_counter()
    for i in range(reps):
        w0, n0 = transform(voc, descs, valid)
    jax.block_until_ready((w0, n0))
    res["transform_ms_per_frame"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 2)
    wnp = np.asarray(w0)
    assert (wnp >= 0).all() and (wnp < voc.n_words).all()
    res["distinct_words_in_frame"] = int(len(np.unique(wnp)))
    print(f"[transform] backend={res['backend']} cold "
          f"{res['transform_cold_s']} s, steady "
          f"{res['transform_ms_per_frame']} ms/frame (1000 desc)",
          file=sys.stderr)

    # --- 4. retrieval sanity at 1M words -------------------------------
    db = KeyFrameDatabase(voc, max_keyframes=32, n_slots=1024)
    n_kf = 24
    kf_descs = [rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32)
                for _ in range(n_kf)]
    t0 = time.perf_counter()
    for s, d in enumerate(kf_descs):
        ids, w, _ = db.compute_bow(jnp.asarray(d), valid)
        db.add(s, ids, w)
    res["db_fill_s_per_kf"] = round((time.perf_counter() - t0) / n_kf, 3)

    def flip(d, bits):
        d = d.copy()
        for _ in range(bits):
            wi = rng.integers(0, 8, len(d))
            bi = rng.integers(0, 32, len(d)).astype(np.uint32)
            d[np.arange(len(d)), wi] ^= np.uint32(1) << bi
        return d

    top1 = 0
    t_score = 0.0
    for s in range(n_kf):
        q = flip(kf_descs[s], 8)
        ids, w, _ = db.compute_bow(jnp.asarray(q), valid)
        t0 = time.perf_counter()
        scores = db.scores_against_all(ids, w)
        t_score += time.perf_counter() - t0
        top1 += int(scores.argmax() == s)
    res["retrieval_top1"] = round(top1 / n_kf, 3)
    res["score_all_ms"] = round(t_score / n_kf * 1e3, 2)
    print(f"[retrieval] top1 {res['retrieval_top1']} "
          f"({res['score_all_ms']} ms/query vs {n_kf} KFs)", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
