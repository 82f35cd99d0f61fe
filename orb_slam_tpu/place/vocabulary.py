"""Vocabulary tree: training, transform (descriptor -> word), BoW scoring.

Replaces DBoW2::TemplatedVocabulary (Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h): a k-ary tree of mean binary descriptors with TF-IDF
weights. Here the tree is a flat array structure and `transform` descends
the tree for ALL descriptors simultaneously (batched argmin-Hamming per
level, TemplatedVocabulary.h:1213-1260 done N-wide).

Also provides:
  * k-majority training (the DBoW2 create() equivalent: binary k-means with
    bitwise-majority means, TemplatedVocabulary.h + FORB::meanValue);
  * DBoW2 text-format load/save for interoperability with ORBvoc.txt
    (TemplatedVocabulary.h:241-247 format)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Vocabulary:
    """Flat-array k-ary vocabulary tree.

    children: [n_nodes, k] i32 child node ids (-1 = none)
    node_desc: [n_nodes, 8] u32 packed mean descriptors
    is_leaf: [n_nodes] bool
    word_of_node: [n_nodes] i32 word index for leaves (-1 otherwise)
    node_of_word: [n_words] i32 reverse map
    word_weight: [n_words] f32 idf weights
    levels_of_node: [n_nodes] i32 depth (root = 0)
    k, L: branching factor / depth
    """

    children: np.ndarray
    node_desc: np.ndarray
    is_leaf: np.ndarray
    word_of_node: np.ndarray
    node_of_word: np.ndarray
    word_weight: np.ndarray
    level_of_node: np.ndarray
    k: int
    L: int

    @property
    def n_words(self):
        return len(self.node_of_word)

    def device_arrays(self):
        return (
            jnp.asarray(self.children),
            jnp.asarray(self.node_desc),
            jnp.asarray(self.word_of_node),
            jnp.asarray(self.word_weight),
            jnp.asarray(self.level_of_node),
        )


def _popcount_u32(x):
    return jax.lax.population_count(x)


def _pack_bits(bits):
    """[M, 256] uint8/bool -> [M, 8] u32."""
    b = np.asarray(bits, np.uint32).reshape(-1, 8, 32)
    return (b << np.arange(32, dtype=np.uint32)[None, None, :]).sum(-1).astype(np.uint32)


def _unpack_bits(packed):
    """[M, 8] u32 -> [M, 256] uint8."""
    p = np.asarray(packed)[:, :, None]
    return ((p >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1).reshape(
        -1, 256
    ).astype(np.uint8)


_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(1).astype(np.uint16)


def _kmajority(descs, k, rng, iters=8):
    """Binary k-means with majority-vote means (FORB::meanValue,
    Thirdparty/DBoW2/DBoW2/FORB.cpp:28-77). descs: [M, 8] u32 numpy.
    Returns (centers [k', 8] u32, assignment [M])."""
    M = len(descs)
    k = min(k, M)
    if k == 0:
        return np.zeros((0, 8), np.uint32), np.zeros(0, np.int64)
    centers = descs[rng.choice(M, k, replace=False)]
    bits = _unpack_bits(descs)  # [M, 256]
    assign = np.zeros(M, np.int64)
    for _ in range(iters):
        # distances M x k via byte-popcount LUT (8x less temp memory than
        # unpackbits — matters at vocabulary-training corpus sizes)
        x = descs[:, None, :] ^ centers[None, :, :]
        d = _POPCOUNT8[x.view(np.uint8)].sum(-1, dtype=np.uint32)
        new_assign = d.argmin(1)
        if (new_assign == assign).all():
            assign = new_assign
            break
        assign = new_assign
        for c in range(k):
            sel = bits[assign == c]
            if len(sel) == 0:
                centers[c] = descs[rng.integers(0, M)]
            else:
                maj = (sel.mean(0) >= 0.5).astype(np.uint8)
                centers[c] = _pack_bits(maj[None])[0]
    return centers, assign


def train_vocabulary(descriptors, k=10, L=3, seed=0, weighting="tfidf",
                     documents=None):
    """Hierarchical k-majority clustering (DBoW2 create equivalent).
    descriptors: [M, 8] u32 numpy training set. Returns Vocabulary.

    documents: optional list of per-image descriptor arrays; when given,
    idf weights use document frequency (the DBoW2 TF_IDF weighting,
    TemplatedVocabulary.h setNodeWeights) instead of treating each
    descriptor as its own document."""
    rng = np.random.default_rng(seed)
    descriptors = np.asarray(descriptors, np.uint32)

    children_list = [[]]  # node 0 = root
    desc_list = [np.zeros(8, np.uint32)]
    level_list = [0]
    parent_of = [-1]

    def build(node_id, node_descs, level):
        if level == L or len(node_descs) < 2:
            return
        centers, assign = _kmajority(node_descs, k, rng)
        for c in range(len(centers)):
            cid = len(desc_list)
            desc_list.append(centers[c])
            level_list.append(level + 1)
            parent_of.append(node_id)
            children_list.append([])
            children_list[node_id].append(cid)
            sub = node_descs[assign == c]
            build(cid, sub, level + 1)

    build(0, descriptors, 0)

    n_nodes = len(desc_list)
    children = np.full((n_nodes, k), -1, np.int32)
    for nid, ch in enumerate(children_list):
        children[nid, : len(ch)] = ch
    is_leaf = (children[:, 0] == -1)
    is_leaf[0] = False if n_nodes > 1 else True
    word_of_node = np.full(n_nodes, -1, np.int32)
    leaves = np.where(is_leaf)[0]
    word_of_node[leaves] = np.arange(len(leaves))
    node_of_word = leaves.astype(np.int32)

    voc = Vocabulary(
        children=children,
        node_desc=np.stack(desc_list).astype(np.uint32),
        is_leaf=is_leaf,
        word_of_node=word_of_node,
        node_of_word=node_of_word,
        word_weight=np.ones(len(leaves), np.float32),
        level_of_node=np.asarray(level_list, np.int32),
        k=k,
        L=L,
    )
    if weighting == "tfidf" and len(descriptors):
        if documents is not None:
            # document-frequency idf (TemplatedVocabulary.h setNodeWeights)
            df = np.zeros(len(leaves), np.int64)
            for doc in documents:
                doc = np.asarray(doc, np.uint32)
                if not len(doc):
                    continue
                w = np.asarray(transform(voc, jnp.asarray(doc))[0])
                df[np.unique(w[w >= 0])] += 1
            n_docs = max(len(documents), 1)
            idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32)
            idf[df == 0] = 0.0
            voc.word_weight = np.maximum(idf, 1e-3)
        else:
            # fallback: one document per descriptor
            words = np.asarray(transform(voc, jnp.asarray(descriptors))[0])
            counts = np.bincount(words[words >= 0], minlength=len(leaves))
            n_docs = max(len(descriptors), 1)
            idf = np.log(n_docs / np.maximum(counts, 1)).astype(np.float32)
            idf[counts == 0] = 0.0
            voc.word_weight = np.maximum(idf, 1e-3)
    return voc


# ----------------------------------------------------------------- npz format

def save_npz(voc: Vocabulary, path: str):
    """Compact binary vocabulary artifact (much smaller / faster than the
    DBoW2 text format; use save_text for interoperability)."""
    np.savez_compressed(
        path, children=voc.children, node_desc=voc.node_desc,
        is_leaf=voc.is_leaf, word_weight=voc.word_weight,
        level_of_node=voc.level_of_node, kL=np.asarray([voc.k, voc.L]))


def load_npz(path: str) -> Vocabulary:
    d = np.load(path)
    is_leaf = d["is_leaf"].astype(bool)
    n_nodes = len(is_leaf)
    word_of_node = np.full(n_nodes, -1, np.int32)
    leaves = np.where(is_leaf)[0]
    word_of_node[leaves] = np.arange(len(leaves))
    k, L = (int(x) for x in d["kL"])
    return Vocabulary(
        children=d["children"], node_desc=d["node_desc"], is_leaf=is_leaf,
        word_of_node=word_of_node, node_of_word=leaves.astype(np.int32),
        word_weight=d["word_weight"], level_of_node=d["level_of_node"],
        k=k, L=L)


@partial(jax.jit, static_argnames=("L", "levels_up"))
def _transform_device(children, node_desc, word_of_node, level_of_node,
                      descs, valid, L: int, levels_up: int):
    N = descs.shape[0]
    k = children.shape[1]
    cur = jnp.zeros((N,), jnp.int32)  # root
    node_at_lu = jnp.zeros((N,), jnp.int32)
    target_level = max(L - levels_up, 0)
    for lvl in range(L):
        ch = children[cur]                       # [N, k]
        has = ch >= 0
        ch_safe = jnp.clip(ch, 0, node_desc.shape[0] - 1)
        cdesc = node_desc[ch_safe]               # [N, k, 8]
        x = cdesc ^ descs[:, None, :]
        d = jnp.sum(jax.lax.population_count(x), axis=-1)
        d = jnp.where(has, d, 10**9)
        best = jnp.argmin(d, axis=-1)
        nxt = jnp.take_along_axis(ch, best[:, None], 1)[:, 0]
        # stop at leaves (stay in place if no children)
        cur = jnp.where(nxt >= 0, nxt, cur)
        if lvl + 1 == target_level:
            node_at_lu = cur
    words = jnp.where(valid, word_of_node[cur], -1)
    return words, node_at_lu


def transform(voc: Vocabulary, descs, valid=None, levels_up: int = 4):
    """descriptors [N, 8] u32 -> (word ids [N] i32 (-1 invalid), node ids at
    `levels_up` above the leaves [N] — the FeatureVector grouping level the
    reference uses for matching, Frame.cc:285)."""
    if valid is None:
        valid = jnp.ones(descs.shape[0], bool)
    ch, nd, wn, ww, lv = voc.device_arrays()
    return _transform_device(ch, nd, wn, lv, descs, valid, voc.L, levels_up)


def bow_vector(words, weights_of_word, n_slots=None):
    """Aggregate per-feature word ids into a sorted sparse BoW vector.

    words: [N] i32 (-1 invalid). weights_of_word: [n_words] f32.
    Returns (ids [W], w [W]) with W = n_slots or N: unique sorted word ids
    (padded with id = 2^30) and L1-NORMALIZED tf-idf weights
    (BowVector::normalize, DBoW2/BowVector.cpp:63-84)."""
    N = words.shape[0]
    W = n_slots or N
    big = jnp.int32(2 ** 30)
    w_sorted = jnp.sort(jnp.where(words >= 0, words, big))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), w_sorted[1:] != w_sorted[:-1]]
    ) & (w_sorted < big)
    # tf counts per unique word via segment trick
    uniq_rank = jnp.cumsum(first) - 1
    # scatter tf-idf into compacted slots; unique words beyond W are DROPPED
    # cleanly into the dump slot (not accumulated into slot W-1, which would
    # corrupt both tf and id) and the L1 norm is taken over kept words only
    in_range = (w_sorted < big) & (uniq_rank < W)
    slot = jnp.where(in_range, uniq_rank, W)
    tf = jnp.zeros((W + 1,), jnp.float32).at[slot].add(
        jnp.where(in_range, 1.0, 0.0)
    )[:W]
    ids = jnp.full((W + 1,), big, jnp.int32).at[
        jnp.where(first & in_range, uniq_rank, W)
    ].set(jnp.where(first & in_range, w_sorted, big))[:W]
    wt = tf * jnp.where(
        ids < big, weights_of_word[jnp.clip(ids, 0, weights_of_word.shape[0] - 1)], 0.0
    )
    norm = jnp.maximum(jnp.sum(jnp.abs(wt)), 1e-12)
    return ids, wt / norm


@jax.jit
def l1_score(ids1, w1, ids2, w2):
    """DBoW2 L1 score between two sorted sparse BoW vectors:
    s = 0.5 * sum_common(|v| + |w| - |v - w|)   in [0, 1]
    (ScoringObject.cpp:23-67). Vectorized merge via searchsorted."""
    pos = jnp.searchsorted(ids2, ids1)
    pos_safe = jnp.clip(pos, 0, ids2.shape[0] - 1)
    match_ = ids2[pos_safe] == ids1
    v = w1
    w = jnp.where(match_, w2[pos_safe], 0.0)
    common = jnp.where(
        match_, jnp.abs(v) + jnp.abs(w) - jnp.abs(v - w), 0.0
    )
    return 0.5 * jnp.sum(common)


# ---------------------------------------------------------------- text format

def save_text(voc: Vocabulary, path: str):
    """DBoW2-compatible text format: first line `k L scoring weighting`,
    then per non-root node: `parent_id is_leaf d0..d31 weight`
    (TemplatedVocabulary.h saveToTextFile)."""
    parent = np.full(len(voc.node_desc), -1, np.int64)
    for nid in range(len(voc.children)):
        for c in voc.children[nid]:
            if c >= 0:
                parent[c] = nid
    bytes_ = np.asarray(voc.node_desc).view(np.uint8).reshape(-1, 32)
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.L} 0 0\n")
        for nid in range(1, len(voc.node_desc)):
            w = (
                voc.word_weight[voc.word_of_node[nid]]
                if voc.is_leaf[nid]
                else 0.0
            )
            d = " ".join(str(int(b)) for b in bytes_[nid])
            f.write(f"{parent[nid]} {1 if voc.is_leaf[nid] else 0} {d} {w:.6f}\n")


def load_text(path: str) -> Vocabulary:
    """Parse the DBoW2 text vocabulary format (ORBvoc.txt compatible —
    the reference loads it at startup, src/main.cc:94-108). Uses the native
    mmap parser (orb_slam_tpu.native) when available — the reference's
    istream loader takes minutes on the ~1M-node ORBvoc.txt; the native
    path is seconds — with a pure-Python fallback."""
    from orb_slam_tpu.native import parse_vocab_text

    parsed = parse_vocab_text(path)
    if parsed is not None:
        k, L, parent1, leaf1, node_desc, w1 = parsed
        n_nodes = len(parent1) + 1
        is_leaf = np.zeros(n_nodes, bool)
        is_leaf[1:] = leaf1.astype(bool)
        weights = np.zeros(n_nodes, np.float32)
        weights[1:] = w1
        parent = np.full(n_nodes, -1, np.int64)
        parent[1:] = parent1
        # children table: stable order preserves the file's child order
        nids = np.arange(1, n_nodes)
        order = np.argsort(parent1, kind="stable")
        sorted_pid = parent1[order]
        first = np.concatenate([[True], sorted_pid[1:] != sorted_pid[:-1]])
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(order)), 0))
        slot = np.arange(len(order)) - group_start
        children = np.full((n_nodes, k), -1, np.int32)
        children[sorted_pid, np.minimum(slot, k - 1)] = nids[order]
        # levels: parents precede children in the file; L passes converge
        level = np.zeros(n_nodes, np.int32)
        for _ in range(L + 1):
            level[1:] = level[parent1] + 1
    else:
        with open(path) as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            rows = [line.split() for line in f if line.strip()]
        n_nodes = len(rows) + 1
        children = np.full((n_nodes, k), -1, np.int32)
        node_desc = np.zeros((n_nodes, 32), np.uint8)
        is_leaf = np.zeros(n_nodes, bool)
        weights = np.zeros(n_nodes, np.float32)
        child_count = np.zeros(n_nodes, np.int32)
        level = np.zeros(n_nodes, np.int32)
        for i, r in enumerate(rows):
            nid = i + 1
            pid = int(r[0])
            is_leaf[nid] = bool(int(r[1]))
            node_desc[nid] = [int(x) for x in r[2:34]]
            weights[nid] = float(r[34])
            children[pid, child_count[pid]] = nid
            child_count[pid] += 1
            level[nid] = level[pid] + 1
    word_of_node = np.full(n_nodes, -1, np.int32)
    leaves = np.where(is_leaf)[0]
    word_of_node[leaves] = np.arange(len(leaves))
    packed = node_desc.reshape(-1, 8, 4).astype(np.uint32)
    packed = (
        packed[..., 0]
        | (packed[..., 1] << 8)
        | (packed[..., 2] << 16)
        | (packed[..., 3] << 24)
    )
    return Vocabulary(
        children=children,
        node_desc=packed.astype(np.uint32),
        is_leaf=is_leaf,
        word_of_node=word_of_node,
        node_of_word=leaves.astype(np.int32),
        word_weight=weights[leaves],
        level_of_node=level,
        k=k,
        L=L,
    )
