"""KeyFrameDatabase: BoW store + loop / relocalisation candidate retrieval.

Replaces the reference's inverted-file database (src/KeyFrameDatabase.cc).
TPU-first: instead of a word->list-of-keyframes inverted file walked
per-query-word on the CPU, every keyframe's sparse BoW vector lives in a
dense padded array [K, W] and a query scores against ALL keyframes in one
batched merge-join (vmapped l1_score) — the inverted file's only purpose
(skipping zero-overlap frames) is subsumed by the dense sweep being one
fused device op.

The candidate LOGIC is the reference's, faithfully:
  * DetectLoopCandidates (KeyFrameDatabase.cc:75-196): exclude covisible
    KFs, >= 0.8 * max-common-words gate, min-score gate, covisibility-group
    score accumulation, 0.75 * best-accumulated-score cut;
  * DetectRelocalisationCandidates (198-308): same without the
    covisible exclusion / min-score."""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.place.vocabulary import Vocabulary, transform, bow_vector, l1_score


def _locked(fn):
    @functools.wraps(fn)
    def wrapper(self, *a, **k):
        with self.lock:
            return fn(self, *a, **k)
    return wrapper


class KeyFrameDatabase:
    """BoW store. Mutators and queries take `lock` (an RLock): the async
    pipeline's mapper thread (add on insert, erase on cull) and loop
    thread (add + candidate queries) share this object — the reference
    guards its inverted file the same way (KeyFrameDatabase::mMutex,
    KeyFrameDatabase.cc:41)."""

    def __init__(self, voc: Vocabulary, max_keyframes: int, n_slots: int):
        self.lock = threading.RLock()
        self.voc = voc
        self.K = max_keyframes
        self.W = n_slots
        big = np.int32(2 ** 30)
        self.bow_ids = jnp.full((max_keyframes, n_slots), big, jnp.int32)
        self.bow_w = jnp.zeros((max_keyframes, n_slots), jnp.float32)
        self.active = np.zeros(max_keyframes, bool)
        self._score_all = jax.jit(
            jax.vmap(l1_score, in_axes=(None, None, 0, 0))
        )

    @_locked
    def add(self, slot: int, ids, w):
        """Register a keyframe's BoW vector (KeyFrameDatabase::add)."""
        self.bow_ids = self.bow_ids.at[slot].set(ids)
        self.bow_w = self.bow_w.at[slot].set(w)
        self.active[slot] = True

    @_locked
    def erase(self, slot: int):
        big = jnp.int32(2 ** 30)
        self.bow_ids = self.bow_ids.at[slot].set(big)
        self.bow_w = self.bow_w.at[slot].set(0.0)
        self.active[slot] = False

    def compute_bow(self, desc, valid):
        """descriptors [N,8] u32 -> (ids [W], w [W], node_ids [N])."""
        words, nodes = transform(self.voc, desc, valid)
        ids, w = bow_vector(
            words, jnp.asarray(self.voc.word_weight), n_slots=self.W
        )
        return ids, w, nodes

    @_locked
    def min_covisible_score(self, ids, w, covisible_slots, default=1.0):
        """Min L1 score of the query vs its active covisible keyframes —
        the loop-detection score floor (LoopClosing::DetectLoop,
        LoopClosing.cc:114-131). Runs under the database lock so a
        concurrent add/erase from the mapper thread cannot tear an
        (ids, w) pair mid-read. ONE vmapped dispatch over all keyframes
        (round 3 issued one l1_score dispatch per covisible).

        With no active covisibles the reference's minScore stays at its
        initialisation value 1.0 (LoopClosing.cc:114), which admits no
        candidate — the safe behavior under perceptual aliasing
        (tests/test_perceptual_aliasing.py). An earlier synthetic-corpus
        floor of 0.05 admitted aliased candidates here and was retired."""
        act = [c for c in covisible_slots if self.active[c]]
        if not act:
            return default
        scores = np.array(self._score_all(ids, w, self.bow_ids, self.bow_w))
        return float(scores[act].min())

    @_locked
    def scores_against_all(self, ids, w):
        """[K] L1 scores of query BoW vs every stored keyframe."""
        s = np.array(self._score_all(ids, w, self.bow_ids, self.bow_w))
        s[~self.active] = 0.0
        return s

    @_locked
    def shared_words_against_all(self, ids):
        """[K] count of common words (the maxCommonWords gate,
        KeyFrameDatabase.cc:92-121)."""
        big = 2 ** 30

        def common(q_ids, k_ids):
            pos = jnp.searchsorted(k_ids, q_ids)
            pos = jnp.clip(pos, 0, k_ids.shape[0] - 1)
            return jnp.sum((k_ids[pos] == q_ids) & (q_ids < big))

        counts = np.array(
            jax.vmap(common, in_axes=(None, 0))(ids, self.bow_ids)
        )
        counts[~self.active] = 0
        return counts

    # ---------------------------------------------------------------- queries

    @_locked
    def detect_loop_candidates(self, ids, w, query_slot, covisible_slots,
                               min_score, covis_weights):
        """Loop candidates for the keyframe in `query_slot`.
        covisible_slots: slots connected to the query in the covisibility
        graph (excluded from candidacy but used for group scoring).
        covis_weights: [K, K] numpy covisibility weights for grouping.
        Returns list of candidate slots."""
        shared = self.shared_words_against_all(ids)
        exclude = np.zeros(self.K, bool)
        exclude[query_slot] = True
        for s in covisible_slots:
            exclude[s] = True
        shared_m = np.where(exclude, 0, shared)
        if shared_m.max() == 0:
            return []
        min_common = int(0.8 * shared_m.max())
        cand = np.where((shared_m > min_common) & (shared_m > 0))[0]
        if len(cand) == 0:
            return []
        scores = self.scores_against_all(ids, w)
        cand = [c for c in cand if scores[c] >= min_score]
        if not cand:
            return []
        # covisibility-group score accumulation (KeyFrameDatabase.cc:138-167):
        # group = candidate's 10 strongest covisibles
        # (GetBestCovisibilityKeyFrames(10), KeyFrameDatabase.cc:150); a
        # member contributes when its shared-word count beats minCommonWords
        # -- the reference does NOT re-apply the min_score gate inside the
        # accumulation (KeyFrameDatabase.cc:158).
        acc_scores = {}
        for c in cand:
            group = np.where(covis_weights[c] > 0)[0]
            order = np.argsort(-covis_weights[c][group])
            group = group[order][:10]
            acc = scores[c]
            best_in_group = c
            best_sc = scores[c]
            for g in group:
                if shared_m[g] > min_common:
                    acc += scores[g]
                    if scores[g] > best_sc:
                        best_sc = scores[g]
                        best_in_group = g
            acc_scores[best_in_group] = max(
                acc_scores.get(best_in_group, 0.0), acc
            )
        if not acc_scores:
            return []
        # bestAccScore seeded with minScore (KeyFrameDatabase.cc:144)
        best_acc = max(max(acc_scores.values()), min_score)
        return [c for c, a in acc_scores.items() if a > 0.75 * best_acc]

    @_locked
    def detect_relocalisation_candidates(self, ids, w, covis_weights):
        """Relocalisation candidates for a lost frame
        (KeyFrameDatabase.cc:198-308)."""
        shared = self.shared_words_against_all(ids)
        if shared.max() == 0:
            return []
        min_common = int(0.8 * shared.max())
        cand = np.where(shared > max(min_common, 0))[0]
        if len(cand) == 0:
            return []
        scores = self.scores_against_all(ids, w)
        # group member gate: the reference accumulates any top-10 covisible
        # sharing >=1 word with the query (mnRelocQuery check only,
        # KeyFrameDatabase.cc:272-275). It reads mRelocScore even for members
        # below the word gate, where that field is stale from an earlier
        # query; here the current query's score is always used.
        acc_scores = {}
        for c in cand:
            group = np.where(covis_weights[c] > 0)[0]
            order = np.argsort(-covis_weights[c][group])
            group = group[order][:10]
            acc = scores[c]
            best_in_group, best_sc = c, scores[c]
            for g in group:
                if shared[g] > 0:
                    acc += scores[g]
                    if scores[g] > best_sc:
                        best_sc, best_in_group = scores[g], g
            acc_scores[best_in_group] = max(acc_scores.get(best_in_group, 0.0), acc)
        best_acc = max(acc_scores.values())
        return [c for c, a in acc_scores.items() if a > 0.75 * best_acc]
