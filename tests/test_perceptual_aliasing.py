"""Perceptual aliasing stress for loop detection (VERDICT r4 #6).

A self-similar world — every place's descriptors drawn from the SAME small
family of texture prototypes — makes geometrically distinct keyframes score
high under BoW L1. The reference's defense is the ADAPTIVE min-score: the
worst covisible neighbor's score is the floor any loop candidate must beat
(LoopClosing.cc:114-131), and with no scored covisibles minScore stays at
its initialisation value 1.0, admitting nothing. An earlier fixed 0.05
floor in this repo admitted aliased candidates in exactly that state; it
was retired (place/database.py::min_covisible_score)."""

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.place import (
    train_vocabulary, transform, bow_vector, l1_score, KeyFrameDatabase,
)


def _flip_bits(rng, descs, bits):
    d = descs.copy()
    n = len(d)
    for _ in range(bits):
        w = rng.integers(0, 8, n)
        b = rng.integers(0, 32, n).astype(np.uint32)
        d[np.arange(n), w] ^= np.uint32(1) << b
    return d


class SelfSimilarWorld:
    """Texture families shared by every place: place images resample the
    same prototypes, so distinct places alias under BoW."""

    def __init__(self, rng, n_families=24, n_desc=120):
        self.rng = rng
        self.protos = rng.integers(0, 2 ** 32, (n_families, 8),
                                   dtype=np.uint32)
        self.n_desc = n_desc

    def image(self, view_bits=18):
        """A fresh image: per-descriptor family draw + sampling noise."""
        fam = self.rng.integers(0, len(self.protos), self.n_desc)
        return _flip_bits(self.rng, self.protos[fam], view_bits)

    def reobserve(self, img, bits=4):
        """Same place, slightly different viewpoint."""
        return _flip_bits(self.rng, img, bits)


def _setup(rng):
    world = SelfSimilarWorld(rng)
    corpus = np.concatenate([world.image() for _ in range(12)])
    voc = train_vocabulary(corpus, k=6, L=3, seed=1)
    db = KeyFrameDatabase(voc, max_keyframes=16, n_slots=160)

    def bow(desc):
        ids, w, _ = db.compute_bow(
            jnp.asarray(desc), jnp.ones(len(desc), bool))
        return ids, w

    return world, voc, db, bow


def test_no_covisible_floor_admits_nothing(rng):
    """With NO scored covisibles the reference keeps minScore=1.0 and no
    candidate passes — even an aliased keyframe whose L1 score is far above
    the retired 0.05 floor."""
    world, voc, db, bow = _setup(rng)

    # distinct places, same texture families
    place_imgs = [world.image() for _ in range(6)]
    for k, img in enumerate(place_imgs):
        db.add(k, *bow(img))

    query = world.image()          # a 7th, geometrically distinct place
    q_ids, q_w = bow(query)
    scores = db.scores_against_all(q_ids, q_w)
    # the world aliases: some stored keyframe looks like the query
    assert scores.max() > 0.05, (
        f"fixture not aliased enough (max score {scores.max():.3f})")

    min_score = db.min_covisible_score(q_ids, q_w, covisible_slots=[])
    assert min_score == 1.0, "reference init minScore (LoopClosing.cc:114)"

    covis = np.zeros((16, 16), np.int32)
    cands = db.detect_loop_candidates(
        q_ids, q_w, query_slot=7, covisible_slots=[], min_score=min_score,
        covis_weights=covis)
    assert cands == [], f"aliased candidates admitted: {cands}"

    # the retired floor DID admit them — the regression this test pins
    cands_floor = db.detect_loop_candidates(
        q_ids, q_w, query_slot=7, covisible_slots=[], min_score=0.05,
        covis_weights=covis)
    assert len(cands_floor) > 0, (
        "fixture no longer demonstrates the aliasing the floor admitted")


def test_covisible_min_score_rejects_aliased_place(rng):
    """With covisibles present, the adaptive floor (min covisible score)
    beats what a geometrically distinct but similar-looking place scores:
    false-candidate rate 0 under the reference rule, > 0 under the retired
    fixed floor."""
    world, voc, db, bow = _setup(rng)

    # current place: one image re-observed from nearby viewpoints
    cur = world.image()
    covis_imgs = [world.reobserve(cur) for _ in range(3)]
    # distinct aliased places elsewhere in the world
    alias_imgs = [world.image() for _ in range(5)]

    covis_slots = [0, 1, 2]
    for k, img in enumerate(covis_imgs):
        db.add(k, *bow(img))
    alias_slots = list(range(3, 8))
    for k, img in zip(alias_slots, alias_imgs):
        db.add(k, *bow(img))

    query = world.reobserve(cur)
    q_ids, q_w = bow(query)
    scores = db.scores_against_all(q_ids, q_w)
    min_score = db.min_covisible_score(q_ids, q_w, covis_slots)

    # the aliased places really do look similar — well above the retired
    # fixed floor — yet below the worst covisible
    assert scores[alias_slots].max() > 0.05
    assert min_score > scores[alias_slots].max(), (
        f"fixture: covisible min {min_score:.3f} vs alias max "
        f"{scores[alias_slots].max():.3f}")

    covis = np.zeros((16, 16), np.int32)
    for a in covis_slots:
        covis[8, a] = covis[a, 8] = 40

    false_ref = db.detect_loop_candidates(
        q_ids, q_w, query_slot=8, covisible_slots=covis_slots,
        min_score=min_score, covis_weights=covis)
    false_floor = db.detect_loop_candidates(
        q_ids, q_w, query_slot=8, covisible_slots=covis_slots,
        min_score=0.05, covis_weights=covis)
    assert false_ref == [], f"reference rule admitted {false_ref}"
    assert len(false_floor) > 0, (
        "fixture no longer demonstrates the floor's false candidates")
