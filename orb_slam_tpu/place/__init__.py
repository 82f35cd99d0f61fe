"""Place recognition: vocabulary tree, BoW vectors, keyframe database.

Replaces DBoW2 (Thirdparty/DBoW2) and KeyFrameDatabase
(src/KeyFrameDatabase.cc). TPU-first: the vocabulary is flat arrays
(children index table + node descriptors); `transform` is L rounds of
batched argmin-Hamming over k children for all N descriptors at once;
BoW vectors are fixed-size sorted sparse arrays; database queries score one
frame against EVERY keyframe in a single batched merge-join."""

from orb_slam_tpu.place.vocabulary import (
    Vocabulary, train_vocabulary, transform, bow_vector, l1_score,
)
from orb_slam_tpu.place.database import KeyFrameDatabase
