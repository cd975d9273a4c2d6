"""Span codec tests.

Hand-written triples mirror the reference's test data
(src/models/test_semimarkov.py:250-263), plus randomized round-trips and
max_k splitting checks against a straightforward Python loop oracle.
"""

import numpy as np

from action_segmentation_tpu.ops import labels_to_spans, spans_to_labels, rle_spans
from action_segmentation_tpu.ops.span_codec import labels_to_spans_np


def _loop_labels_to_spans(labels, max_k):
    """Direct per-timestep transliteration of the reference loop."""
    b, T = labels.shape
    out = np.empty_like(labels)
    for i in range(b):
        last = None
        length = 0
        for t in range(T):
            this = labels[i, t]
            same = last is not None and last == this
            if max_k is not None:
                same = same and (length < max_k - 1)
            if same:
                out[i, t] = -1
                length += 1
            else:
                out[i, t] = this
                length = 1
            last = this
    return out


def test_hand_examples():
    position_labels = np.array([[0, 1, 1, 2, 2, 2], [0, 1, 2, 3, 3, 4]])
    spans = np.array([[0, 1, -1, 2, -1, -1], [0, 1, 2, 3, -1, 4]])
    rle = [[(0, 1), (1, 2), (2, 3)], [(0, 1), (1, 1), (2, 1), (3, 2), (4, 1)]]
    assert (np.asarray(labels_to_spans(position_labels, max_k=10)) == spans).all()
    assert (np.asarray(spans_to_labels(spans)) == position_labels).all()
    assert rle_spans(spans, np.array([6, 6])) == rle
    trunc_rle = [[(0, 1), (1, 2), (2, 2)], [(0, 1), (1, 1), (2, 1), (3, 2), (4, 1)]]
    assert rle_spans(spans, np.array([5, 6])) == trunc_rle


def test_roundtrip_random():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 3, size=(5, 20))
    spans = np.asarray(labels_to_spans(labels, max_k=5))
    assert (np.asarray(spans_to_labels(spans)) == labels).all()


def test_max_k_splitting_matches_loop():
    rng = np.random.RandomState(1)
    for max_k in [None, 1, 2, 3, 5, 20]:
        labels = rng.randint(0, 4, size=(4, 37))
        got = np.asarray(labels_to_spans(labels, max_k=max_k))
        want = _loop_labels_to_spans(labels, max_k)
        assert (got == want).all(), (max_k, got, want)
        assert (np.asarray(spans_to_labels(got)) == labels).all()
        # pure-numpy host variant matches the jnp one
        assert (labels_to_spans_np(labels, max_k) == want).all()


def test_long_run_split_lengths():
    labels = np.full((1, 50), 7)
    spans = np.asarray(labels_to_spans(labels, max_k=10))
    starts = np.flatnonzero(spans[0] != -1)
    # runs split every max_k - 1 = 9 frames
    assert starts.tolist() == [0, 9, 18, 27, 36, 45]
    rle = rle_spans(spans, np.array([50]))[0]
    assert rle == [(7, 9)] * 5 + [(7, 5)]
