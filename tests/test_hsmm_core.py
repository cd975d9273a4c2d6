"""Brute-force correctness tests for the semi-Markov DP.

Enumerates every segmentation + labeling of tiny sequences in numpy and
checks partition / Viterbi / gold-score against the scan implementation.
Also reproduces the reference's constructed-potentials decode test
(src/models/test_semimarkov.py:266-323) in our formulation.
"""

import itertools

import numpy as np
import jax.numpy as jnp

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    hsmm_partition,
    hsmm_viterbi,
    hsmm_gold_score,
    hsmm_frame_marginals,
)
from action_segmentation_tpu.ops import spans_to_labels
from tests.test_hsmm_pallas import random_pots


def enumerate_segmentations(T, max_d):
    """Yield tuples of span durations summing to T, each in [1, max_d]."""

    def rec(remaining):
        if remaining == 0:
            yield ()
            return
        for d in range(1, min(max_d, remaining) + 1):
            for rest in rec(remaining - d):
                yield (d,) + rest

    yield from rec(T)


def brute_force(trans, init, lens, emit, length, end_mask):
    """All-paths log-sum, best path and best score by enumeration."""
    C = trans.shape[0]
    K = lens.shape[0]
    scores = []
    paths = []
    for durs in enumerate_segmentations(length, K - 1):
        M = len(durs)
        for classes in itertools.product(range(C), repeat=M):
            s = init[classes[0]] + end_mask[classes[-1]]
            t = 0
            for i, (c, d) in enumerate(zip(classes, durs)):
                s += lens[d, c] + emit[t : t + d, c].sum()
                if i > 0:
                    s += trans[c, classes[i - 1]]
                t += d
            scores.append(s)
            paths.append((durs, classes))
    scores = np.array(scores)
    m = scores.max()
    logZ = m + np.log(np.exp(scores - m).sum())
    best = paths[int(scores.argmax())]
    return logZ, scores.max(), best


def path_to_spans(durs, classes, T):
    spans = np.full(T, -1, np.int32)
    t = 0
    for c, d in zip(classes, durs):
        spans[t] = c
        t += d
    return spans


def random_potentials(rng, C, K, T, constrained_end=False):
    trans = rng.randn(C, C).astype(np.float32)
    init = rng.randn(C).astype(np.float32)
    lens = rng.randn(K, C).astype(np.float32)
    lens[0] = BIG_NEG
    emit = rng.randn(T, C).astype(np.float32)
    end_mask = np.zeros(C, np.float32)
    if constrained_end:
        end_mask[:] = BIG_NEG
        end_mask[rng.randint(C)] = 0.0
    return trans, init, lens, emit, end_mask


def batchify(*per_instance):
    return [jnp.asarray(x)[None] for x in per_instance]


def test_partition_and_viterbi_vs_bruteforce():
    rng = np.random.RandomState(0)
    for trial in range(6):
        C = rng.randint(2, 4)
        K = rng.randint(2, 5)
        T = rng.randint(2, 7)
        length = T if trial % 2 == 0 else max(1, T - 1)
        constrained = trial % 3 == 0
        trans, init, lens, emit, end_mask = random_potentials(
            rng, C, K, T, constrained_end=constrained
        )
        want_logZ, want_best, best_path = brute_force(
            trans, init, lens, emit, length, end_mask
        )

        btrans, binit, blens, bemit, bend = batchify(trans, init, lens, emit, end_mask)
        pots = HsmmPotentials(btrans, binit, blens, bemit, bend)
        blengths = jnp.array([length])

        got_logZ = float(hsmm_partition(pots, blengths)[0])
        assert abs(got_logZ - want_logZ) < 1e-3, (trial, got_logZ, want_logZ)

        spans, score = hsmm_viterbi(pots, blengths)
        assert abs(float(score[0]) - want_best) < 1e-3
        want_spans = path_to_spans(*best_path, T)
        got = np.asarray(spans[0])
        assert (got[:length] == want_spans[:length]).all(), (got, want_spans)
        assert (got[length:] == -1).all()

        # gold score of the argmax path equals the viterbi score
        gold = hsmm_gold_score(pots, blengths, jnp.asarray(want_spans)[None])
        assert abs(float(gold[0]) - want_best) < 1e-3


def test_gold_score_random_paths():
    rng = np.random.RandomState(1)
    C, K, T = 3, 4, 6
    trans, init, lens, emit, end_mask = random_potentials(rng, C, K, T)
    length = 5
    btrans, binit, blens, bemit, bend = batchify(trans, init, lens, emit, end_mask)
    pots = HsmmPotentials(btrans, binit, blens, bemit, bend)
    for durs in [(1, 1, 3), (3, 2), (2, 2, 1), (1, 1, 1, 1, 1)]:
        classes = tuple(rng.randint(C) for _ in durs)
        spans = path_to_spans(durs, classes, T)
        want = 0.0
        t = 0
        for i, (c, d) in enumerate(zip(classes, durs)):
            want += lens[d, c] + emit[t : t + d, c].sum()
            want += init[c] if i == 0 else trans[c, classes[i - 1]]
            t += d
        want += end_mask[classes[-1]]
        got = float(hsmm_gold_score(pots, jnp.array([length]), jnp.asarray(spans)[None])[0])
        assert abs(got - want) < 1e-3, (durs, classes, got, want)


def test_marginals_sum_to_one_per_frame():
    rng = np.random.RandomState(2)
    C, K, T = 3, 5, 8
    trans, init, lens, emit, end_mask = random_potentials(rng, C, K, T)
    length = 7
    btrans, binit, blens, bemit, bend = batchify(trans, init, lens, emit, end_mask)
    pots = HsmmPotentials(btrans, binit, blens, bemit, bend)
    marg = np.asarray(hsmm_frame_marginals(pots, jnp.array([length]))[0])
    assert np.allclose(marg[:length].sum(axis=1), 1.0, atol=1e-4)
    assert np.allclose(marg[length:], 0.0, atol=1e-5)
    assert (marg >= -1e-5).all()


def test_constructed_periodic_decode():
    """Forced periodic segmentation, mirroring the reference's test_log_hsmm."""
    b, C, N, K, step = 4, 4, 40, 6, 4
    padded = N + 2 * step
    lengths = np.full(b, N)
    lengths[0] = padded

    trans = np.zeros((C, C), np.float32)
    init = np.full(C, BIG_NEG, np.float32)
    init[0] = 0.0
    emit = np.full((b, padded, C), BIG_NEG, np.float32)
    for n in range(padded):
        emit[:, n, (n // step) % C] = 1.0
    lens = np.full((K, C), BIG_NEG, np.float32)
    lens[step] = 0.0
    end_mask = np.zeros((b, C), np.float32)

    pots = HsmmPotentials(
        jnp.broadcast_to(jnp.asarray(trans), (b, C, C)),
        jnp.broadcast_to(jnp.asarray(init), (b, C)),
        jnp.broadcast_to(jnp.asarray(lens), (b, K, C)),
        jnp.asarray(emit),
        jnp.asarray(end_mask),
    )
    spans, _ = hsmm_viterbi(pots, jnp.asarray(lengths))
    labels = np.asarray(spans_to_labels(spans))
    for i in range(b):
        for t in range(lengths[i]):
            assert labels[i, t] == (t // step) % C, (i, t, labels[i, t])


def test_gold_score_rejects_over_band_durations():
    """A span longer than K-1 frames has zero probability under the DP;
    hsmm_gold_score must return ~BIG_NEG for it, not a clipped finite
    score (which would let gold - partition exceed 0)."""
    rng = np.random.RandomState(0)
    B, T, C, K = 1, 12, 3, 4
    pots, lengths = random_pots(rng, B, T, C, K, ragged=False)
    # one span covering all 12 frames: duration 12 > K-1 = 3
    spans = np.full((B, T), -1, np.int32)
    spans[0, 0] = 1
    score = float(np.asarray(hsmm_gold_score(pots, lengths, spans))[0])
    assert score < -1e8, score
    # a legal segmentation of the same video stays finite
    legal = np.full((B, T), -1, np.int32)
    legal[0, 0::3] = np.arange(4, dtype=np.int32) % C
    legal_score = float(np.asarray(hsmm_gold_score(pots, lengths, legal))[0])
    assert legal_score > -1e6, legal_score


def test_zero_length_clamped_consistently():
    """lengths of 0 are defensively clamped to 1 by the jnp entry points,
    matching the Pallas wrappers (a 0 would read the last padded row via
    negative indexing)."""
    rng = np.random.RandomState(1)
    pots, _ = random_pots(rng, 2, 10, 3, 4, ragged=False)
    zero_len = jnp.asarray(np.array([0, 10], np.int32))
    one_len = jnp.asarray(np.array([1, 10], np.int32))
    np.testing.assert_allclose(
        np.asarray(hsmm_partition(pots, zero_len)),
        np.asarray(hsmm_partition(pots, one_len)),
        rtol=1e-6,
    )
