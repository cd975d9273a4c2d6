"""Pallas kernel parity tests (interpret mode on CPU).

The fused Viterbi / partition kernels must match the pure-jnp scan
bit-for-bit (within float tolerance) across batch sizes, class counts
(exercising the lane-packing), ragged lengths, and constrained ends.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    hsmm_partition,
    hsmm_viterbi,
)
from action_segmentation_tpu.ops.hsmm_pallas import (
    hsmm_partition_pallas,
    hsmm_viterbi_labels_pallas,
    hsmm_viterbi_pallas,
)
from action_segmentation_tpu.ops.span_codec import spans_to_labels


def random_pots(rng, B, T, C, K, ragged=True, constrained=False):
    trans = rng.randn(B, C, C).astype(np.float32)
    init = rng.randn(B, C).astype(np.float32)
    lens = rng.randn(B, K, C).astype(np.float32)
    lens[:, 0] = BIG_NEG
    emit = rng.randn(B, T, C).astype(np.float32)
    end_mask = np.zeros((B, C), np.float32)
    if constrained:
        end_mask[:] = BIG_NEG
        for b in range(B):
            end_mask[b, rng.randint(C)] = 0.0
    lengths = (
        rng.randint(max(2, T // 2), T + 1, size=B) if ragged else np.full(B, T)
    ).astype(np.int32)
    pots = HsmmPotentials(
        jnp.asarray(trans),
        jnp.asarray(init),
        jnp.asarray(lens),
        jnp.asarray(emit),
        jnp.asarray(end_mask),
    )
    return pots, jnp.asarray(lengths)


@pytest.mark.parametrize(
    "B,T,C,K,constrained",
    [
        (1, 16, 5, 4, False),
        (3, 24, 5, 6, True),
        (7, 40, 19, 8, False),   # lane packing: 6 videos per group
        (4, 24, 70, 5, False),   # pack = 1
        (2, 16, 3, 12, True),    # K - 1 > some lengths
    ],
)
def test_viterbi_matches_jnp(B, T, C, K, constrained):
    rng = np.random.RandomState(B * 100 + C)
    pots, lengths = random_pots(rng, B, T, C, K, constrained=constrained)
    want_spans, want_scores = hsmm_viterbi(pots, lengths)
    got_spans, got_scores = hsmm_viterbi_pallas(pots, lengths, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    assert (np.asarray(got_spans) == np.asarray(want_spans)).all(), (
        np.asarray(got_spans),
        np.asarray(want_spans),
    )


@pytest.mark.parametrize(
    "B,T,C,K,constrained",
    [
        (1, 16, 5, 4, False),
        (3, 24, 5, 6, True),
        (7, 40, 19, 8, False),
        (2, 16, 3, 12, True),
    ],
)
def test_viterbi_labels_match_traceback(B, T, C, K, constrained):
    """Traceback-free max-marginal labels == traceback Viterbi labels."""
    rng = np.random.RandomState(B * 31 + C)
    pots, lengths = random_pots(rng, B, T, C, K, constrained=constrained)
    spans, want_scores = hsmm_viterbi(pots, lengths)
    want = np.asarray(spans_to_labels(spans))
    lengths_np = np.asarray(lengths)
    got, got_scores = hsmm_viterbi_labels_pallas(pots, lengths, interpret=True)
    got = np.asarray(got)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    for b in range(B):
        L = lengths_np[b]
        assert (got[b, :L] == want[b, :L]).all(), (b, got[b, :L], want[b, :L])
        assert (got[b, L:] == -1).all()


def test_long_sequence_time_chunked():
    """T > the kernel's time chunk: the forward carry must survive the
    chunk boundary (W/cum scratch persists across grid steps)."""
    rng = np.random.RandomState(7)
    B, T, C, K = 2, 700, 6, 7
    pots, lengths = random_pots(rng, B, T, C, K)
    want = np.asarray(hsmm_partition(pots, lengths))
    got = np.asarray(hsmm_partition_pallas(pots, lengths, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
    spans, want_scores = hsmm_viterbi(pots, lengths)
    want_labels = np.asarray(spans_to_labels(spans))
    got_labels, got_scores = hsmm_viterbi_labels_pallas(pots, lengths, interpret=True)
    got_labels = np.asarray(got_labels)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-3
    )
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (got_labels[b, :L] == want_labels[b, :L]).all()
    # the backpointer (spans) path streams bp/alpha planes through the
    # same time-chunked grid — no VMEM cliff past the chunk boundary
    spans_bp, scores_bp = hsmm_viterbi_pallas(pots, lengths, interpret=True)
    bp_labels = np.asarray(spans_to_labels(spans_bp))
    np.testing.assert_allclose(
        np.asarray(scores_bp), np.asarray(want_scores), rtol=1e-5, atol=1e-3
    )
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (bp_labels[b, :L] == want_labels[b, :L]).all()


@pytest.mark.parametrize(
    "B,T,C,K",
    [(1, 16, 5, 4), (5, 33, 19, 8), (2, 20, 64, 6)],
)
def test_partition_matches_jnp(B, T, C, K):
    rng = np.random.RandomState(B * 10 + C)
    pots, lengths = random_pots(rng, B, T, C, K)
    want = np.asarray(hsmm_partition(pots, lengths))
    got = np.asarray(hsmm_partition_pallas(pots, lengths, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_diverging_scale_pack():
    """Videos packed into one lane group whose forward scores diverge by
    thousands of nats: every reduction in the log kernel must stay
    numerically per-video. The VPU logsumexp passes because its per-row
    max is per-video automatically (BIG_NEG off-blocks); any future
    combine that normalizes with a group-global statistic silently
    zeroes every non-leading video's mass and fails here (an MXU
    variant did; see docs/DESIGN.md §7)."""
    rng = np.random.RandomState(3)
    B, T, C, K = 6, 300, 19, 8
    pots, lengths = random_pots(rng, B, T, C, K)
    offsets = jnp.asarray(np.linspace(0.0, -6.0, B, dtype=np.float32)[:, None, None])
    pots = pots._replace(emit=pots.emit + offsets)  # ~1800-nat spread
    want = np.asarray(hsmm_partition(pots, lengths))
    got = np.asarray(hsmm_partition_pallas(pots, lengths, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)


def test_cross_chunk_carry(monkeypatch):
    """T spanning multiple kernel time chunks: the scan carry (W, running
    emission cumsum) must survive chunk boundaries in all three kernels
    (log forward, max forward, backpointer). The production chunk is
    2048 frames — too slow for CI in interpret mode — so the chunk is
    shrunk to 64 here, giving a 5-chunk grid at T=300."""
    from action_segmentation_tpu.ops import hsmm_pallas as hp

    monkeypatch.setattr(hp, "_TIME_CHUNK", 64)
    rng = np.random.RandomState(11)
    B, T, C, K = 3, 300, 7, 6
    pots, lengths = random_pots(rng, B, T, C, K)
    want_z = np.asarray(hsmm_partition(pots, lengths))
    got_z = np.asarray(hsmm_partition_pallas(pots, lengths, interpret=True))
    np.testing.assert_allclose(got_z, want_z, rtol=1e-4, atol=1e-2)

    spans, want_scores = hsmm_viterbi(pots, lengths)
    want_labels = np.asarray(spans_to_labels(spans))
    got_labels, got_scores = hsmm_viterbi_labels_pallas(pots, lengths, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-3
    )
    spans_bp, scores_bp = hsmm_viterbi_pallas(pots, lengths, interpret=True)
    bp_labels = np.asarray(spans_to_labels(spans_bp))
    np.testing.assert_allclose(
        np.asarray(scores_bp), np.asarray(want_scores), rtol=1e-5, atol=1e-3
    )
    got_labels = np.asarray(got_labels)
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (got_labels[b, :L] == want_labels[b, :L]).all()
        assert (bp_labels[b, :L] == want_labels[b, :L]).all()


def test_viterbi_labels_unpacked_fallback(monkeypatch):
    """Force the long-T fallback (per-video unpacked combine): padded
    lengths past the packed-combine VMEM ceiling must take the alphas-emitting
    path and agree with the traceback Viterbi."""
    from action_segmentation_tpu.ops import hsmm_pallas as hp

    monkeypatch.setattr(hp, "_PACKED_COMBINE_BYTE_CEILING", 0)
    rng = np.random.RandomState(11)
    B, T, C, K = 3, 29, 7, 6  # unique shape: no jit-cache aliasing
    pots, lengths = random_pots(rng, B, T, C, K, constrained=True)
    spans, want_scores = hsmm_viterbi(pots, lengths)
    want = np.asarray(spans_to_labels(spans))
    got, got_scores = hsmm_viterbi_labels_pallas(pots, lengths, interpret=True)
    got = np.asarray(got)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (got[b, :L] == want[b, :L]).all()
        assert (got[b, L:] == -1).all()


def test_viterbi_labels_jnp_band_fallback(monkeypatch):
    """Extreme-T final fallback: when one video's planes exceed the band
    kernel's VMEM budget, the pure-jnp band combine must still match
    traceback Viterbi (keeps the labels path T-unbounded)."""
    from action_segmentation_tpu.ops import hsmm_pallas as hp

    monkeypatch.setattr(hp, "_PACKED_COMBINE_BYTE_CEILING", 0)
    monkeypatch.setattr(hp, "_VMEM_PLANE_BUDGET", 1)
    rng = np.random.RandomState(13)
    B, T, C, K = 2, 31, 6, 5  # unique shape: no jit-cache aliasing
    pots, lengths = random_pots(rng, B, T, C, K, constrained=True)
    spans, want_scores = hsmm_viterbi(pots, lengths)
    want = np.asarray(spans_to_labels(spans))
    got, got_scores = hsmm_viterbi_labels_pallas(pots, lengths, interpret=True)
    got = np.asarray(got)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (got[b, :L] == want[b, :L]).all()
        assert (got[b, L:] == -1).all()


def test_manual_unroll_branch(monkeypatch):
    """The production default runs _time_loop's manual-unroll branch
    (_UNROLL=16 on the real chip) while conftest pins tests to 1; cover
    the unrolled indexing explicitly."""
    from action_segmentation_tpu.ops import hsmm_pallas as hp

    monkeypatch.setattr(hp, "_UNROLL", 2)
    rng = np.random.RandomState(17)
    B, T, C, K = 2, 26, 4, 5  # unique shape: no jit-cache aliasing
    pots, lengths = random_pots(rng, B, T, C, K, constrained=True)
    want = np.asarray(hsmm_partition(pots, lengths))
    got = np.asarray(hsmm_partition_pallas(pots, lengths, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
    spans, want_scores = hsmm_viterbi(pots, lengths)
    want_labels = np.asarray(spans_to_labels(spans))
    got_labels, got_scores = hsmm_viterbi_labels_pallas(
        pots, lengths, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    got_labels = np.asarray(got_labels)
    for b in range(B):
        L = int(np.asarray(lengths)[b])
        assert (got_labels[b, :L] == want_labels[b, :L]).all()


def test_zero_length_clamped_like_jnp():
    """lengths entries of 0 are clamped to 1 by EVERY entry point (the
    contract in ops/hsmm.py's header): the Pallas wrappers must return
    the same values — and the fb partition the same gradients — as the
    jnp paths, not a divergent all--1-spans / zero-grad pair."""
    import jax

    from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fb

    rng = np.random.RandomState(0)
    B, T, C, K = 4, 12, 5, 4
    pots, _ = random_pots(rng, B, T, C, K)
    lengths0 = jnp.asarray(np.array([0, 5, 0, T], np.int32))
    lengths1 = jnp.maximum(lengths0, 1)

    want_spans, want_scores = hsmm_viterbi(pots, lengths0)
    got_spans, got_scores = hsmm_viterbi_pallas(pots, lengths0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5, atol=1e-4
    )
    assert (np.asarray(got_spans) == np.asarray(want_spans)).all()

    np.testing.assert_allclose(
        np.asarray(hsmm_partition_pallas(pots, lengths0, interpret=True)),
        np.asarray(hsmm_partition(pots, lengths0)),
        rtol=1e-4, atol=1e-3,
    )

    def fb_sum(le):
        def f(emit):
            return jnp.sum(
                hsmm_partition_fb(
                    pots.trans, pots.init, pots.lens, emit, pots.end_mask,
                    le, True,
                )
            )

        return jax.value_and_grad(f)(pots.emit)

    v0, g0 = fb_sum(lengths0)
    v1, g1 = fb_sum(lengths1)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5
    )
