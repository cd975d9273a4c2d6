"""Custom-VJP partition: value and gradient parity vs autodiff of the scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.hsmm import HsmmPotentials, hsmm_partition
from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fb


def random_pots_arrays(rng, B, T, C, K, ragged=True, constrained=False):
    trans = jax.nn.log_softmax(rng.randn(B, C, C).astype(np.float32), axis=1)
    init = jax.nn.log_softmax(rng.randn(B, C).astype(np.float32), axis=1)
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
    return (
        jnp.asarray(np.asarray(trans)),
        jnp.asarray(np.asarray(init)),
        jnp.asarray(lens),
        jnp.asarray(emit),
        jnp.asarray(end_mask),
        jnp.asarray(lengths),
    )


@pytest.mark.parametrize(
    "B,T,C,K,constrained",
    [
        (1, 12, 4, 4, False),
        (3, 20, 5, 6, True),
        (7, 24, 19, 8, False),  # lane packing path
    ],
)
def test_partition_fb_value_and_grads(B, T, C, K, constrained):
    rng = np.random.RandomState(B * 7 + C)
    trans, init, lens, emit, end_mask, lengths = random_pots_arrays(
        rng, B, T, C, K, constrained=constrained
    )

    def ref_loss(trans, init, lens, emit, end_mask):
        pots = HsmmPotentials(trans, init, lens, emit, end_mask)
        return hsmm_partition(pots, lengths).sum()

    def fast_loss(trans, init, lens, emit, end_mask):
        return hsmm_partition_fb(
            trans, init, lens, emit, end_mask, lengths, True
        ).sum()

    want_val = float(ref_loss(trans, init, lens, emit, end_mask))
    got_val = float(fast_loss(trans, init, lens, emit, end_mask))
    # abs floor 1e-2, relative 1e-4 of the summed logZ magnitude
    assert abs(want_val - got_val) < max(1e-2, abs(want_val) * 1e-4), (
        want_val,
        got_val,
    )

    want_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    got_grads = jax.grad(fast_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    names = ["trans", "init", "lens", "emit", "end_mask"]
    for name, want, got in zip(names, want_grads, got_grads):
        w = np.asarray(want)
        g = np.asarray(got)
        # the jnp reference back-propagates through BIG_NEG-masked entries
        # with tiny but nonzero values; compare where gradients are material
        np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-4, err_msg=name)


def test_fast_marginals_match_autodiff():
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials as HP
    from action_segmentation_tpu.ops.hsmm import hsmm_frame_marginals
    from action_segmentation_tpu.ops.hsmm_grad import hsmm_frame_marginals_fast

    rng = np.random.RandomState(5)
    B, T, C, K = 3, 18, 4, 5
    trans, init, lens, emit, end_mask, lengths = random_pots_arrays(rng, B, T, C, K)
    pots = HP(trans, init, lens, emit, end_mask)
    want = np.asarray(hsmm_frame_marginals(pots, lengths))
    got = np.asarray(hsmm_frame_marginals_fast(pots, lengths, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_frame_marginals_sum_to_one():
    rng = np.random.RandomState(0)
    B, T, C, K = 2, 16, 4, 5
    trans, init, lens, emit, end_mask, lengths = random_pots_arrays(rng, B, T, C, K)

    def loss(emit):
        return hsmm_partition_fb(trans, init, lens, emit, end_mask, lengths, True).sum()

    marg = np.asarray(jax.grad(loss)(emit))
    for b in range(B):
        L = int(lengths[b])
        np.testing.assert_allclose(marg[b, :L].sum(axis=1), 1.0, atol=1e-4)
        np.testing.assert_allclose(marg[b, L:], 0.0, atol=1e-5)


def test_partition_fb_unpacked_fallback(monkeypatch):
    """Force the long-T fallback branch of the custom VJP (unpacked
    per-video cotangent combine) and check value + grads vs autodiff."""
    from action_segmentation_tpu.ops import hsmm_pallas as hp

    monkeypatch.setattr(hp, "_PACKED_COMBINE_BYTE_CEILING", 0)
    rng = np.random.RandomState(23)
    B, T, C, K = 2, 21, 5, 5  # unique shape: no jit-cache aliasing
    trans, init, lens, emit, end_mask, lengths = random_pots_arrays(
        rng, B, T, C, K, constrained=True
    )

    def ref_loss(trans, init, lens, emit, end_mask):
        pots = HsmmPotentials(trans, init, lens, emit, end_mask)
        return hsmm_partition(pots, lengths).sum()

    def fast_loss(trans, init, lens, emit, end_mask):
        return hsmm_partition_fb(
            trans, init, lens, emit, end_mask, lengths, True
        ).sum()

    want_val = float(ref_loss(trans, init, lens, emit, end_mask))
    got_val = float(fast_loss(trans, init, lens, emit, end_mask))
    assert abs(want_val - got_val) < 1e-2, (want_val, got_val)
    want_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    got_grads = jax.grad(fast_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    for name, want, got in zip(
        ["trans", "init", "lens", "emit", "end_mask"], want_grads, got_grads
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


def test_grads_finite_with_masked_transitions():
    """Regression: BIG_NEG-masked transitions (the default config bans
    self-transitions; grammar constraints mask more) must yield finite
    gradients even when the emission-optimal path needs a forbidden
    transition. A factorized pair-marginal form that pulled exp(trans)
    out of the exponential overflowed to NaN here."""
    B, T, C, K = 1, 20, 3, 6
    rng = np.random.RandomState(3)
    trans = np.full((B, C, C), np.log(0.5), np.float32)
    trans[:, 1, 0] = BIG_NEG  # forbid 0 -> 1
    init = np.zeros((B, C), np.float32)
    lens = np.zeros((B, K, C), np.float32)
    lens[:, 0] = BIG_NEG
    # two confident segments whose boundary wants the forbidden 0 -> 1
    emit = np.full((B, T, C), -200.0, np.float32)
    emit[:, :10, 0] = 0.0
    emit[:, 10:, 1] = 0.0
    end_mask = np.zeros((B, C), np.float32)
    lengths = jnp.asarray(np.full(B, T, np.int32))

    def fast_loss(trans, init, lens, emit, end_mask):
        return hsmm_partition_fb(
            jnp.asarray(trans), jnp.asarray(init), jnp.asarray(lens),
            jnp.asarray(emit), jnp.asarray(end_mask), lengths, True
        ).sum()

    def ref_loss(trans, init, lens, emit, end_mask):
        pots = HsmmPotentials(
            jnp.asarray(trans), jnp.asarray(init), jnp.asarray(lens),
            jnp.asarray(emit), jnp.asarray(end_mask)
        )
        return hsmm_partition(pots, lengths).sum()

    got = jax.grad(fast_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    want = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        trans, init, lens, emit, end_mask
    )
    for name, g, w in zip(["trans", "init", "lens", "emit", "end_mask"], got, want):
        assert np.all(np.isfinite(np.asarray(g))), name
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4, err_msg=name
        )
