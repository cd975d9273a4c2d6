"""Banded semi-Markov dynamic programs (log / max semirings) in pure JAX.

This replaces the reference's structured-inference stack (torch-struct's
``SemiMarkovCRF`` over genbmm CUDA banded log-matmuls; see reference
src/models/semimarkov/semimarkov_modules.py:416-523 and :597-696) with a
fused banded time-scan. The reference materializes a
``b x (N-1) x K x C x C`` edge-potential tensor and hands it to a generic
CRF; here potentials are composed on the fly inside an O(T) `lax.scan`
whose per-step working set is O(K*C), so 1000+-frame videos stream through
VMEM and gradients of the partition (= expected sufficient statistics)
come from autodiff instead of a hand-written backward.

Model (durations d in [1, K-1], classes c in [0, C)):

  score(spans) = init[c_1]
               + sum_i  lens[d_i, c_i]
               + sum_i  sum_{t in span_i} emit[t, c_i]
               + sum_{i>1} trans[c_i, c_{i-1}]
               + end_mask[c_M]

``end_mask`` reproduces the reference's EOS augmentation
(semimarkov_modules.py:461-494): transitioning into the virtual EOS class
costs 0 from allowed end classes and BIG_NEG otherwise, and the EOS span
itself contributes nothing — so it folds into a per-class additive mask on
the final span's class.

All public entry points take batched arrays:
  trans:    (B, C, C)  log p(to | from), indexed [to, from]
  init:     (B, C)
  lens:     (B, K, C)  duration log-probs, row d scores a d-frame span
                       (row 0 is unused and should be BIG_NEG)
  emit:     (B, T, C)  per-frame log-likelihoods (padded arbitrarily
                       beyond each instance's length)
  lengths:  (B,) int32, each >= 1 (entry points clamp to 1 defensively,
                       matching the Pallas wrappers — a 0 would otherwise
                       read the last padded row via negative indexing)
  end_mask: (B, C)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.span_codec import cummax as _cummax


class HsmmPotentials(NamedTuple):
    """Batched HSMM factor bundle."""

    trans: jax.Array  # (B, C, C) [to, from]
    init: jax.Array  # (B, C)
    lens: jax.Array  # (B, K, C)
    emit: jax.Array  # (B, T, C)
    end_mask: jax.Array  # (B, C)


def _emission_cumsum(emit):
    """(T, C) -> (T+1, C) exclusive prefix sums of frame log-likelihoods.

    Uses an associative tree scan: XLA lowers ``jnp.cumsum`` on TPU to a
    reduce-window that costs O(T*window) — measured 0.50 ms vs 0.06 ms
    for the log-depth scan at the bench shape (B=18, T=1024, C=19)."""
    zero = jnp.zeros((1, emit.shape[1]), emit.dtype)
    cs = jax.lax.associative_scan(jnp.add, emit, axis=0)
    return jnp.concatenate([zero, cs], axis=0)


def reverse_within_length(x, lengths):
    """Reverse each (B, T, ...) row's first `length` steps in place
    (padding beyond each length stays put). Shared by the reversed-model
    backward/decode passes and the BiLSTM.

    Batch-uniform gather: the earlier vmapped per-batch jnp.roll lowers
    to a SEQUENTIAL while loop over the batch on TPU (CLAUDE.md
    lowering facts — ~0.4 ms for 18 rows), serializing the BiLSTM's
    four reversals per forward; one take_along_axis is a parallel
    gather."""
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    lens = jnp.asarray(lengths)[:, None]
    idx = jnp.where(t < lens, lens - 1 - t, t)  # (B, T)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def _forward_scan_single(trans, init, lens, emit, semiring):
    """Run the banded forward recurrence for one instance.

    Returns ``alphas`` (T, C): alphas[t-1, c] = semiring-sum over all
    segmentations of frames [0, t) whose final span has class c. For the
    max semiring additionally returns backpointers (durations and previous
    classes), otherwise None.

    The carry holds the last K-1 boundary scores with the emission prefix
    sum pre-subtracted, so each step is a (K-1, C) elementwise add plus a
    (C, C) reduction — O(K*C + C^2) work, O(K*C) state.
    """
    T, C = emit.shape
    K = lens.shape[0]
    Km = max(K - 1, 1)
    cum = _emission_cumsum(emit)  # (T+1, C)
    dur = lens[1:K, :]  # (Km, C), row j scores duration j+1
    if dur.shape[0] == 0:  # K == 1 degenerate guard
        dur = jnp.full((1, C), BIG_NEG, emit.dtype)

    is_max = semiring == "max"

    neg = jnp.full((Km, C), BIG_NEG, emit.dtype)
    w0 = neg.at[0].set(init)  # g~[0] = init - cum[0] = init

    def step(w, t):
        # span ending at boundary t (1-indexed), duration j+1, class c:
        # w[j, c] already holds gamma[t-1-j, c] - cum[t-1-j, c]
        span_scores = w + dur  # (Km, C)
        if is_max:
            bp_d = jnp.argmax(span_scores, axis=0)  # (C,)
            alpha = jnp.max(span_scores, axis=0) + cum[t]
        else:
            bp_d = None
            alpha = jax.nn.logsumexp(span_scores, axis=0) + cum[t]
        # next-boundary scores: gamma[t, c_to] = sr-sum_c' alpha[c'] + trans
        arrivals = trans + alpha[None, :]  # (C_to, C_from)
        if is_max:
            bp_c = jnp.argmax(arrivals, axis=1)  # (C_to,)
            gamma = jnp.max(arrivals, axis=1)
        else:
            bp_c = None
            gamma = jax.nn.logsumexp(arrivals, axis=1)
        w_next = jnp.concatenate([(gamma - cum[t])[None, :], w[:-1]], axis=0)
        out = (alpha, bp_d, bp_c) if is_max else alpha
        return w_next, out

    _, outs = jax.lax.scan(step, w0, jnp.arange(1, T + 1))
    if is_max:
        alphas, bp_d, bp_c = outs
        return alphas, (bp_d.astype(jnp.int32), bp_c.astype(jnp.int32))
    return outs, None


def _partition_single(trans, init, lens, emit, length, end_mask):
    alphas, _ = _forward_scan_single(trans, init, lens, emit, "log")
    final = alphas[length - 1] + end_mask
    return jax.nn.logsumexp(final)


@jax.jit
def hsmm_partition(pots: HsmmPotentials, lengths):
    """Log partition function per batch element: (B,) float32."""
    lengths = jnp.maximum(jnp.asarray(lengths), 1)
    return jax.vmap(_partition_single)(
        pots.trans, pots.init, pots.lens, pots.emit, lengths, pots.end_mask
    )


def hsmm_frame_marginals(pots: HsmmPotentials, lengths):
    """Posterior per-frame class marginals via autodiff of the partition.

    d logZ / d emit[t, c] = E[frame t has class c]; shape (B, T, C).
    """

    def total(emit):
        return hsmm_partition(pots._replace(emit=emit), lengths).sum()

    return jax.grad(total)(pots.emit)


def _viterbi_single(trans, init, lens, emit, length, end_mask):
    """Max-semiring decode for one instance.

    Returns (spans, score): spans is (T,) int32 with the class at each span
    start and -1 on continuations; frames at/after ``length`` are -1.
    """
    T, C = emit.shape
    alphas, (bp_d, bp_c) = _forward_scan_single(trans, init, lens, emit, "max")
    final = alphas[length - 1] + end_mask
    c_last = jnp.argmax(final).astype(jnp.int32)
    score = final[c_last]

    spans0 = jnp.full((T,), -1, jnp.int32)

    def cond(state):
        t, _, _ = state
        return t > 0

    def body(state):
        t, c, spans = state
        d = bp_d[t - 1, c] + 1  # duration of span ending at boundary t
        s = t - d
        spans = spans.at[s].set(c)
        c_prev = bp_c[jnp.maximum(s - 1, 0), c]
        c_next = jnp.where(s > 0, c_prev, c)
        return s, c_next, spans

    _, _, spans = jax.lax.while_loop(cond, body, (length, c_last, spans0))
    return spans, score


@jax.jit
def hsmm_viterbi(pots: HsmmPotentials, lengths):
    """Batched Viterbi decode: (spans (B, T) int32, scores (B,))."""
    lengths = jnp.maximum(jnp.asarray(lengths), 1)
    return jax.vmap(_viterbi_single)(
        pots.trans, pots.init, pots.lens, pots.emit, lengths, pots.end_mask
    )


def _gold_score_single(trans, init, lens, emit, length, end_mask, spans):
    """Joint score of a gold span sequence (same factors as the DP)."""
    T, C = emit.shape
    K = lens.shape[0]
    t_idx = jnp.arange(T)
    cum = _emission_cumsum(emit)

    valid = t_idx < length
    start = (spans >= 0) & valid
    # forward-filled class labels (class of the span covering each frame)
    filled_idx = _cummax(jnp.where(start, t_idx, 0))
    filled = spans[filled_idx]

    # next span start strictly after t (or `length` if none): suffix-min
    start_pos = jnp.where(start, t_idx, T + 1)
    suffix_min = -_cummax(-start_pos[::-1])[::-1]
    next_start = jnp.minimum(
        jnp.concatenate([suffix_min[1:], jnp.array([T + 1])]), length
    )
    dur_raw = next_start - t_idx
    dur = jnp.clip(dur_raw, 0, K - 1)
    # durations the DP cannot represent score BIG_NEG, not a clipped
    # finite value (a span longer than K-1 has zero probability)
    over_band = start & (dur_raw > K - 1)

    cls = jnp.clip(spans, 0, C - 1)
    # emission sum over each span, gathered at its class
    emit_hi = cum[jnp.minimum(next_start, T), cls]
    emit_lo = cum[jnp.minimum(t_idx, T), cls]
    span_emit = emit_hi - emit_lo

    len_term = lens[dur, cls]
    prev_cls = jnp.where(t_idx > 0, filled[jnp.maximum(t_idx - 1, 0)], 0)
    trans_term = trans[cls, prev_cls]

    per_start = span_emit + len_term + jnp.where(t_idx > 0, trans_term, init[cls])
    per_start = jnp.where(over_band, BIG_NEG, per_start)
    total = jnp.sum(jnp.where(start, per_start, 0.0))
    last_cls = filled[length - 1]
    return total + end_mask[last_cls]


@jax.jit
def hsmm_gold_score(pots: HsmmPotentials, lengths, spans):
    """Batched joint score of gold spans: (B,) float32.

    Matches the reference's ``dist.struct().score(log_potentials, parts)``
    (semimarkov_modules.py:644-655) including the EOS end-mask term.
    """
    lengths = jnp.maximum(jnp.asarray(lengths), 1)
    return jax.vmap(_gold_score_single)(
        pots.trans, pots.init, pots.lens, pots.emit, lengths, pots.end_mask, spans
    )


def hsmm_log_prob(pots: HsmmPotentials, lengths, spans):
    """log p(spans | features) = gold score - partition (discriminative)."""
    return hsmm_gold_score(pots, lengths, spans) - hsmm_partition(pots, lengths)
