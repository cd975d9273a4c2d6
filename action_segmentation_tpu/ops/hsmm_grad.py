"""Custom-VJP partition: Pallas forward + time-reversed Pallas backward.

Training against the marginal likelihood needs d logZ / d potentials
(= posterior expected sufficient statistics). Autodiff of the jnp scan
works but replays the scan; here both directional passes run the fused
Pallas log-scan (ops/hsmm_pallas.py) in ONE kernel launch — the
packed-layout ``_scan_packed_fb`` by default (the cotangent combine
then also stays packed: ``_band_grad_packed_kernel``), or
``hsmm_alphas_fb_pallas`` + the per-video jnp combine for padded
lengths beyond the packed gate — and the marginals are combined
closed-form:

  By the HSMM's time symmetry, the suffix mass S2[e, c] ("segmentations
  of frames [e, L) given the previous span had class c", including the
  transition into the first suffix span and the end mask) equals the
  prefix boundary mass of the REVERSED model — reversed emissions,
  transposed transitions, init <-> end_mask swapped. So the backward pass
  is the same forward kernel on transformed inputs.

With F[s, c] the prefix mass with the next span starting at s in class c
(init at s=0, transition-into-c folded in), the posterior of span
(start s, duration d, class c) is

  exp( F[s,c] + lens[d,c] + (cum[s+d]-cum[s])[c] + S2[s+d,c] - logZ )

from which all five cotangents (emit / trans / init / lens / end_mask)
follow by summation. This replaces torch-struct's hand-written backward
through genbmm (the reference's training hot path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    _emission_cumsum,
)
from action_segmentation_tpu.ops.hsmm_pallas import (
    _band_grad_packed,
    _lengths_i32,
    _pack_for,
    _pack_lane_values,
    _packed_G1_g2,
    _round_up,
    _scan_packed_fb,
    _unpack_plane,
    _use_packed_combine,
    hsmm_alphas_fb_pallas,
    hsmm_alphas_pallas,
)


def _lse(x, axis):
    return jax.nn.logsumexp(x, axis=axis)


def _combine_grads_single(trans, init, lens, emit, end_mask, length,
                          alphas_f, alphas_b, logZ):
    """Per-instance cotangents from forward/backward boundary scores."""
    T, C = emit.shape
    K = lens.shape[0]
    Km = K - 1
    t_idx = jnp.arange(T)

    cum = _emission_cumsum(emit)  # (T+1, C)

    # F[s, c], s = 0..T-1: prefix mass with next span starting at s, class c
    gammaF = _lse(alphas_f[:, None, :] + trans[None, :, :], axis=2)  # (T, C) at s=1..T
    F = jnp.concatenate([init[None, :], gammaF[: T - 1]], axis=0)
    F = jnp.where((t_idx < length)[:, None], F, BIG_NEG)

    # S2[e, c], e = 1..L: suffix mass given previous span class c
    # gammaR[r, c] = LSE_c' alphas_b[r-1, c'] + trans[c', c]  (r = L - e)
    gammaR = _lse(alphas_b[:, None, :] + trans.T[None, :, :], axis=2)  # (T, C) at r=1..T
    e_idx = jnp.arange(T + 1)
    r_for_e = jnp.clip(length - e_idx, 1, T)  # r = L - e
    S2 = gammaR[r_for_e - 1]  # (T+1, C)
    S2 = jnp.where((e_idx == length)[:, None], end_mask[None, :], S2)
    S2 = jnp.where(((e_idx >= 1) & (e_idx <= length))[:, None], S2, BIG_NEG)

    # per-duration shifted views: cumdiff[s, j] = cum[s+j+1] - cum[s],
    # S2s[s, j] = S2[s+j+1], valid when s+j+1 <= length. Pad to T+K rows
    # first — dynamic_slice clamps out-of-bounds starts, which would
    # silently alias rows for j >= 1.
    # Deliberately UNROLLED over the duration band: a gather-based form
    # (end_idx = s+j+1 advanced indexing, scatter-add for `stops`) was
    # measured 3-5x slower end-to-end on TPU v5e (train 6.5M -> 2.0M
    # frames/s) — static slices fuse, dynamic gathers do not. The cost
    # is HLO size linear in max_k, which is acceptable (max_k <= ~100).
    cum_pad = jnp.pad(cum, ((0, K), (0, 0)))
    S2_pad = jnp.pad(S2, ((0, K), (0, 0)), constant_values=BIG_NEG)

    def shifted(arr, j):
        return jax.lax.dynamic_slice_in_dim(arr, j + 1, T, axis=0)

    cumdiff = jnp.stack(
        [shifted(cum_pad, j) - cum[:T] for j in range(Km)], axis=1
    )
    S2s = jnp.stack([shifted(S2_pad, j) for j in range(Km)], axis=1)  # (T, Km, C)
    valid = (t_idx[:, None] + jnp.arange(1, K)[None, :]) <= length  # (T, Km)

    # Q[s, c] = LSE_d lens[d] + cumdiff + S2s  (suffix-from-s without trans)
    body = lens[None, 1:K, :] + cumdiff + S2s  # (T, Km, C)
    body = jnp.where(valid[:, :, None], body, BIG_NEG)
    Q = _lse(body, axis=1)  # (T, C)

    # span marginals M[s, d-1, c]
    M = jnp.exp(F[:, None, :] + body - logZ)  # (T, Km, C)
    M = jnp.where(valid[:, :, None], M, 0.0)

    # lens grad: rows 1..K-1
    lens_grad = jnp.concatenate(
        [jnp.zeros((1, C)), jnp.sum(M, axis=0)], axis=0
    )

    # emit grad: frame marginals — each span adds its mass on frames
    # [s, s+d); accumulate a difference array (start +, stop -) and cumsum
    starts = jnp.sum(M, axis=1)  # (T, C): mass starting at s
    stops = jnp.zeros((T + K, C))
    for j in range(Km):
        stops = stops + jnp.pad(M[:, j], ((j + 1, K - 1 - j), (0, 0)))
    # tree scan: jnp.cumsum lowers to an O(T*window) reduce-window on TPU
    emit_grad = jax.lax.associative_scan(jnp.add, starts - stops[:T], axis=0)

    # trans grad: pair marginals over interior boundaries s = 1..L-1
    s_interior = ((t_idx >= 1) & (t_idx < length))[:, None, None]
    pair = jnp.exp(
        jnp.where(
            s_interior,
            alphas_f[jnp.maximum(t_idx - 1, 0)][:, None, :]  # A_f[s] = alphas_f[s-1]
            + trans[None, :, :]
            + Q[:, :, None]
            - logZ,
            BIG_NEG,
        )
    )
    trans_grad = jnp.sum(pair, axis=0)

    init_grad = jnp.exp(init + Q[0] - logZ)
    end_grad = jnp.exp(alphas_f[length - 1] + end_mask - logZ)
    return trans_grad, init_grad, lens_grad, emit_grad, end_grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def hsmm_partition_fb(trans, init, lens, emit, end_mask, lengths, interpret=False):
    """Partition with Pallas forward and Pallas-powered backward.

    Same value as ops.hsmm.hsmm_partition; gradients come from a second
    (time-reversed) Pallas scan instead of autodiff through lax.scan.
    """
    pots = HsmmPotentials(trans, init, lens, emit, end_mask)
    _, logZ = hsmm_alphas_pallas(pots, lengths, interpret=interpret)
    return logZ


def _fb_fwd(trans, init, lens, emit, end_mask, lengths, interpret=False):
    # Differentiated call: the backward pass will need the reversed-model
    # boundary scores anyway, so run BOTH directional scans here in one
    # fused packed-batch launch and carry the packed planes as residuals
    # — the backward's cotangent combine then also stays in the packed
    # layout (no alphas unpack, no per-video reversal gathers).
    pots = HsmmPotentials(trans, init, lens, emit, end_mask)
    lengths_i = _lengths_i32(lengths)
    B, T, C = emit.shape
    if not _use_packed_combine(T, lens.shape[1]):
        alphas_f, alphas_b, logZ = hsmm_alphas_fb_pallas(
            pots, lengths, interpret=interpret
        )
        planes = (alphas_f, alphas_b)
        return logZ, (
            trans, init, lens, emit, end_mask, lengths_i, planes, logZ,
        )
    alphas_p, gammas_p, cum_inc, meta = _scan_packed_fb(
        pots, lengths_i, "log", interpret, with_alphas=True
    )
    pack, Gf = meta["pack"], meta["Gf"]
    alphas_fp = alphas_p[:Gf]  # the backward reads only the forward half
    group_of = jnp.arange(B) // pack
    lanes = (jnp.arange(B) % pack)[:, None] * C + jnp.arange(C)[None, :]
    rows = alphas_fp[group_of, jnp.maximum(lengths_i - 1, 0), :]
    fin = jnp.take_along_axis(rows, lanes, axis=1) + end_mask
    logZ = jax.nn.logsumexp(fin, axis=-1)
    planes = (
        alphas_fp, gammas_p, cum_inc,
        meta["init_p"], meta["dur_p"], meta["len_lane"],
    )
    return logZ, (
        trans, init, lens, emit, end_mask, lengths_i, planes, logZ,
    )


def _fb_bwd_packed(trans, init, lens, emit, end_mask, lengths_i, planes,
                   logZ, interpret):
    """Packed-layout cotangent combine: one Pallas band sweep emits the
    Q/start/stop/duration posterior masses; the pair marginals are then
    a fused broadcast-reduce with `trans` kept INSIDE the exponential
    (the full exponent is a log pair-posterior, always representable
    under BIG_NEG masks; XLA fuses the (T, C, C) broadcast into the
    axis-1 reduction without materializing it — see the inline comment
    and docs/DESIGN.md)."""
    B, T, C = emit.shape
    K = lens.shape[1]
    Km = K - 1
    alphas_fp, gammas_p, cum_inc, init_p, dur_p, len_lane = planes
    pack = _pack_for(C, B)
    Bp0 = _round_up(B, pack)
    meta = dict(
        pack=pack, Bp0=Bp0, Gf=Bp0 // pack, Tp=alphas_fp.shape[1],
        Km_pad=dur_p.shape[1], T=T, C=C,
        init_p=init_p, dur_p=dur_p, len_lane=len_lane,
    )
    Gf = meta["Gf"]

    G1, g2, cum_exc = _packed_G1_g2(gammas_p, cum_inc, meta)
    logZ_lane = _pack_lane_values(logZ, meta)
    G1m = G1 - logZ_lane
    QG, SA, ST, LG = _band_grad_packed(G1m, g2, dur_p[:Gf], Km, interpret)

    # emit grad: frame marginals via the start/stop difference array
    eg_p = jax.lax.associative_scan(jnp.add, SA - ST, axis=1)
    emit_grad = _unpack_plane(eg_p, B, T, C, pack)

    # lens grad: rows 1..K-1 are the per-duration posterior masses
    lg = _unpack_plane(LG, B, Km, C, pack)
    lens_grad = jnp.concatenate([jnp.zeros((B, 1, C)), lg], axis=1)

    # Q[s] = LSE_j body (suffix-from-s without the transition)
    Q = _unpack_plane(QG - cum_exc, B, T, C, pack)
    af = _unpack_plane(alphas_fp, B, T, C, pack)

    # trans grad: pair marginals over interior boundaries s = 1..L-1.
    # trans MUST stay inside the exponential: the full exponent is a log
    # pair-posterior (<= ~0, always representable), whereas any
    # factorization that pulls exp(trans) out overflows whenever a
    # BIG_NEG-masked transition (the default: self-transitions banned,
    # grammar constraints) separates a dominant af lane from the class
    # it cannot reach. XLA fuses this broadcast-sum into the axis-1
    # reduction without materializing the (T, C, C) tensor.
    t_idx = jnp.arange(T)
    interior = (t_idx[None, :] >= 1) & (t_idx[None, :] < lengths_i[:, None])
    af_sh = jnp.concatenate([jnp.zeros((B, 1, C)), af[:, : T - 1, :]], axis=1)
    pair = jnp.exp(
        jnp.where(
            interior[:, :, None, None],
            af_sh[:, :, None, :]
            + trans[:, None, :, :]
            + Q[:, :, :, None]
            - logZ[:, None, None, None],
            BIG_NEG,
        )
    )
    trans_grad = jnp.sum(pair, axis=1)

    init_grad = jnp.exp(init + Q[:, 0, :] - logZ[:, None])
    af_fin = jnp.take_along_axis(
        af, jnp.maximum(lengths_i - 1, 0)[:, None, None], axis=1
    )[:, 0, :]
    end_grad = jnp.exp(af_fin + end_mask - logZ[:, None])
    return trans_grad, init_grad, lens_grad, emit_grad, end_grad


def _fb_bwd(interpret, res, g):
    trans, init, lens, emit, end_mask, lengths_i, planes, logZ = res
    T = emit.shape[1]
    if _use_packed_combine(T, lens.shape[1]):
        grads = _fb_bwd_packed(
            trans, init, lens, emit, end_mask, lengths_i, planes, logZ,
            interpret,
        )
    else:
        alphas_f, alphas_b = planes
        grads = jax.vmap(_combine_grads_single)(
            trans, init, lens, emit, end_mask, lengths_i,
            alphas_f, alphas_b, logZ,
        )
    trans_g, init_g, lens_g, emit_g, end_g = grads
    gb = g[:, None, None]
    return (
        trans_g * gb,
        init_g * g[:, None],
        lens_g * gb,
        emit_g * gb,
        end_g * g[:, None],
        np.zeros(np.shape(lengths_i), jax.dtypes.float0),
    )


hsmm_partition_fb.defvjp(_fb_fwd, _fb_bwd)


def hsmm_partition_fast(pots: HsmmPotentials, lengths, interpret=False):
    """Convenience wrapper taking an HsmmPotentials bundle."""
    return hsmm_partition_fb(
        pots.trans, pots.init, pots.lens, pots.emit, pots.end_mask, lengths, interpret
    )


def hsmm_frame_marginals_fast(pots: HsmmPotentials, lengths, interpret=False):
    """Posterior per-frame class marginals via the Pallas forward/backward
    pair: d logZ / d emit[t, c] = E[frame t has class c]; (B, T, C).

    Fast sibling of ops.hsmm.hsmm_frame_marginals (which autodiffs the
    jnp scan)."""

    def total(emit):
        return hsmm_partition_fb(
            pots.trans, pots.init, pots.lens, emit, pots.end_mask, lengths, interpret
        ).sum()

    return jax.grad(total)(pots.emit)
