"""Pallas TPU kernels for the banded semi-Markov DP.

This is the TPU-native replacement for the reference's native kernel
layer (genbmm's CUDA banded log/max matmuls driven by torch-struct; see
SURVEY §2.10). Kernels, per launch:

  * `_forward_kernel` — banded max-/log-semiring forward scan over
    time, duration band on sublanes, classes on lanes, O(K*C) working
    set in VMEM scratch, emitting the alphas plane;
  * `_gamma_kernel` — the scan variant behind the packed-layout decode
    and custom-VJP paths: per-lane init INJECTION (chains may start at
    any step, enabling a batch-uniform full flip for the time-reversed
    model) and a gamma-plane (per-step transition combine) output;
  * `_viterbi_kernel` — the scan with packed (duration, prev-class)
    backpointer codes for the exact-spans API (traceback outside, one
    vectorized jnp while-loop over the batch);
  * `_band_max_packed_kernel` / `_band_grad_packed_kernel` — the
    VMEM-resident duration-band combines that turn the two directional
    scans into frame labels (max) or the five partition cotangents
    (log); as plain XLA ops these sweeps ran as ~2*Km separate
    HBM-bound kernels.

Two levels of batching keep the sequential time loop fed:
  * **lane packing** — per-task class counts are far below the 128-lane
    width, so P videos share one DP over a block-diagonal transition
    matrix (cross-video transitions are BIG_NEG, so the chains are
    independent) — the lane dimension does the batching the reference
    got from genbmm's batched bmm; the fused dual-direction paths stack
    the reversed model's videos onto the same axis;
  * **group stacking** — packed groups ride a leading G dimension of
    every state tensor, so one T-step loop advances all groups instead
    of running G sequential grid passes.

Shapes inside a scan launch (G = packed groups in this chunk):
  trans  (G, 128, 128)  block-diagonal [to, from], BIG_NEG off-blocks
  init   (G, 1, 128)
  dur    (G, Km_pad, 128)  row j scores duration j+1, BIG_NEG padding
  emit   (G, T, 128)       per-frame log-likelihoods, 0 padding
  start  (G, 1, 128) int32 (injection variant: chain start steps)

Per-video finals are gathered from the emitted planes in plain jnp;
docs/DESIGN.md has the derivations and the measured numbers.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    _emission_cumsum,
    reverse_within_length as _reverse_within_length,
)

LANES = 128
MAX_PACK = 8
# VMEM budget for the per-launch time-chunk planes (emit in + alpha/bp
# out, double-buffered by the pipeline); chunks of groups are launched
# separately above this. TPU v4/v5 chips carry 64-128 MB of VMEM; 48 MB
# keeps headroom for scratch while letting serving-size batches run as
# one launch (G up to 12 forward / 8 viterbi at the 2048-frame chunk).
_VMEM_PLANE_BUDGET = 48 * 1024 * 1024
_TIME_CHUNK = 2048  # forward-scan grid chunk (frames per VMEM-resident block)
# Unroll factor for the sequential time loop inside the kernels (the
# recurrence is serial, but unrolling lets Mosaic software-pipeline the
# independent loads/stores of adjacent steps past the dependent VPU
# chain and drops loop-control overhead). Swept on a v5e chip at the
# bench shape: decode 10.3 -> 11.1-11.4M frames/s across 1 -> 16, flat
# to slightly worse at 32; train plateaus ~7.3M from 8. Env-tunable for
# re-sweeps; _TIME_CHUNK and the LANES padding keep every chunk length
# divisible by it.
_UNROLL = int(os.environ.get("ASEG_SCAN_UNROLL", "16") or 1)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pack_for(C, B):
    """Videos packed per 128-lane group — the ONE copy of the formula:
    the backward combine (ops/hsmm_grad.py) must recompute exactly the
    pack the forward used to unpack its residual planes, so any tuning
    happens here or lane unpacking silently misaligns."""
    return max(1, min(MAX_PACK, LANES // C, B))


def _lengths_i32(lengths):
    """int32 lengths clamped to >= 1, the contract every entry point
    shares with the jnp paths (ops/hsmm.py header): a 0 would otherwise
    read the last padded row via negative indexing."""
    return jnp.maximum(jnp.asarray(lengths, jnp.int32), 1)


def pallas_supported(n_classes):
    """True when the fused kernels can run: a TPU backend and C <= 128."""
    if n_classes > LANES:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def _viterbi_kernel(trans_ref, init_ref, dur_ref, emit_ref,
                    bp_ref, alphas_ref, W, cum):
    """Max-semiring forward scan with backpointers, time-chunked grid.

    bp_ref[g, t-1, c] packs (argmax duration index for a span ending at t
    with class c) * LANES + (argmax previous class at boundary t given
    next class c).

    Like _forward_kernel, the grid runs over time chunks with the carry
    (W, running emission cumsum) in persistent scratch, so the bp and
    alpha planes stream through VMEM (pipelined DMA) and T is unbounded
    — no VMEM cliff on long videos. Per-video finals (scores, starting
    class) are gathered from the alphas output outside the kernel.
    """
    G, Tc, _ = emit_ref.shape
    Km = W.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cum[...] = jnp.zeros_like(cum)
        W[...] = jnp.full_like(W, BIG_NEG)
        W[:, 0:1, :] = init_ref[...]

    dur = dur_ref[...]
    trans = trans_ref[...]

    def step(i, _):
        e = emit_ref[:, pl.ds(i, 1), :]  # (G, 1, LANES)
        cum[:, 0:1, :] += e
        span = W[...] + dur  # (G, Km, LANES)
        alpha = jnp.max(span, axis=1, keepdims=True) + cum[:, 0:1, :]
        alphas_ref[:, pl.ds(i, 1), :] = alpha
        bp_d = jnp.argmax(span, axis=1)[:, None, :].astype(jnp.int32)
        arr = trans + alpha  # (G, to, from); alpha broadcasts over `to`
        gamma_col = jnp.max(arr, axis=2, keepdims=True)  # (G, LANES, 1)
        bp_c = jnp.argmax(arr, axis=2)[:, None, :].astype(jnp.int32)
        bp_ref[:, pl.ds(i, 1), :] = bp_d * LANES + bp_c
        gamma = gamma_col.reshape(G, 1, LANES)
        w_prev = W[...]
        W[:, 1:Km, :] = w_prev[:, : Km - 1, :]
        W[:, 0:1, :] = gamma - cum[:, 0:1, :]
        return 0

    _time_loop(step, Tc)


def _forward_kernel(semiring, trans_ref, init_ref, dur_ref,
                    emit_ref, alphas_ref, W, cum):
    """Semiring forward scan, no backpointers, time-chunked grid.

    `semiring` is 'log' (logsumexp — partition) or 'max' (Viterbi score).
    Emits the full boundary-score table `alphas` (alphas[g, t-1, c] =
    semiring-mass of segmentations of [0, t) whose final span has class
    c) — the residual that (a) the custom-VJP backward combines with a
    time-reversed run into posterior marginals (log), or (b) the
    traceback-free label decode combines into max-marginals (max).
    Per-video finals/scores are gathered from `alphas` outside the
    kernel.

    The grid runs over time chunks: the carry (W, running emission
    cumsum) lives in scratch that persists across sequential grid steps,
    so emission/alpha blocks stream through VMEM (pipelined DMA) and T
    is unbounded.
    """
    G, Tc, _ = emit_ref.shape
    Km = W.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cum[...] = jnp.zeros_like(cum)
        W[...] = jnp.full_like(W, BIG_NEG)
        W[:, 0:1, :] = init_ref[...]

    dur = dur_ref[...]
    trans = trans_ref[...]
    reduce_ = _semiring_reduce(semiring)

    def step(i, _):
        e = emit_ref[:, pl.ds(i, 1), :]
        cum[:, 0:1, :] += e
        span = W[...] + dur
        alpha = reduce_(span, 1) + cum[:, 0:1, :]
        alphas_ref[:, pl.ds(i, 1), :] = alpha
        arr = trans + alpha
        gamma = reduce_(arr, 2).reshape(G, 1, LANES)
        w_prev = W[...]
        W[:, 1:Km, :] = w_prev[:, : Km - 1, :]
        W[:, 0:1, :] = gamma - cum[:, 0:1, :]
        return 0

    _time_loop(step, Tc)


def _semiring_reduce(semiring):
    if semiring == "log":
        def reduce_(x, axis):
            m = jnp.max(x, axis=axis, keepdims=True)
            return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))
    else:
        def reduce_(x, axis):
            return jnp.max(x, axis=axis, keepdims=True)
    return reduce_


def _time_loop(step, Tc):
    if _UNROLL > 1 and Tc % _UNROLL == 0:
        # Mosaic's fori_loop lowering supports only unroll=1 or full
        # unroll, so unroll manually: the recurrence stays serial, but
        # adjacent steps' independent loads/stores can software-pipeline.
        def stepu(j, _):
            for u in range(_UNROLL):
                step(j * _UNROLL + u, 0)
            return 0

        jax.lax.fori_loop(0, Tc // _UNROLL, stepu, 0)
    else:
        jax.lax.fori_loop(0, Tc, step, 0)


def _gamma_kernel(semiring, with_alphas, trans_ref, init_ref, dur_ref,
                  emit_ref, start_ref, *refs):
    """Forward scan variant for the packed-layout combine: per-lane init
    INJECTION and a gamma-plane output instead of alphas.

    * ``start_ref (G, 1, 128) int32``: global step at which each lane's
      chain begins. The fused decode stacks the time-REVERSED model as
      extra videos whose emissions are flipped over the FULL padded
      buffer (a batch-uniform flip — no per-video gather), so a reversed
      video's chain starts at step T - length. At step t == start the
      kernel writes ``init - cum`` into the carry row (the running cum
      then cancels whatever junk pad emissions accumulated before the
      start). Pre-start state stays ~BIG_NEG and can never beat or leak
      into real paths (max: loses by ~1e9; log: exp underflows to 0).
    * ``gammas_ref``: stores the per-step transition combine
      gamma[t] = reduce_c'(trans[c, c'] + alpha[t, c']) — exactly the
      boundary combine the label/marginal recombination needs, so it is
      never re-derived from alphas outside (the (C, C, T) XLA reduction
      and the alphas unpack both disappear).
    * ``with_alphas``: additionally stream the alphas plane (the
      custom-VJP path needs it for logZ and the pair marginals; the
      decode path skips the store).
    """
    if with_alphas:
        alphas_ref, gammas_ref, W, cum = refs
    else:
        (gammas_ref, W, cum), alphas_ref = refs, None
    G, Tc, _ = emit_ref.shape
    Km = W.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cum[...] = jnp.zeros_like(cum)
        W[...] = jnp.full_like(W, BIG_NEG)

    dur = dur_ref[...]
    trans = trans_ref[...]
    start = start_ref[...]
    reduce_ = _semiring_reduce(semiring)
    base = pl.program_id(0) * Tc

    def step(i, _):
        inj = start == (base + i)  # (G, 1, LANES)
        W[:, 0:1, :] = jnp.where(
            inj, init_ref[...] - cum[:, 0:1, :], W[:, 0:1, :]
        )
        e = emit_ref[:, pl.ds(i, 1), :]
        cum[:, 0:1, :] += e
        span = W[...] + dur
        alpha = reduce_(span, 1) + cum[:, 0:1, :]
        if with_alphas:
            alphas_ref[:, pl.ds(i, 1), :] = alpha
        arr = trans + alpha
        gamma = reduce_(arr, 2).reshape(G, 1, LANES)
        gammas_ref[:, pl.ds(i, 1), :] = gamma
        w_prev = W[...]
        W[:, 1:Km, :] = w_prev[:, : Km - 1, :]
        W[:, 0:1, :] = gamma - cum[:, 0:1, :]
        return 0

    _time_loop(step, Tc)


def _pack_potentials(pots: HsmmPotentials, pack):
    """Pack B videos into G groups of `pack` along the lane axis.

    End masks and lengths are NOT packed: per-video finals are gathered
    from the kernels' alpha-plane output in plain jnp."""
    B, T, C = pots.emit.shape
    K = pots.lens.shape[1]
    Km = K - 1
    G = -(-B // pack)
    Bp = G * pack
    Tp = _padded_T(T)
    Km_pad = _round_up(max(Km, 1), 8)

    def pad_b(x):
        return jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))

    emit = pad_b(pots.emit)
    emit = jnp.pad(emit, ((0, 0), (0, Tp - T), (0, 0)))
    emit = emit.reshape(G, pack, Tp, C).transpose(0, 2, 1, 3).reshape(G, Tp, pack * C)
    emit = jnp.pad(emit, ((0, 0), (0, 0), (0, LANES - pack * C)))

    init = pad_b(pots.init + 0.0)
    init = init.at[B:].set(BIG_NEG) if Bp > B else init
    init = init.reshape(G, pack * C)
    init = jnp.pad(init, ((0, 0), (0, LANES - pack * C)), constant_values=BIG_NEG)
    init = init[:, None, :]  # (G, 1, LANES)

    dur = pad_b(pots.lens)[:, 1:K, :]  # (Bp, Km, C)
    dur = dur.reshape(G, pack, Km, C).transpose(0, 2, 1, 3).reshape(G, Km, pack * C)
    dur = jnp.pad(
        dur,
        ((0, 0), (0, Km_pad - Km), (0, LANES - pack * C)),
        constant_values=BIG_NEG,
    )

    trans = pad_b(pots.trans)  # (Bp, C, C)
    trans_bd = jnp.full((G, LANES, LANES), BIG_NEG, jnp.float32)
    trans_g = trans.reshape(G, pack, C, C)
    for v in range(pack):
        trans_bd = jax.lax.dynamic_update_slice(
            trans_bd, trans_g[:, v], (0, v * C, v * C)
        )

    return emit, init, dur, trans_bd, G, Tp, Km_pad


def _chunk_bounds(G, bytes_per_group):
    """Groups per launch so the VMEM-resident planes fit the budget."""
    return max(1, min(G, _VMEM_PLANE_BUDGET // max(bytes_per_group, 1)))


def _launch_scan(kernel, out_dtypes, trans_bd, init, dur, emit, interpret,
                 extra_inputs=()):
    """Shared time-chunked launcher for the forward/backpointer kernels:
    static factor tables, emission blocks streamed by chunk, one
    (G, Tc, LANES) output plane per dtype in `out_dtypes`. Entries of
    `extra_inputs` are additional static (G, 1, LANES) tables (e.g. the
    per-lane start steps of the injection variant)."""
    G, Tp = emit.shape[0], emit.shape[1]
    Km_pad = dur.shape[1]
    Tc = min(Tp, _TIME_CHUNK)
    n_chunks = Tp // Tc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((G, LANES, LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((G, 1, LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((G, Km_pad, LANES), lambda i: (0, 0, 0)),
            pl.BlockSpec((G, Tc, LANES), lambda i: (0, i, 0)),
        ]
        + [pl.BlockSpec((G, 1, LANES), lambda i: (0, 0, 0)) for _ in extra_inputs],
        out_specs=[
            pl.BlockSpec((G, Tc, LANES), lambda i: (0, i, 0))
            for _ in out_dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((G, Km_pad, LANES), jnp.float32),
            pltpu.VMEM((G, 8, LANES), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, Tp, LANES), dt) for dt in out_dtypes
        ],
        interpret=interpret,
    )(trans_bd, init, dur, emit, *extra_inputs)


def _launch_viterbi(trans_bd, init, dur, emit, interpret):
    return _launch_scan(
        _viterbi_kernel, (jnp.int32, jnp.float32),
        trans_bd, init, dur, emit, interpret,
    )


def _launch_forward(semiring, trans_bd, init, dur, emit, interpret):
    return _launch_scan(
        functools.partial(_forward_kernel, semiring), (jnp.float32,),
        trans_bd, init, dur, emit, interpret,
    )


def _chunked(launch, packed, bytes_per_group, interpret):
    """Launch over group chunks bounded by the VMEM plane budget."""
    emit, init, dur, trans_bd, G, Tp, Km_pad = packed
    Gc = _chunk_bounds(G, bytes_per_group)
    return _launch_group_chunks(
        lambda s, e: launch(
            trans_bd[s:e], init[s:e], dur[s:e], emit[s:e], interpret
        ),
        G,
        Gc,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsmm_viterbi_pallas(pots: HsmmPotentials, lengths, interpret=False):
    """Batched Viterbi via the fused Pallas kernel.

    Same contract as ops.hsmm.hsmm_viterbi: returns (spans (B, T) int32
    with -1 continuations/padding, scores (B,)). Requires C <= 128.
    """
    B, T, C = pots.emit.shape
    assert C <= LANES, "pack wrapper requires C <= 128"
    pack = _pack_for(C, B)
    packed = _pack_potentials(pots, pack)
    G, Tp = packed[4], packed[5]
    # bp + alpha planes stream through VMEM time-chunked (like the
    # forward kernel), so T is unbounded; group chunks bound G
    Tc = min(Tp, _TIME_CHUNK)
    bp_p, alphas_p = _chunked(
        _launch_viterbi, packed, bytes_per_group=Tc * LANES * 4 * 6,
        interpret=interpret,
    )

    group_of = jnp.arange(B) // pack
    offsets = ((jnp.arange(B) % pack) * C).astype(jnp.int32)
    # per-video finals from the alphas plane at t = length - 1
    lengths_i = _lengths_i32(lengths)
    rows = alphas_p[group_of, jnp.maximum(lengths_i - 1, 0), :]  # (B, LANES)
    lanes = offsets[:, None] + jnp.arange(C)[None, :]
    fin = jnp.take_along_axis(rows, lanes, axis=1) + pots.end_mask  # (B, C)
    scores = jnp.max(fin, axis=1)
    c0 = (offsets + jnp.argmax(fin, axis=1).astype(jnp.int32)).astype(jnp.int32)

    def traceback(g, c_start, length, off):
        spans0 = jnp.full((T,), -1, jnp.int32)

        def cond(state):
            t, _, _ = state
            return t > 0

        def body(state):
            t, c, spans = state
            code_d = bp_p[g, t - 1, c]
            d = code_d // LANES + 1
            s = t - d
            spans = spans.at[s].set(c - off)
            code_c = bp_p[g, jnp.maximum(s - 1, 0), c]
            c_prev = code_c % LANES
            c_next = jnp.where(s > 0, c_prev, c)
            return s, c_next, spans

        _, _, spans = jax.lax.while_loop(
            cond, body, (length, c_start, spans0)
        )
        return spans

    spans = jax.vmap(traceback)(group_of, c0, lengths_i, offsets)
    return spans, scores


def _run_forward(pots, lengths, interpret, semiring):
    B, T, C = pots.emit.shape
    assert C <= LANES, "pack wrapper requires C <= 128"
    pack = _pack_for(C, B)
    packed = _pack_potentials(pots, pack)
    G = packed[4]
    Tp = packed[5]
    # time-chunked streaming: VMEM holds ~4 (G, Tc, 128) buffers
    Tc = min(Tp, _TIME_CHUNK)
    (alphas_p,) = _chunked(
        functools.partial(_launch_forward, semiring), packed,
        bytes_per_group=Tc * LANES * 4 * 4, interpret=interpret,
    )
    # unpack alphas: lanes are contiguous per-video C blocks
    alphas = (
        alphas_p[:, :, : pack * C]
        .reshape(G, Tp, pack, C)
        .transpose(0, 2, 1, 3)
        .reshape(G * pack, Tp, C)[:B, :T]
    )
    # per-video finals/scores, gathered in jnp (kernel emits alphas only)
    lengths_i = _lengths_i32(lengths)
    fin = jnp.take_along_axis(
        alphas, jnp.maximum(lengths_i - 1, 0)[:, None, None], axis=1
    )[:, 0, :] + pots.end_mask
    if semiring == "log":
        scores = jax.nn.logsumexp(fin, axis=-1)
    else:
        scores = jnp.max(fin, axis=-1)
    return alphas, scores


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsmm_partition_pallas(pots: HsmmPotentials, lengths, interpret=False):
    """Batched log partition via the fused Pallas kernel: (B,) float32."""
    return _run_forward(pots, lengths, interpret, "log")[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsmm_alphas_pallas(pots: HsmmPotentials, lengths, interpret=False):
    """Forward boundary scores + partition: (alphas (B, T, C), logZ (B,)).

    alphas[b, t-1, c] = log-mass of segmentations of frames [0, t) of
    instance b whose final span has class c (rows at/after length are
    unspecified).
    """
    return _run_forward(pots, lengths, interpret, "log")


def _stack_fwd_rev(pots: HsmmPotentials, lengths):
    """Concatenate the model with its time-reversed counterpart on the
    batch axis, so both directional scans ride ONE kernel launch.

    By the HSMM's time symmetry the suffix boundary mass equals the
    prefix boundary mass of the REVERSED model: reversed emissions,
    transposed transitions, init <-> end_mask swapped. Stacking fwd and
    rev videos into one 2B batch halves launch count and lets XLA fuse
    one shared pack/unpack instead of two (the "fused fwd+bwd launch"
    lever of docs/DESIGN.md §7)."""
    emit_rev = _reverse_within_length(pots.emit, lengths)
    cat = HsmmPotentials(
        trans=jnp.concatenate(
            [pots.trans, jnp.swapaxes(pots.trans, -1, -2)], axis=0
        ),
        init=jnp.concatenate([pots.init, pots.end_mask], axis=0),
        lens=jnp.concatenate([pots.lens, pots.lens], axis=0),
        emit=jnp.concatenate([pots.emit, emit_rev], axis=0),
        end_mask=jnp.concatenate([pots.end_mask, pots.init], axis=0),
    )
    lengths_i = _lengths_i32(lengths)
    return cat, jnp.concatenate([lengths_i, lengths_i], axis=0)


def _run_forward_fb(pots: HsmmPotentials, lengths, interpret, semiring):
    """One fused launch for the forward AND time-reversed scans.

    Returns (alphas_f (B, T, C), alphas_b (B, T, C), scores (B,)):
    alphas_b are the reversed model's boundary scores (suffix masses read
    off by time symmetry); scores are the forward finals (logZ for 'log',
    Viterbi score for 'max')."""
    B = pots.emit.shape[0]
    cat, lengths2 = _stack_fwd_rev(pots, lengths)
    alphas, scores = _run_forward(cat, lengths2, interpret, semiring)
    return alphas[:B], alphas[B:], scores[:B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsmm_alphas_fb_pallas(pots: HsmmPotentials, lengths, interpret=False):
    """Forward + backward (time-reversed) boundary scores in one fused
    log-semiring launch: (alphas_f (B, T, C), alphas_b (B, T, C),
    logZ (B,)). Used by the custom-VJP training path so forward and
    backward passes cost one kernel launch total."""
    return _run_forward_fb(pots, lengths, interpret, "log")


def _labels_prep_single(trans, init, lens, emit, end_mask, length,
                        alphas_f, alphas_b):
    """Per-video prep for the max-marginal decode: boundary-split scores.

    Splits each span's best-path score into a prefix part at the start
    boundary s and a suffix part at the end boundary e = s + j + 1:

      M[s, j] = G1[s] + lens[j+1] + G2[s+j+1]

    with G1 = F - cum (F the forward boundary combine, masked past
    length) and G2 = cum + S2 (S2 the reversed-model suffix combine,
    masked past length). Laid out TIME-MINOR (C, T): with C ~ 20 minor
    XLA pads every vector tile to 128 lanes; with T minor lanes are
    full. Returns (G1 (C, T), G2_pad (C, T+K))."""
    T, C = emit.shape
    K = lens.shape[0]
    t_row = jnp.arange(T)[None, :]  # (1, T) time index for masks

    cumT = _emission_cumsum(emit).T  # (C, T+1)
    afT = alphas_f.T  # (C, T)
    abT = alphas_b.T

    # F[c, s]: best prefix with next span starting at s in class c
    gammaF = jnp.max(afT[None, :, :] + trans[:, :, None], axis=1)  # (C_to, T)
    F = jnp.concatenate([init[:, None], gammaF[:, : T - 1]], axis=1)
    F = jnp.where(t_row < length, F, BIG_NEG)

    # S2[c, e]: best suffix given previous span class c (reversed model).
    # gammaR[c, r-1] holds the reversed-boundary combine at r = L - e, so
    # S2[c, e] = gammaR[c, L-e-1]: one batched row gather (vmapped
    # dynamic_slice lowers to a sequential per-video while loop instead).
    gammaR = jnp.max(abT[None, :, :] + trans.T[:, :, None], axis=1)  # (C, T)
    e_row = jnp.arange(T + 1)[None, :]
    idx = jnp.clip(length - e_row[0] - 1, 0, T - 1)
    S2 = jnp.take_along_axis(gammaR.T, idx[:, None], axis=0).T  # (C, T+1)
    S2 = jnp.where(e_row == length, end_mask[:, None], S2)
    S2 = jnp.where((e_row >= 1) & (e_row <= length), S2, BIG_NEG)

    G1 = F - cumT[:, :T]
    G2_pad = jnp.pad(cumT + S2, ((0, 0), (0, K)), constant_values=BIG_NEG)
    return G1, G2_pad


def _band_max_kernel(Km, g1_ref, g2_ref, lens_ref, fm_ref, h_ref):
    """Max-marginal band combine, fully VMEM-resident.

    Span (s, d) covers frame t iff r = t - s <= d - 1, so with
    H_r[s] = max_{j >= r} lens[j+1] + G2[s+j+1] (a running max over
    descending r), frame_max[t] = max_r (G1 + H_r)[t - r].

    As XLA kernels the Km shifted slice/pad steps ran as ~2*Km separate
    HBM-bound kernels (~0.5 ms at the bench shape); here the whole band
    is one launch (~Km fused vector passes). The running H rides a VMEM
    scratch ref and fm accumulates in the output ref so the scoped-VMEM
    stack only holds one or two (Bc, C, T) temporaries at a time."""
    Bc, Cp, T = g1_ref.shape
    h_ref[...] = jnp.full(h_ref.shape, BIG_NEG, jnp.float32)
    fm_ref[...] = jnp.full(fm_ref.shape, BIG_NEG, jnp.float32)
    for r in range(Km - 1, -1, -1):
        h_ref[...] = jnp.maximum(
            h_ref[...],
            lens_ref[:, :, r : r + 1] + g2_ref[:, :, r + 1 : r + 1 + T],
        )
        val = g1_ref[...] + h_ref[...]
        if r:
            val = jnp.concatenate(
                [jnp.full((Bc, Cp, r), BIG_NEG, jnp.float32),
                 jax.lax.slice_in_dim(val, 0, T - r, axis=2)],
                axis=2,
            )
        fm_ref[...] = jnp.maximum(fm_ref[...], val)


def _band_max_jnp(G1, G2p, lens_tab, Km):
    """Pure-jnp band combine: the final fallback when even one video's
    (C, T) planes exceed the kernel's scoped-VMEM stack (T beyond
    ~25k frames at C=24) — keeps the labels path truly T-unbounded.
    Same recurrence as _band_max_kernel, shifted slices along time."""
    B, C, T = G1.shape

    def shifted(arr, j):
        return jax.lax.dynamic_slice_in_dim(arr, j, T, axis=2)

    H = jnp.full((B, C, T), BIG_NEG, jnp.float32)
    fm = jnp.full((B, C, T), BIG_NEG, jnp.float32)
    for r in range(Km - 1, -1, -1):
        H = jnp.maximum(
            H, lens_tab[:, :, r : r + 1] + shifted(G2p, r + 1)
        )
        fm = jnp.maximum(
            fm,
            jnp.pad(
                (G1 + H)[:, :, : T - r], ((0, 0), (0, 0), (r, 0)),
                constant_values=BIG_NEG,
            ),
        )
    return fm


def _band_max_pallas(G1, G2p, lens_tab, Km, interpret):
    """Launch the band combine over batch chunks bounded by VMEM."""
    B, C, T = G1.shape
    Cp = _round_up(C, 8)
    # live per video: g1/g2/fm blocks + H scratch + ~3 loop temporaries
    bytes_per_video = 7 * Cp * (T + lens_tab.shape[2] + 1) * 4
    if bytes_per_video > _VMEM_PLANE_BUDGET // 4:
        return _band_max_jnp(G1, G2p, lens_tab, Km)
    Bc = max(1, min(B, (_VMEM_PLANE_BUDGET // 4) // max(bytes_per_video, 1)))

    def call(start, end):
        return [pl.pallas_call(
            functools.partial(_band_max_kernel, Km),
            out_shape=jax.ShapeDtypeStruct((end - start, C, T), jnp.float32),
            scratch_shapes=[pltpu.VMEM((end - start, C, T), jnp.float32)],
            interpret=interpret,
        )(G1[start:end], G2p[start:end], lens_tab[start:end])]

    return _launch_group_chunks(call, B, Bc)[0]


def _padded_T(T):
    """Packed-layout padded time length (the time-chunked forward grid
    must divide it evenly). Single source of truth for _pack_potentials
    and the packed-combine gate."""
    return _round_up(T, LANES if T <= _TIME_CHUNK else _TIME_CHUNK)


def _grad_combine_bytes(Tp, Km_pad):
    """Resident f32 planes of ONE group of the gradient band sweep
    (_band_grad_packed's inputs + outputs + scratch) — the largest
    packed-combine launch, so it bounds the whole packed path."""
    return 10 * (Tp + Km_pad + 1) * LANES * 4


# Ceiling for a single grad-band group. Measured on this chip: the
# Tp = 8192 launch (~42 MB of planes at K = 20) still compiles; past it
# the kernel's scoped-VMEM stack overflows even at one group per
# launch. Derived from the same byte formula the launch chunking uses,
# so the gate tracks K and T together; smaller-VMEM parts lower this
# one constant.
_PACKED_COMBINE_BYTE_CEILING = _grad_combine_bytes(8192, 24)


def _use_packed_combine(T, K):
    """True when one group of the packed-layout combines fits the
    measured VMEM ceiling (the single gate shared by the decode and
    custom-VJP paths)."""
    Km_pad = _round_up(max(K - 1, 1), 8)
    return _grad_combine_bytes(_padded_T(T), Km_pad) <= _PACKED_COMBINE_BYTE_CEILING


def _launch_group_chunks(build_call, n_items, per_chunk):
    """Run a pallas launch over leading-axis chunks and concatenate each
    output; `build_call(s, e)` returns the launch's output list."""
    outs = []
    for s in range(0, n_items, per_chunk):
        e = min(s + per_chunk, n_items)
        outs.append(build_call(s, e))
    return [
        jnp.concatenate(p, axis=0) if len(outs) > 1 else p[0]
        for p in zip(*outs)
    ]


def _band_max_packed_kernel(Km, g1_ref, g2_ref, dur_ref, fm_ref, h_ref):
    """Packed-layout max-marginal band combine (time on the sublane-ish
    middle axis, packed video-classes on lanes), fully VMEM-resident.

    With H_r[s] = max_{j >= r} dur[j] + G2[s+j+1] (a running max over
    descending r), frame_max[t] = max_r (G1 + H_r)[t - r]. The running H
    rides a VMEM scratch ref and fm accumulates in the output ref so the
    scoped-VMEM stack holds only a couple of (Gc, Tp, 128) temporaries."""
    Gc, Tp, L = g1_ref.shape
    h_ref[...] = jnp.full(h_ref.shape, BIG_NEG, jnp.float32)
    fm_ref[...] = jnp.full(fm_ref.shape, BIG_NEG, jnp.float32)
    for r in range(Km - 1, -1, -1):
        # g2 rows are already boundary-shifted (g2[i] = G2[e=i+1]), so
        # H_r[s] = dur[r] + G2[s+r+1] reads g2[s + r]
        h_ref[...] = jnp.maximum(
            h_ref[...],
            dur_ref[:, r : r + 1, :] + g2_ref[:, r : r + Tp, :],
        )
        val = g1_ref[...] + h_ref[...]
        if r:
            val = jnp.concatenate(
                [jnp.full((Gc, r, L), BIG_NEG, jnp.float32),
                 jax.lax.slice_in_dim(val, 0, Tp - r, axis=1)],
                axis=1,
            )
        fm_ref[...] = jnp.maximum(fm_ref[...], val)


def _band_max_packed(G1, G2p, dur_p, Km, interpret):
    """Launch the packed band combine over group chunks bounded by VMEM."""
    G, Tp, _ = G1.shape
    bytes_per_group = 7 * (Tp + dur_p.shape[1] + 1) * LANES * 4
    Gc = max(1, min(G, (_VMEM_PLANE_BUDGET // 4) // max(bytes_per_group, 1)))

    def call(start, end):
        return [pl.pallas_call(
            functools.partial(_band_max_packed_kernel, Km),
            out_shape=jax.ShapeDtypeStruct((end - start, Tp, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((end - start, Tp, LANES), jnp.float32)],
            interpret=interpret,
        )(G1[start:end], G2p[start:end], dur_p[start:end])]

    return _launch_group_chunks(call, G, Gc)[0]


def _band_grad_packed_kernel(Km, g1m_ref, g2_ref, dur_ref,
                             qg_ref, sa_ref, st_ref, lg_ref):
    """Log-semiring band sweep for the custom-VJP cotangents, packed and
    VMEM-resident. Emits, in one launch:

      qg[s] = LSE_j dur[j] + G2[s+j+1]     (suffix body; Q = qg - cum)
      sa[s] = sum_j M[s, j]                (span-start posterior mass)
      st[i] = sum_j M[i-j-1, j]            (span-stop posterior mass)
      lg[j] = sum_s M[s, j]                (per-duration posterior mass)

    with M[s, j] = exp(G1[s] - logZ + dur[j] + G2[s+j+1]) the span
    posteriors (g1m has -logZ folded in). As XLA ops this sweep (plus
    the (T, Km, C) band stacks it replaces) was the dominant cost of the
    training step's backward combine."""
    Gc, Tp, L = g1m_ref.shape
    qg_ref[...] = jnp.full(qg_ref.shape, BIG_NEG, jnp.float32)
    sa_ref[...] = jnp.zeros(sa_ref.shape, jnp.float32)
    st_ref[...] = jnp.zeros(st_ref.shape, jnp.float32)
    lg_ref[...] = jnp.zeros(lg_ref.shape, jnp.float32)
    for r in range(Km - 1, -1, -1):
        # g2 rows are boundary-shifted (g2[i] = G2[e=i+1]):
        # body[s, j=r] = dur[r] + G2[s+r+1] reads g2[s + r]
        x = dur_ref[:, r : r + 1, :] + g2_ref[:, r : r + Tp, :]
        qg_ref[...] = jnp.logaddexp(qg_ref[...], x)
        M = jnp.exp(g1m_ref[...] + x)
        sa_ref[...] += M
        lg_ref[:, r : r + 1, :] = jnp.sum(M, axis=1, keepdims=True)
        st_ref[...] += jnp.concatenate(
            [jnp.zeros((Gc, r + 1, L), jnp.float32),
             jax.lax.slice_in_dim(M, 0, Tp - r - 1, axis=1)],
            axis=1,
        )


def _band_grad_packed(G1m, g2, dur_p, Km, interpret):
    """Launch the gradient band sweep over group chunks bounded by VMEM."""
    G, Tp, _ = G1m.shape
    Km_pad = dur_p.shape[1]
    bytes_per_group = _grad_combine_bytes(Tp, Km_pad)
    Gc = max(1, min(G, (_VMEM_PLANE_BUDGET // 4) // max(bytes_per_group, 1)))

    def call(start, end):
        return pl.pallas_call(
            functools.partial(_band_grad_packed_kernel, Km),
            out_shape=[
                jax.ShapeDtypeStruct((end - start, Tp, LANES), jnp.float32),
                jax.ShapeDtypeStruct((end - start, Tp, LANES), jnp.float32),
                jax.ShapeDtypeStruct((end - start, Tp, LANES), jnp.float32),
                jax.ShapeDtypeStruct((end - start, Km_pad, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(G1m[start:end], g2[start:end], dur_p[start:end])

    return _launch_group_chunks(call, G, Gc)


def _unpack_plane(plane, B, T, C, pack):
    """(Gf, Tp, 128) lane-packed plane -> (B, T, C)."""
    Gf = plane.shape[0]
    return (
        plane[:, :T, : pack * C]
        .reshape(Gf, T, pack, C)
        .transpose(0, 2, 1, 3)
        .reshape(Gf * pack, T, C)[:B]
    )


def _lane_table(values, pack, C, fill, dtype):
    """(n*pack,) per-video values -> (n, 1, 128) per-lane table with
    `fill` on dead lanes. The ONE copy of the slot/dead-lane geometry:
    injection start steps, length masks, and scalar broadcasts must all
    agree on it or the packed combines desynchronize."""
    n = values.shape[0] // pack
    slot = jnp.minimum(jnp.arange(LANES) // C, pack - 1)
    lane_dead = jnp.arange(LANES) >= pack * C
    table = jnp.where(
        lane_dead[None, :],
        jnp.asarray(fill, dtype),
        values.astype(dtype).reshape(n, pack)[:, slot],
    )
    return table[:, None, :]


def _pack_lane_values(values, meta, fill=0.0, dtype=jnp.float32):
    """(B,) per-video scalars -> (Gf, 1, 128) per-lane table."""
    B = values.shape[0]
    if meta["Bp0"] > B:
        values = jnp.concatenate(
            [values.astype(dtype), jnp.full((meta["Bp0"] - B,), fill, dtype)],
            axis=0,
        )
    return _lane_table(values, meta["pack"], meta["C"], fill, dtype)


def _scan_packed_fb(pots: HsmmPotentials, lengths_i, semiring, interpret,
                    with_alphas):
    """Full-flip fused dual-direction scan, staying in packed layout.

    Stacks the time-REVERSED model onto the batch axis with its
    emissions flipped over the FULL padded buffer (a batch-uniform flip;
    junk pad frames land before each reversed chain's start and are
    cancelled by the kernel's init - cum injection), packs everything
    into (G, Tp, 128) lane groups — whole groups per direction — and
    runs the gamma-emitting scan kernel once.

    Returns (alphas_p or None, gammas_p, cum_inc, meta): the packed
    boundary/gamma planes, the inclusive emission prefix sums on the
    forward half, and meta carrying the packing geometry and lane
    tables the packed combines need."""
    B, T, C = pots.emit.shape
    pack = _pack_for(C, B)
    Bp0 = _round_up(B, pack)  # whole groups per direction

    def pad_b(x, fill=0.0):
        if Bp0 == B:
            return x
        return jnp.pad(
            x, [(0, Bp0 - B)] + [(0, 0)] * (x.ndim - 1), constant_values=fill
        )

    emit_f = pad_b(pots.emit)
    trans_f = pad_b(pots.trans)
    init_f = pad_b(pots.init, BIG_NEG)
    lens_f = pad_b(pots.lens)
    end_f = pad_b(pots.end_mask, BIG_NEG)
    len_f = jnp.concatenate(
        [lengths_i, jnp.ones((Bp0 - B,), jnp.int32)], axis=0
    )

    cat = HsmmPotentials(
        trans=jnp.concatenate([trans_f, jnp.swapaxes(trans_f, -1, -2)], axis=0),
        init=jnp.concatenate([init_f, end_f], axis=0),
        lens=jnp.concatenate([lens_f, lens_f], axis=0),
        emit=jnp.concatenate([emit_f, jnp.flip(emit_f, axis=1)], axis=0),
        end_mask=jnp.concatenate([end_f, init_f], axis=0),
    )
    starts = jnp.concatenate([jnp.zeros((Bp0,), jnp.int32), T - len_f], axis=0)

    emit_p, init_p, dur_p, trans_bd, G, Tp, Km_pad = _pack_potentials(cat, pack)
    Gf = Bp0 // pack

    # lane tables: start step, per-lane length (0 on dead lanes)
    start_lane = _lane_table(starts, pack, C, -1, jnp.int32)
    len_lane = _lane_table(len_f, pack, C, 0, jnp.int32)

    Tc = min(Tp, _TIME_CHUNK)
    n_out = 2 if with_alphas else 1
    bytes_per_group = Tc * LANES * 4 * (2 + 2 * n_out)
    Gc = _chunk_bounds(G, bytes_per_group)
    out_dtypes = (jnp.float32,) * n_out
    outs = _launch_group_chunks(
        lambda s, e: _launch_scan(
            functools.partial(_gamma_kernel, semiring, with_alphas),
            out_dtypes,
            trans_bd[s:e], init_p[s:e], dur_p[s:e], emit_p[s:e],
            interpret, extra_inputs=(start_lane[s:e],),
        ),
        G,
        Gc,
    )
    alphas_p = outs[0] if with_alphas else None
    gammas_p = outs[-1]
    # inclusive emission prefix sums on the packed forward plane (the
    # combines need them; emit_p itself is not carried further)
    cum_inc = jax.lax.associative_scan(jnp.add, emit_p[:Gf], axis=1)
    meta = dict(
        pack=pack, Bp0=Bp0, Gf=Gf, G=G, Tp=Tp, Km_pad=Km_pad, T=T, C=C,
        init_p=init_p, dur_p=dur_p, len_lane=len_lane,
    )
    return alphas_p, gammas_p, cum_inc, meta


def _packed_G1_g2(gammas_p, cum_inc, meta):
    """Prefix/suffix boundary split (G1, g2) on the packed layout.

    F[t] = gamma[t-1] (init at t=0), masked past length; G1 = F - cum.
    g2[i] = G2[e=i+1] = cum_exc[e] + S2[e] with S2[e] = gammaR[L-e-1] =
    flip(gammaR)[Tp-T+e] (STATIC shift thanks to the full-buffer flip);
    the e = L row carries the end mask; e > L rows are BIG_NEG. Also
    returns cum_exc."""
    Gf, Tp, T = meta["Gf"], meta["Tp"], meta["T"]
    init_p = meta["init_p"]
    len_lane = meta["len_lane"]
    gf = gammas_p[:Gf]  # forward-direction boundary combines
    gr = gammas_p[Gf:]  # reversed-direction boundary combines
    t_col = jnp.arange(Tp)[None, :, None]

    cum_exc = jnp.concatenate(
        [jnp.zeros((Gf, 1, LANES), jnp.float32), cum_inc[:, : Tp - 1, :]], axis=1
    )

    F = jnp.concatenate([init_p[:Gf], gf[:, : Tp - 1, :]], axis=1)
    F = jnp.where(t_col < len_lane, F, BIG_NEG)
    G1 = F - cum_exc

    shift = Tp - T + 1
    flip_gr = jnp.flip(gr, axis=1)
    S2rows = jnp.concatenate(
        [flip_gr[:, shift:, :],
         jnp.full((Gf, shift, LANES), BIG_NEG, jnp.float32)],
        axis=1,
    )
    e_col = t_col + 1
    g2 = cum_inc + S2rows
    g2 = jnp.where(e_col == len_lane, init_p[Gf:] + cum_inc, g2)
    g2 = jnp.where(e_col <= len_lane, g2, BIG_NEG)
    g2 = jnp.pad(
        g2, ((0, 0), (0, meta["Km_pad"] + 1), (0, 0)), constant_values=BIG_NEG
    )
    return G1, g2, cum_exc


def _labels_packed(pots: HsmmPotentials, lengths_i, interpret):
    """Packed-layout max-marginal decode: the whole combine stays in the
    kernels' (G, T, 128) lane-packed layout.

    The scan kernel emits its per-step transition combine (gamma plane)
    directly, so neither alphas unpacking nor the (C, C, T) XLA
    recombination exist; one small unpack of the frame-max plane feeds
    the final argmax. Scores come from the frame-max at t=0 (every
    frame of the best path attains the global best in the max
    semiring)."""
    B, T, C = pots.emit.shape
    Km = pots.lens.shape[1] - 1
    _, gammas_p, cum_inc, meta = _scan_packed_fb(
        pots, lengths_i, "max", interpret, with_alphas=False
    )
    pack, Gf = meta["pack"], meta["Gf"]
    G1, g2, _ = _packed_G1_g2(gammas_p, cum_inc, meta)
    fm = _band_max_packed(G1, g2, meta["dur_p"][:Gf], Km, interpret)

    # labels: unpack the frame-max plane, argmax per video
    fmu = _unpack_plane(fm, B, T, C, pack)
    labels = jnp.argmax(fmu, axis=2).astype(jnp.int32)
    labels = jnp.where(jnp.arange(T)[None, :] < lengths_i[:, None], labels, -1)

    # scores: every frame of the argmax path attains the global best
    group_of = jnp.arange(B) // pack
    lanes = (jnp.arange(B) % pack)[:, None] * C + jnp.arange(C)[None, :]
    scores = jnp.max(
        jnp.take_along_axis(fm[group_of, 0, :], lanes, axis=1), axis=1
    )
    return labels, scores


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsmm_viterbi_labels_pallas(pots: HsmmPotentials, lengths, interpret=False):
    """Traceback-free Viterbi frame labels: (labels (B, T) int32, scores).

    Both max-semiring directions (forward + time-reversed) ride ONE
    fused Pallas launch (the reversed model stacked on the batch axis),
    followed by the VMEM-resident band-combine kernel — no sequential
    per-segment traceback, so decode throughput is independent of
    segment count.

    In the max semiring the "marginal" of span (s, d, c) is the score of
    the best path through it; the argmax path's spans attain the global
    best, so labels[t] = argmax_c (best span score covering t with class
    c) — the semiring-gradient decode.
    """
    B, T, C = pots.emit.shape
    lengths_i = _lengths_i32(lengths)
    if _use_packed_combine(T, pots.lens.shape[1]):
        return _labels_packed(pots, lengths_i, interpret)
    alphas_f, alphas_b, scores = _run_forward_fb(pots, lengths, interpret, "max")
    G1, G2p = jax.vmap(_labels_prep_single)(
        pots.trans, pots.init, pots.lens, pots.emit, pots.end_mask,
        lengths_i, alphas_f, alphas_b,
    )
    Km = pots.lens.shape[1] - 1
    lens_tab = jnp.swapaxes(pots.lens[:, 1:, :], 1, 2)  # (B, C, Km)
    frame_max = _band_max_pallas(G1, G2p, lens_tab, Km, interpret)
    labels = jnp.argmax(frame_max, axis=1).astype(jnp.int32)
    labels = jnp.where(jnp.arange(T)[None, :] < lengths_i[:, None], labels, -1)
    return labels, scores
