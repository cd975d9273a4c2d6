"""Two-step blocked recurrence probe (round-2 verdict item 5).

DESIGN.md §7 argues the packed forward scan sits at the VPU
instruction-issue roofline (~300 cycles/group-step) for the one-step
serial chain. The one untried lever: fuse TWO time steps per dependent
iteration. Algebra: with W the Km-row history window at boundary t,

  alpha_t   = R_j(W[j] + dur[j]) + cum_t                (Km-reduce)
  hist2     = R_j(W[j] + dur[j+1]) + cum_{t+1}          (Km-reduce, INDEPENDENT of alpha_t)
  u=gamma_t = R_c'(trans + alpha_t)                     (lane reduce)
  alpha_t+1 = R( u + dur_1 + e_{t+1}, hist2 )           (pairwise)
  gamma_t+1 = R_c'(trans + alpha_t+1)                   (lane reduce)
  W <- shift-by-2 with rows (gamma_t+1 - cum_{t+1}, gamma_t - cum_t)

Per two steps this removes one W-shift + one cum update from the
instruction stream and moves one Km-reduce off the critical path
(hist2 computes from W in parallel with alpha_t), at the cost of one
extra pairwise combine. If the kernel has latency slack the chain
halves; if it is purely issue-bound the instruction-count delta decides.

The probe verifies the two-step kernel bit-matches (tolerance) the
production one-step kernel on packed bench-shape inputs, then times
both (scan-chained iteration pairs, min over repeats — bench.py
discipline) in both semirings.

Run: python scripts/twostep_probe.py   (real TPU; ~2-4 min compile)
Result goes to docs/DESIGN.md §7 (accept or record the rejection).
"""

import functools
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import B, C, D, K, T, N_BIG, N_SMALL, build_inputs, measure_pair


def main():
    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from action_segmentation_tpu.ops import hsmm_pallas as hp
    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs,
        initial_log_probs,
        poisson_length_log_probs,
        transition_log_probs,
    )
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials

    BIG_NEG = hp.BIG_NEG
    LANES = hp.LANES

    def _forward2_kernel(semiring, trans_ref, init_ref, dur_ref,
                         emit_ref, alphas_ref, W, cum):
        """Two-step blocked variant of hp._forward_kernel."""
        G, Tc, _ = emit_ref.shape
        Km = W.shape[1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            cum[...] = jnp.zeros_like(cum)
            W[...] = jnp.full_like(W, BIG_NEG)
            W[:, 0:1, :] = init_ref[...]

        dur = dur_ref[...]
        dur1 = dur_ref[:, 0:1, :]
        trans = trans_ref[...]
        reduce_ = hp._semiring_reduce(semiring)
        if semiring == "log":
            def pair(a, b):
                m = jnp.maximum(a, b)
                return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
        else:
            pair = jnp.maximum

        def step2(i, _):
            t0 = 2 * i
            e0 = emit_ref[:, pl.ds(t0, 1), :]
            e1 = emit_ref[:, pl.ds(t0 + 1, 1), :]
            c0 = cum[:, 0:1, :] + e0
            c1 = c0 + e1
            w = W[...]
            alpha0 = reduce_(w + dur, 1) + c0
            hist2 = reduce_(w[:, : Km - 1, :] + dur[:, 1:Km, :], 1) + c1
            u = reduce_(trans + alpha0, 2).reshape(G, 1, LANES)
            alpha1 = pair(u + dur1 + e1, hist2)
            v = reduce_(trans + alpha1, 2).reshape(G, 1, LANES)
            alphas_ref[:, pl.ds(t0, 1), :] = alpha0
            alphas_ref[:, pl.ds(t0 + 1, 1), :] = alpha1
            W[:, 2:Km, :] = w[:, : Km - 2, :]
            W[:, 1:2, :] = u - c0
            W[:, 0:1, :] = v - c1
            cum[:, 0:1, :] = c1
            return 0

        U = max(1, hp._UNROLL // 2)
        half = Tc // 2
        if U > 1 and half % U == 0:
            def stepu(j, _):
                for uu in range(U):
                    step2(j * U + uu, 0)
                return 0

            jax.lax.fori_loop(0, half // U, stepu, 0)
        else:
            jax.lax.fori_loop(0, half, step2, 0)

    def launch2(semiring, trans_bd, init, dur, emit, interpret):
        return hp._launch_scan(
            functools.partial(_forward2_kernel, semiring), (jnp.float32,),
            trans_bd, init, dur, emit, interpret,
        )

    # ---- inputs at the bench shape ----
    rng = np.random.RandomState(0)
    feats, lengths, means, cov, tl, il, lr = build_inputs(rng, B, T)
    emit = gaussian_emission_log_probs(
        jnp.asarray(feats), jnp.asarray(means), jnp.asarray(cov)
    )
    trans = transition_log_probs(jnp.asarray(tl))
    init = initial_log_probs(jnp.asarray(il))
    lens = poisson_length_log_probs(jnp.asarray(lr), K)
    pots = HsmmPotentials(
        trans=jnp.broadcast_to(trans, (B, C, C)),
        init=jnp.broadcast_to(init, (B, C)),
        lens=jnp.broadcast_to(lens, (B, K, C)),
        emit=emit,
        end_mask=jnp.zeros((B, C), jnp.float32),
    )
    pack = max(1, min(hp.MAX_PACK, hp.LANES // C, B))
    packed = hp._pack_potentials(pots, pack)
    emit_p, init_p, dur_p, trans_bd, G, Tp, Km_pad = packed

    for semiring in ("log", "max"):
        one = hp._launch_forward(semiring, trans_bd, init_p, dur_p, emit_p, False)[0]
        two = launch2(semiring, trans_bd, init_p, dur_p, emit_p, False)[0]
        a1 = np.asarray(one)[:, :, : pack * C]
        a2 = np.asarray(two)[:, :, : pack * C]
        err = np.max(np.abs(a1 - a2) / (np.abs(a1) + 1.0))
        print(f"{semiring}: max rel err two-step vs one-step = {err:.2e}")
        assert err < 1e-5, "two-step kernel diverges from production kernel"

        # chained timing, bench.py discipline
        def chain(launcher, n):
            @jax.jit
            def run(emit_in):
                def body(carry, _):
                    out = launcher(
                        semiring, trans_bd, init_p, dur_p,
                        emit_in + carry.sum() * 0.0, False,
                    )[0]
                    return out[:, -1, :] * 0.0, out[0, -1, 0]

                _, ys = jax.lax.scan(
                    body, jnp.zeros((G, LANES), jnp.float32), None, length=n
                )
                return ys

            return run

        for name, launcher in (("one-step", hp._launch_forward), ("two-step", launch2)):
            per_iter = measure_pair(
                chain(launcher, N_SMALL), chain(launcher, N_BIG),
                lambda out: np.asarray(out), emit_p,
            )
            print(
                f"{semiring} {name}: {per_iter * 1e3:.3f} ms/scan "
                f"({B * T / per_iter / 1e6:.1f}M frames/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
