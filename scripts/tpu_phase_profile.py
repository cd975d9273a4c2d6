"""Phase-level timing of the decode/train pipelines on the real TPU.

Times each stage of the benchmark workload (bench.py shape) with the
same scan-chained discipline bench.py uses, so the per-phase costs in
docs/DESIGN.md §7 stay measured rather than inferred:

  potentials   emission matmul + masked factor construction
  dual_max     fused dual-direction max scan (pack + kernel + unpack)
  decode       full decode (potentials + dual scan + label combine)
  dual_log     fused dual-direction log scan
  train        full unsupervised grad step (custom VJP + Adam)

Usage: python scripts/tpu_phase_profile.py  (holds the TPU; run alone)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

C, D, K, T, B = 19, 300, 20, 1024, 18
N_SMALL, N_BIG, REPEATS = 2, 22, 5


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs,
        initial_log_probs,
        poisson_length_log_probs,
        transition_log_probs,
    )
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials
    from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fb
    from action_segmentation_tpu.ops.hsmm_pallas import (
        _run_forward_fb,
        hsmm_viterbi_labels_pallas,
    )
    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lengths = jnp.asarray(np.full(B, T, np.int32))
    params = {
        "means": jnp.asarray(rng.randn(C, D).astype(np.float32)),
        "log_var": jnp.asarray(np.log(np.abs(rng.randn(D)).astype(np.float32) + 0.5)),
        "trans_logits": jnp.asarray(rng.randn(C, C).astype(np.float32)),
        "init_logits": jnp.asarray(rng.randn(C).astype(np.float32)),
        "log_rates": jnp.asarray((rng.randn(C) * 0.3 + 1.5).astype(np.float32)),
    }

    def potentials(params, feats):
        emit = gaussian_emission_log_probs(
            feats, params["means"], jnp.exp(params["log_var"])
        )
        trans = transition_log_probs(params["trans_logits"])
        init = initial_log_probs(params["init_logits"])
        lens = poisson_length_log_probs(params["log_rates"], K)
        b = feats.shape[0]
        return HsmmPotentials(
            trans=jnp.broadcast_to(trans, (b, C, C)),
            init=jnp.broadcast_to(init, (b, C)),
            lens=jnp.broadcast_to(lens, (b, K, C)),
            emit=emit,
            end_mask=jnp.zeros((b, C), jnp.float32),
        )

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(5e-3))
    opt_state = tx.init(params)

    def phase_potentials(feats):
        pots = potentials(params, feats)
        return pots.emit.sum() + pots.trans.sum()

    def phase_dual_max(feats):
        pots = potentials(params, feats)
        af, ab, s = _run_forward_fb(pots, lengths, False, "max")
        return s.sum() + af[:, -1].sum() + ab[:, -1].sum()

    def phase_decode(feats):
        pots = potentials(params, feats)
        labels, s = hsmm_viterbi_labels_pallas(pots, lengths)
        return s.sum() + labels[:, 0].sum().astype(jnp.float32)

    def phase_dual_log(feats):
        pots = potentials(params, feats)
        af, ab, s = _run_forward_fb(pots, lengths, False, "log")
        return s.sum() + af[:, -1].sum() + ab[:, -1].sum()

    def loss_fn(params, feats):
        pots = potentials(params, feats)
        return -hsmm_partition_fb(
            pots.trans, pots.init, pots.lens, pots.emit, pots.end_mask, lengths
        ).mean()

    def chained(fn, n):
        @jax.jit
        def run(feats):
            def body(s, _):
                out = fn(feats + s * 0.0)
                return out * 0.0 + out, out
            s, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return s
        return run

    def train_chained(n):
        @jax.jit
        def run(params, opt_state, feats):
            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, feats)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss
            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return losses[-1]
        return run

    def measure(run_small, run_big, *args):
        for run in (run_small, run_big):
            np.asarray(run(*args))
        def best(run):
            ts = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                np.asarray(run(*args))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        ts, tb = best(run_small), best(run_big)
        if tb <= ts:
            return tb / N_BIG
        return (tb - ts) / (N_BIG - N_SMALL)

    phases = [
        ("potentials", phase_potentials),
        ("dual_max", phase_dual_max),
        ("decode", phase_decode),
        ("dual_log", phase_dual_log),
    ]
    for name, fn in phases:
        per = measure(chained(fn, N_SMALL), chained(fn, N_BIG), feats)
        print(f"{name:12s} {per*1e3:7.3f} ms/iter   {B*T/per/1e6:6.2f} Mframes/s")
    per = measure(
        train_chained(N_SMALL), train_chained(N_BIG), params, opt_state, feats
    )
    print(f"{'train':12s} {per*1e3:7.3f} ms/iter   {B*T/per/1e6:6.2f} Mframes/s")


if __name__ == "__main__":
    main()
