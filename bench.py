"""Headline benchmark: semi-Markov Viterbi decode frames/sec/chip.

Measures the full decode step (emission matmul + masked factor
construction + banded max-semiring scan + traceback) on one chip at a
CrossTask-like configuration (C classes ~ steps+backgrounds of one task,
K = 20 duration band, 300-d PCA features), steady-state over several
timed iterations.

``vs_baseline`` compares against a reference-style torch implementation
measured on this host's CPU (the reference repo publishes no numbers —
BASELINE.md — and its CUDA stack, pytorch-struct + genbmm, is not
installable here). The torch baseline mirrors the reference's actual
compute: materialize the b x (N-1) x K x C x C edge-potential tensor
(semimarkov_modules.py:416-523) and run the banded max DP over it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

C = 19          # one CrossTask task: steps + per-step backgrounds
D = 300         # 3 feature groups x 100 PCA dims
K = 20          # --sm_max_span_length default
T = 1024        # frames per video (CrossTask videos are 100s-1000s frames)
B = 16          # videos per decode batch

BASELINE_T = 256  # torch baseline runs a smaller problem (same per-frame work)
BASELINE_B = 2


def build_inputs(rng, b, t):
    feats = rng.randn(b, t, D).astype(np.float32)
    lengths = np.full(b, t, np.int32)
    means = rng.randn(C, D).astype(np.float32)
    cov = np.abs(rng.randn(D).astype(np.float32)) + 0.5
    trans_logits = rng.randn(C, C).astype(np.float32)
    init_logits = rng.randn(C).astype(np.float32)
    log_rates = rng.randn(C).astype(np.float32) * 0.3 + 1.5
    return feats, lengths, means, cov, trans_logits, init_logits, log_rates


def bench_tpu_decode():
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs,
        initial_log_probs,
        poisson_length_log_probs,
        transition_log_probs,
    )
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials, hsmm_viterbi
    from action_segmentation_tpu.ops.hsmm_pallas import (
        hsmm_viterbi_labels_pallas,
        pallas_supported,
    )
    from action_segmentation_tpu.ops.span_codec import spans_to_labels

    use_pallas = pallas_supported(C)

    rng = np.random.RandomState(0)
    feats, lengths, means, cov, trans_logits, init_logits, log_rates = build_inputs(
        rng, B, T
    )

    @jax.jit
    def decode(feats, lengths, means, cov, trans_logits, init_logits, log_rates):
        emit = gaussian_emission_log_probs(feats, means, cov)
        trans = transition_log_probs(trans_logits)
        init = initial_log_probs(init_logits)
        lens = poisson_length_log_probs(log_rates, K)
        b = feats.shape[0]
        pots = HsmmPotentials(
            trans=jnp.broadcast_to(trans, (b, C, C)),
            init=jnp.broadcast_to(init, (b, C)),
            lens=jnp.broadcast_to(lens, (b, K, C)),
            emit=emit,
            end_mask=jnp.zeros((b, C), jnp.float32),
        )
        if use_pallas:
            return hsmm_viterbi_labels_pallas(pots, lengths)
        spans, scores = hsmm_viterbi(pots, lengths)
        return spans_to_labels(spans), scores

    f, lens_, mu, cv, tl, il, lr = [
        jnp.asarray(x)
        for x in (feats, lengths, means, cov, trans_logits, init_logits, log_rates)
    ]

    # The remote-TPU tunnel makes per-call host timing unreliable
    # (dispatch/fetch round-trips dominate, and block_until_ready is not
    # strictly synchronous). So: run the decode N times *inside* one jitted
    # program with a data dependency between iterations, fetch once, and
    # difference two iteration counts to cancel the constant overhead.
    def decode_n(n):
        @jax.jit
        def run(f, lens_, mu, cv, tl, il, lr):
            def body(s_prev, _):
                f_dep = f + (s_prev.sum() * 0.0)
                labels, s = decode(f_dep, lens_, mu, cv, tl, il, lr)
                return s, labels[0, 0]
            s0 = jnp.zeros((f.shape[0],), jnp.float32)
            s, ys = jax.lax.scan(body, s0, None, length=n)
            return s, ys
        return run

    run_small = decode_n(2)
    run_big = decode_n(12)

    def timed(run):
        out = run(f, lens_, mu, cv, tl, il, lr)
        _ = np.asarray(out[0])  # compile + warm
        start = time.perf_counter()
        out = run(f, lens_, mu, cv, tl, il, lr)
        _ = np.asarray(out[0])
        return time.perf_counter() - start

    t_small = timed(run_small)
    t_big = timed(run_big)
    per_iter = max((t_big - t_small) / 10.0, 1e-9)
    return B * T / per_iter


def bench_torch_reference_style():
    """Reference-style decode on torch CPU: materialized edge potentials
    b x (N-1) x K x C x C and a banded max DP (the work torch-struct +
    genbmm perform), timed per frame."""
    import torch

    rng = np.random.RandomState(0)
    feats, lengths, means, cov, trans_logits, init_logits, log_rates = build_inputs(
        rng, BASELINE_B, BASELINE_T
    )
    with torch.no_grad():
        x = torch.from_numpy(feats)
        mu = torch.from_numpy(means)
        var = torch.from_numpy(cov)
        # per-class Gaussian loop like the reference (modules.py:353-362)
        start = time.perf_counter()
        const = -0.5 * (D * np.log(2 * np.pi) + torch.log(var).sum())
        emits = []
        for c in range(C):
            diff = x - mu[c]
            emits.append(const - 0.5 * (diff * diff / var).sum(-1))
        emit = torch.stack(emits, dim=-1)  # (B, T, C)
        trans = torch.log_softmax(torch.from_numpy(trans_logits), dim=0)
        init = torch.log_softmax(torch.from_numpy(init_logits), dim=0)
        d = torch.arange(K, dtype=torch.float32)[:, None]
        lr = torch.from_numpy(log_rates)[None, :]
        lens = d * lr - torch.exp(lr) - torch.lgamma(d + 1.0)

        b, t = BASELINE_B, BASELINE_T
        # edge potentials: scores[b, s, k, c_to, c_from] for span [s, s+k)
        cum = torch.cat([torch.zeros(b, 1, C), emit.cumsum(1)], dim=1)
        scores = trans.view(1, 1, 1, C, C).expand(b, t, K, C, C).clone()
        scores[:, 0] += init.view(1, 1, 1, C)
        scores += lens.view(1, 1, K, 1, C)
        for k in range(1, K):
            seg = cum[:, k:, :] - cum[:, : t + 1 - k, :]  # (b, t+1-k, C)
            scores[:, : t + 1 - k, k] += seg.view(b, -1, 1, C)
        # banded max DP over the materialized tensor, vectorized over the
        # duration band per step (torch-struct-style batched reductions)
        W = torch.full((b, t + 1, C), -1e9)
        W[:, 0] = 0.0
        for n in range(1, t + 1):
            kn = min(K - 1, n)
            ks = torch.arange(1, kn + 1)
            s_idx = n - ks
            window = W[:, s_idx]  # (b, kn, C_from)
            edge = scores[:, s_idx, ks]  # (b, kn, C_to, C_from)
            cand = (window.unsqueeze(2) + edge).amax(dim=3).amax(dim=1)
            W[:, n] = cand
        _ = W[:, t].max()
        elapsed = time.perf_counter() - start
    return b * t / elapsed


def main():
    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tpu_fps = bench_tpu_decode()
    try:
        # median of 3 runs: CPU timing is noisy and the ratio should be
        # conservative and stable
        runs = sorted(bench_torch_reference_style() for _ in range(3))
        ref_fps = runs[1]
    except Exception:
        ref_fps = None
    vs = (tpu_fps / ref_fps) if ref_fps else None
    print(
        json.dumps(
            {
                "metric": "semimarkov_viterbi_decode_throughput",
                "value": round(tpu_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
