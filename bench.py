"""Headline benchmark: semi-Markov decode + training frames/sec/chip.

Two measurements at a CrossTask-like configuration (C classes ~
steps+backgrounds of one task, K = 20 duration band, 300-d PCA
features), steady-state over several timed iterations:

* **decode** (the headline): emission matmul + masked factor
  construction + banded max-semiring scan + label extraction;
* **train**: the FULL unsupervised gradient step — potentials,
  marginal likelihood through the Pallas custom-VJP
  (``hsmm_partition_fb``: fused log-scan forward + time-reversed
  Pallas backward), parameter gradients, and the Adam update — the
  reference's actual hot path (semimarkov.py:253-309).

``vs_baseline`` compares against a reference-style torch implementation
measured on this host's CPU (the reference repo publishes no numbers —
BASELINE.md — and its CUDA stack, pytorch-struct + genbmm, is not
installable here; the ratio is TPU-chip vs host-CPU, not like-for-like
vs a CUDA GPU). The torch baselines mirror the reference's actual
compute: materialize the b x (N-1) x K x C x C edge-potential tensor
(semimarkov_modules.py:416-523) and run the banded DP over it — max
semiring for decode, log semiring + autograd backward + Adam for train.

Prints one JSON line per metric; the LAST line is the headline
{"metric", "value", "unit", "vs_baseline", ...extras} (extras include
the train numbers and the FLOP accounting — see docs/DESIGN.md "MFU").
"""

import json
import os
import time

import numpy as np

C = 19          # one CrossTask task: steps + per-step backgrounds
D = 300         # 3 feature groups x 100 PCA dims
K = 20          # --sm_max_span_length default
T = 1024        # frames per video (CrossTask videos are 100s-1000s frames)
B = 18          # videos per batch: a multiple of the lane pack (6
                # videos of C=19 classes share each 128-lane group), so
                # every lane block is occupied — the serving batch shape

BASELINE_T = 256  # torch baseline runs a smaller problem (same per-frame work)
BASELINE_B = 2

N_SMALL = 2    # iteration counts for the scan-chained timing pairs
N_BIG = 22
REPEATS = 5    # timed repeats; min cancels tunnel-latency noise


def measure_pair(run_small, run_big, fetch, *args):
    """frames-normalized seconds per iteration from a (small, big)
    iteration-count pair.

    Each timed sample is one dispatch+fetch of a scan-chained program;
    the remote-TPU tunnel adds large, positive, variable latency to
    every sample, so we take the MIN over REPEATS (the least-noise
    sample) before differencing the two iteration counts."""
    for run in (run_small, run_big):
        fetch(run(*args))  # compile + warm

    def best(run):
        times = []
        for _ in range(REPEATS):
            start = time.perf_counter()
            fetch(run(*args))
            times.append(time.perf_counter() - start)
        return min(times)

    t_small = best(run_small)
    t_big = best(run_big)
    if t_big <= t_small:
        # tunnel noise inverted the pair; fall back to the big run's
        # absolute time (a conservative overestimate of per-iteration
        # cost, since it still contains one dispatch/fetch round trip)
        # rather than publishing an absurd differenced number
        import sys

        print(
            "bench: WARNING timing pair inverted (t_small={:.4f}s, "
            "t_big={:.4f}s); reporting conservative absolute timing".format(
                t_small, t_big
            ),
            file=sys.stderr,
        )
        return t_big / N_BIG
    return (t_big - t_small) / (N_BIG - N_SMALL)


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

    run_small = decode_n(N_SMALL)
    run_big = decode_n(N_BIG)
    per_iter = measure_pair(
        run_small, run_big, lambda out: np.asarray(out[0]),
        f, lens_, mu, cv, tl, il, lr,
    )
    return B * T / per_iter


def bench_tpu_train():
    """Full unsupervised gradient step: potentials -> partition through
    the Pallas custom-VJP (hsmm_partition_fb) -> grads -> clipped Adam.

    The scan carries (params, opt_state) so iterations have a real data
    dependency (the same discipline as decode_n)."""
    import jax
    import jax.numpy as jnp
    import optax

    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs,
        initial_log_probs,
        poisson_length_log_probs,
        transition_log_probs,
    )
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials, hsmm_partition
    from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fb
    from action_segmentation_tpu.ops.hsmm_pallas import pallas_supported

    use_pallas = pallas_supported(C)

    rng = np.random.RandomState(0)
    feats, lengths, means, cov, trans_logits, init_logits, log_rates = build_inputs(
        rng, B, T
    )
    params = {
        "means": jnp.asarray(means),
        "log_var": jnp.log(jnp.asarray(cov)),
        "trans_logits": jnp.asarray(trans_logits),
        "init_logits": jnp.asarray(init_logits),
        "log_rates": jnp.asarray(log_rates),
    }
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(5e-3))
    opt_state = tx.init(params)
    f = jnp.asarray(feats)
    lens_ = jnp.asarray(lengths)

    def loss_fn(params, feats, lengths):
        emit = gaussian_emission_log_probs(
            feats, params["means"], jnp.exp(params["log_var"])
        )
        trans = transition_log_probs(params["trans_logits"])
        init = initial_log_probs(params["init_logits"])
        lens = poisson_length_log_probs(params["log_rates"], K)
        b = feats.shape[0]
        trans_b = jnp.broadcast_to(trans, (b, C, C))
        init_b = jnp.broadcast_to(init, (b, C))
        lens_b = jnp.broadcast_to(lens, (b, K, C))
        end_mask = jnp.zeros((b, C), jnp.float32)
        if use_pallas:
            ll = hsmm_partition_fb(trans_b, init_b, lens_b, emit, end_mask, lengths)
        else:
            ll = hsmm_partition(
                HsmmPotentials(trans_b, init_b, lens_b, emit, end_mask), lengths
            )
        return -ll.mean()

    def train_n(n):
        @jax.jit
        def run(params, opt_state, feats, lengths):
            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, feats, lengths)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return losses
        return run

    run_small = train_n(N_SMALL)
    run_big = train_n(N_BIG)

    def fetch(out):
        losses = np.asarray(out)
        assert np.all(np.isfinite(losses)), losses
        return losses

    per_iter = measure_pair(run_small, run_big, fetch, params, opt_state, f, lens_)
    return B * T / per_iter


def make_realistic_workload(epochs=6):
    """(args, train, total_frames): THE realistic-epoch workload.

    Shared by bench_epoch_realistic and scripts/epoch_decompose.py so
    the phase decomposition always measures the same corpus/batching the
    headline metric reports (they had already drifted on epoch count
    before this was extracted — round-5 review)."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--annotate_background_with_previous", action="store_true")
    parser.add_argument("--no_merge_classes", action="store_true")
    args = parser.parse_args([])
    args.sm_max_span_length = K
    args.epochs = epochs
    args.lr = 1e-2

    # 44 videos -> batches of 16/16/12 (partial final batch); C=19 on
    # the 128-lane pack of 6 -> groups of 6/6/4 per batch (partial lane
    # groups); lengths 400..1024 span buckets 472/616/808/1056
    train = SyntheticDatasplit(
        num_videos=44, n_classes=C, max_len=T, min_len=400, span_k=K,
        feature_dim=D, shift=1.5, seed=0,
    )
    total_frames = sum(len(s["gt_single"]) for s in train._samples.values())
    return args, train, total_frames


def bench_epoch_realistic():
    """Mixed-length, bucket-distributed epoch through the REAL model
    path (round-2 verdict item 4: the headline B=18/T=1024 point is the
    best case — every lane group full, one shape). This stage runs
    SemiMarkovModel.fit/predict on a CrossTask-like synthetic corpus:
    lengths 400..1024 across four geometric buckets, a partial final
    batch, partial lane groups (16 videos over pack=6), per-epoch
    decode — so the number includes bucketing recompedule reuse, host
    batching, transfers, and the deferred-drain host loop.

    Returns {"epoch_vids_per_sec", "epoch_frames_per_sec",
    "decode_mixed_frames_per_sec"} from WARM epochs (min over the
    post-compile epochs / second predict call).
    """
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    # epoch 0 pays every bucket compile + the flush compile; the warm
    # window (epochs 1..N-1 + the fit-end flush round trip) amortizes
    # the single ~0.5 s flush fetch over 5 epochs
    args, train, total_frames = make_realistic_workload(epochs=6)
    model = SemiMarkovModel.from_args(args, train)
    t_epoch0 = [None]

    def cb(epoch, stats):
        if epoch == 0:
            t_epoch0[0] = time.perf_counter()

    # HONEST warm-epoch timing under the round-4 asynchronous host loop:
    # fit no longer synchronizes per epoch (the plateau scheduler steps
    # on device and stats queue as device scalars), so a per-callback
    # epoch timer would measure dispatch enqueue time, not completed
    # work. Instead time from the end of epoch 0 (which pays every
    # bucket compile) to the RETURN of fit — whose final flush_deferred
    # fetches every queued per-batch loss, forcing all dispatched train
    # steps to completion — and charge the warm epochs with that whole
    # window. One param leaf is fetched afterwards as a belt-and-braces
    # full-sync point inside the window.
    t_fit0 = time.perf_counter()
    model.fit(train, use_labels=False, callback_fn=cb)
    np.asarray(next(iter(model.module.params.values())))
    t_fit1 = time.perf_counter()
    warm_epoch = (t_fit1 - t_epoch0[0]) / (args.epochs - 1)
    compile_epoch0 = t_epoch0[0] - t_fit0

    model.predict(train)  # compile decode shapes
    t0 = time.perf_counter()
    model.predict(train)
    decode_dt = time.perf_counter() - t0

    return {
        "epoch_vids_per_sec": round(len(train) / warm_epoch, 1),
        "epoch_frames_per_sec": round(total_frames / warm_epoch, 1),
        "decode_mixed_frames_per_sec": round(total_frames / decode_dt, 1),
        "epoch_frames": total_frames,
        # on this environment's remote-TPU tunnel every dispatch->fetch
        # round trip costs ~0.5 s, so the small-corpus realistic numbers
        # are tunnel-latency-bound, not compute-bound (the headline
        # metrics difference that latency away; a co-located chip's
        # epoch wall-clock is dominated by the ~70 us/batch device time)
        "realistic_note": "wall-clock incl. host loop + remote-tunnel "
        "round trips; see CLAUDE.md round-trip rule",
    }


def bench_torch_train_reference_style():
    """Reference-style training step on torch CPU: materialized edge
    potentials, banded log-semiring DP to the partition, autograd
    backward, clipped Adam — the reference's hot loop
    (semimarkov.py:253-309), timed per frame."""
    import torch

    rng = np.random.RandomState(0)
    feats, lengths, means, cov, trans_logits, init_logits, log_rates = build_inputs(
        rng, BASELINE_B, BASELINE_T
    )
    x = torch.from_numpy(feats)
    p_means = torch.tensor(means, requires_grad=True)
    p_logvar = torch.tensor(np.log(cov), requires_grad=True)
    p_trans = torch.tensor(trans_logits, requires_grad=True)
    p_init = torch.tensor(init_logits, requires_grad=True)
    p_rates = torch.tensor(log_rates, requires_grad=True)
    plist = [p_means, p_logvar, p_trans, p_init, p_rates]
    opt = torch.optim.Adam(plist, lr=5e-3)

    b, t = BASELINE_B, BASELINE_T

    def step():
        var = torch.exp(p_logvar)
        const = -0.5 * (D * np.log(2 * np.pi) + torch.log(var).sum())
        emits = []
        for c in range(C):
            diff = x - p_means[c]
            emits.append(const - 0.5 * (diff * diff / var).sum(-1))
        emit = torch.stack(emits, dim=-1)  # (B, T, C)
        trans = torch.log_softmax(p_trans, dim=0)
        init = torch.log_softmax(p_init, dim=0)
        d = torch.arange(K, dtype=torch.float32)[:, None]
        lens = d * p_rates[None, :] - torch.exp(p_rates)[None, :] - torch.lgamma(d + 1.0)

        cum = torch.cat([torch.zeros(b, 1, C), emit.cumsum(1)], dim=1)
        scores = trans.view(1, 1, 1, C, C).expand(b, t, K, C, C).clone()
        scores[:, 0] += init.view(1, 1, 1, C)
        scores = scores + lens.view(1, 1, K, 1, C)
        for k in range(1, K):
            seg = cum[:, k:, :] - cum[:, : t + 1 - k, :]
            scores[:, : t + 1 - k, k] = scores[:, : t + 1 - k, k] + seg.view(b, -1, 1, C)
        # banded log-semiring DP (functional: autograd-friendly)
        ws = [torch.zeros(b, C)]
        for n in range(1, t + 1):
            kn = min(K - 1, n)
            ks = torch.arange(1, kn + 1)
            s_idx = n - ks
            window = torch.stack([ws[int(s)] for s in s_idx], dim=1)  # (b, kn, C_from)
            edge = scores[:, s_idx, ks]  # (b, kn, C_to, C_from)
            cand = torch.logsumexp(
                torch.logsumexp(window.unsqueeze(2) + edge, dim=3), dim=1
            )
            ws.append(cand)
        logZ = torch.logsumexp(ws[t], dim=-1)
        loss = -logZ.mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(plist, 10.0)
        opt.step()

    step()  # warm (allocator, threads)
    start = time.perf_counter()
    step()
    elapsed = time.perf_counter() - start
    return b * t / elapsed


def flop_accounting():
    """Analytic useful-FLOP counts per benchmark iteration, split by
    execution unit (MXU matmuls vs VPU elementwise semiring work).
    Formulas mirror the kernel shapes in ops/hsmm_pallas.py; see
    docs/DESIGN.md "MFU and roofline" for the derivation and the
    peak-comparison discussion."""
    from action_segmentation_tpu.ops.hsmm_pallas import LANES, MAX_PACK

    pack = max(1, min(MAX_PACK, LANES // C, B))
    G = -(-B // pack)
    Km = K - 1
    Km_pad = -(-max(Km, 1) // 8) * 8

    emission_mm = 2 * B * T * D * C  # (B*T, D) x (D, C) on the MXU
    # per time step per packed group: span add+reduce over the duration
    # band (Km_pad x 128) and transition combine+reduce (128 x 128)
    dp_max_step = 2 * Km_pad * LANES + 2 * LANES * LANES
    dp_log_step = 5 * Km_pad * LANES + 5 * LANES * LANES  # + exp/log passes
    dp_max_scan = G * T * dp_max_step
    dp_log_scan = G * T * dp_log_step
    # decode label combine (_max_labels_single): Km span-score passes +
    # duration suffix-max (cummax) + Km shifted maxes — O(T*Km) form
    label_combine = B * T * C * 6 * Km
    # train cotangent combine (_combine_grads_single): Km-banded stacks,
    # exp of span marginals, pair marginals over C^2
    grad_combine = B * T * (8 * Km * C + 3 * C * C)

    decode_flops = emission_mm + 2 * dp_max_scan + label_combine
    train_flops = 3 * emission_mm + 2 * dp_log_scan + grad_combine
    return {
        "decode_flops_per_iter": decode_flops,
        "train_flops_per_iter": train_flops,
        "decode_mxu_flops_per_iter": emission_mm,
        "train_mxu_flops_per_iter": 3 * emission_mm,
    }


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


def _init_backend_with_watchdog(timeout_s, probe_fn=None, slice_s=60.0):
    """Initialize the JAX backend, failing loudly if the TPU claim
    wedges. The axon plugin's device claim can block indefinitely when
    a previous holder died without releasing its grant (observed: a
    SIGTERM'd process left `jax.devices()` hanging >1 h for every
    subsequent process); a silent infinite hang here would eat the
    whole bench window with no diagnostic, so the probe runs in a
    daemon thread and a timeout raises with the explanation instead.

    A probe that DIES (the fast `UNAVAILABLE: TPU backend setup/compile
    error` infra state, observed 2026-08-18) raises immediately with the
    probe's own error instead of mislabeling it a wedge and burning the
    budget — the same distinction scripts/tpu_claim_wait.py draws.

    ``probe_fn``/``slice_s`` exist for the simulated-wedge unit test
    (tests/test_bench_watchdog.py): the default probe is the real
    ``jax.devices()`` claim.
    """
    import sys
    import threading

    out = {}

    def probe():
        try:
            if probe_fn is not None:
                out["kind"] = probe_fn()
            else:
                import jax

                out["kind"] = jax.devices()[0].device_kind
        except BaseException as exc:  # report, never swallow
            out["err"] = exc

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    # join in slices: if a wedged grant frees mid-wait (they time out
    # remotely after ~1-2 h), the blocked jax.devices() returns and the
    # bench proceeds — so within the budget, waiting IS the retry.
    # Healthy init takes ~20-40 s and never sees a slice boundary.
    waited = 0.0
    while waited < timeout_s and "kind" not in out:
        step = min(slice_s, timeout_s - waited)
        th.join(step)
        if not th.is_alive():
            break  # probe finished (result or error); stop waiting
        waited += step
        if "kind" not in out and waited % 300 < slice_s:
            print(
                "bench: TPU backend init still blocked after {:.0f}s "
                "(axon claim wedge?) — waiting up to {:.0f}s".format(
                    waited, timeout_s
                ),
                file=sys.stderr,
            )
    if "err" in out:
        raise RuntimeError(
            "TPU backend init FAILED fast (infra error, not a wedge): "
            "{}".format(out["err"])
        )
    if "kind" not in out:
        raise RuntimeError(
            "TPU backend init did not complete within {}s — the chip's "
            "grant is likely held by a dead client (axon claim wedge); "
            "retry after the remote grant times out".format(timeout_s)
        )
    return out["kind"]


def _backend_timeout_s():
    """The backend-init wait budget, from the env contract:

    * ``BENCH_BACKEND_TIMEOUT_S`` (default 3600): how long to wait out a
      wedged grant before failing loudly.
    * ``BENCH_BUDGET_S`` (optional, driver-provided): total wall-clock
      the caller is willing to spend on this bench run. When set, the
      backend wait is capped at ``BENCH_BUDGET_S - 240`` (leaving margin
      for the measurement itself on a warm cache) so a wedge produces a
      diagnostic artifact within the caller's window instead of
      consuming it entirely.
    """
    timeout = float(os.environ.get("BENCH_BACKEND_TIMEOUT_S", "3600"))
    budget = os.environ.get("BENCH_BUDGET_S")
    if budget:
        timeout = min(timeout, max(60.0, float(budget) - 240.0))
    return timeout


def _print_heartbeat(timeout_s):
    """One early JSON status line on stdout, BEFORE touching the TPU.

    If the run later wedges and the caller kills it, the log tail still
    carries the wait policy and a pointer to the last preserved
    measurement — a diagnostic artifact in minutes, not silence for the
    whole budget. The driver parses only the LAST stdout line, so an
    early extra line is invisible to the metric."""
    hb = {
        "metric": "bench_heartbeat",
        "value": None,
        "unit": "status",
        "phase": "backend_init",
        "backend_timeout_s": timeout_s,
        "wait_policy": "wait out a wedged grant in 60s slices; fail "
        "loudly with an explanatory JSON line after the timeout "
        "(CLAUDE.md environment quirks)",
    }
    try:
        import glob

        docs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs")
        # newest preserved builder run wins (bench_r4_builder.json, r5, ...)
        path = sorted(glob.glob(os.path.join(docs, "bench_r*_builder.json")))[-1]
        with open(path) as f:
            prev = json.load(f)
        hb["last_preserved_run"] = {
            "decode_frames_per_sec": prev["headline"]["value"],
            "train_frames_per_sec": prev["train"]["value"],
            "epoch_frames_per_sec": prev["headline"].get("epoch_frames_per_sec"),
            "source": "docs/" + os.path.basename(path),
        }
    except Exception:
        pass
    print(json.dumps(hb), flush=True)


def main():
    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    timeout_s = _backend_timeout_s()
    _print_heartbeat(timeout_s)
    try:
        device_kind = _init_backend_with_watchdog(timeout_s)
    except RuntimeError as exc:
        # leave an explanatory artifact (a parseable last line) instead
        # of a bare traceback, then still fail the run: an environment
        # wedge is not a zero-throughput measurement
        import sys

        print(json.dumps({
            "metric": "semimarkov_viterbi_decode_throughput",
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": str(exc),
        }))
        sys.exit(2)
    import jax
    tpu_fps = bench_tpu_decode()
    train_fps = bench_tpu_train()
    try:
        realistic = bench_epoch_realistic()
    except Exception as exc:  # never let the extra stage kill the headline
        import sys

        print("bench: WARNING realistic stage failed: {}".format(exc),
              file=sys.stderr)
        realistic = {}

    def median3(fn):
        try:
            # CPU timing is noisy and the ratio should be conservative
            return sorted(fn() for _ in range(3))[1]
        except Exception:
            return None

    ref_fps = median3(bench_torch_reference_style)
    ref_train_fps = median3(bench_torch_train_reference_style)
    vs = (tpu_fps / ref_fps) if ref_fps else None
    vs_train = (train_fps / ref_train_fps) if ref_train_fps else None

    flops = flop_accounting()
    frames = B * T
    decode_gflops = flops["decode_flops_per_iter"] * tpu_fps / frames / 1e9
    train_gflops = flops["train_flops_per_iter"] * train_fps / frames / 1e9

    print(
        json.dumps(
            {
                "metric": "semimarkov_train_step_throughput",
                "value": round(train_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs_train, 2) if vs_train else None,
                "achieved_gflops": round(train_gflops, 1),
                "path": "pallas_custom_vjp(hsmm_partition_fb)+adam",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "semimarkov_viterbi_decode_throughput",
                "value": round(tpu_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 2) if vs else None,
                "train_frames_per_sec": round(train_fps, 1),
                "train_vs_baseline": round(vs_train, 2) if vs_train else None,
                "achieved_gflops_decode": round(decode_gflops, 1),
                "achieved_gflops_train": round(train_gflops, 1),
                **realistic,
                "device_kind": device_kind,
                "mfu_note": "VPU-bound banded DP; see docs/DESIGN.md#mfu",
                "timing_note": "min over 5 repeats of scan-chained pairs; "
                "round-1 used single-sample differencing whose tunnel "
                "noise swung results ~2x (6.9M-18.9M observed)",
            }
        )
    )


if __name__ == "__main__":
    main()
