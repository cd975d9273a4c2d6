"""Measure serving decode throughput vs batch size B (round-3 verdict
weak-item 6 / next-round item 8).

docs/DESIGN.md §7 claims the packed group-step cost is flat in B, so
serving should batch decode. This script turns the claim into numbers on
the real chip, at the bench configuration (C=19, D=300, K=20, T=1024):

* device_fps — the model's REAL decode step (the same jitted function
  api.Segmenter uses), timed with the scan-chained iteration-pair
  methodology (bench.py measure_pair) that cancels tunnel round trips;
* e2e_fps — api.Segmenter.segment_many end-to-end wall clock (numpy in,
  labels out, including the single result fetch), min over repeats.

Usage: python scripts/serving_batch_scan.py [--json OUT]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    p.add_argument("--batches", type=int, nargs="*", default=[1, 6, 12, 18, 36])
    cli = p.parse_args(argv)

    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import (
        C, D, K, T, N_SMALL, N_BIG, measure_pair,
        _backend_timeout_s, _init_backend_with_watchdog,
    )

    # same wedge protection as bench.py: a dead-client axon grant would
    # otherwise hang the first backend use silently and consume the
    # whole window with zero diagnostics (round-4 postmortem)
    kind = _init_backend_with_watchdog(_backend_timeout_s())
    print("serving_batch_scan: backend up ({})".format(kind), flush=True)
    from action_segmentation_tpu.api import Segmenter
    from action_segmentation_tpu.models.semimarkov import (
        GaussianHsmm,
        SemiMarkovModel,
    )

    class _Args:
        sm_max_span_length = K
        sm_hidden_markov = False
        sm_feature_projection = False
        sm_init_non_projection_parameters_from = None
        sm_train_discriminatively = False
        sm_constrain_with_narration = "none"

    rng = np.random.RandomState(0)
    module = GaussianHsmm(_Args(), C, D, allow_self_transitions=True, seed=0)
    module.params["gaussian_means"] = jnp.asarray(
        rng.randn(C, D).astype(np.float32) * 0.5
    )
    model = SemiMarkovModel(_Args(), C, D, module)
    seg = Segmenter(model)
    decode = model._get_jitted("decode", model._build_decode_step)

    vc = jnp.arange(C, dtype=jnp.int32)
    rows = []
    for B in cli.batches:
        feats = rng.randn(B, T, D).astype(np.float32)
        lengths = np.full(B, T, np.int32)
        cons = np.zeros((B, T, C), np.float32)
        endm = np.zeros((B, C), np.float32)
        f, lens_, cns, em = (
            jnp.asarray(feats), jnp.asarray(lengths),
            jnp.asarray(cons), jnp.asarray(endm),
        )
        key = jax.random.PRNGKey(0)

        def decode_n(n):
            @jax.jit
            def run(params, f, lens_, cns, em):
                def body(s_prev, _):
                    f_dep = f + (s_prev.sum() * 0.0)
                    labels, scores = decode(
                        params, f_dep, lens_, vc, cns, em, key
                    )
                    return scores, labels[0, 0]

                s0 = jnp.zeros((f.shape[0],), jnp.float32)
                s, ys = jax.lax.scan(body, s0, None, length=n)
                return s, ys

            return run

        per_iter = measure_pair(
            decode_n(N_SMALL), decode_n(N_BIG),
            lambda out: np.asarray(out[0]),
            model.module.params, f, lens_, cns, em,
        )
        device_fps = B * T / per_iter

        # end-to-end serving wall: list of numpy arrays in, labels out.
        # Two call shapes: (a) ONE batch per call — the per-call
        # dispatch->fetch round trip (~0.5 s on this tunnel, CLAUDE.md)
        # dominates and caps e2e regardless of pipelining; (b) MANY
        # batches per call (8*B videos at batch_size=B) — the round-5
        # pipelined segment_many dispatches all batches asynchronously
        # and fetches once, so the per-call constant amortizes over 8
        # batches instead of being paid per batch.
        feature_list = [feats[i] for i in range(B)]
        seg.segment_many(feature_list, batch_size=max(B, 1))  # warm/compile
        e2e = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = seg.segment_many(feature_list, batch_size=max(B, 1))
            e2e.append(time.perf_counter() - t0)
        assert len(out) == B and all(len(o) == T for o in out)
        e2e_fps = B * T / min(e2e)

        n_multi = 8 * B
        multi_list = [feats[i % B] for i in range(n_multi)]
        seg.segment_many(multi_list, batch_size=max(B, 1))  # warm
        e2e_m = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = seg.segment_many(multi_list, batch_size=max(B, 1))
            e2e_m.append(time.perf_counter() - t0)
        assert len(out) == n_multi and all(len(o) == T for o in out)
        e2e_multi_fps = n_multi * T / min(e2e_m)

        rows.append({
            "B": B,
            "device_fps": round(device_fps, 1),
            "e2e_fps": round(e2e_fps, 1),
            "e2e_multi_fps": round(e2e_multi_fps, 1),
            "multi_batches_per_call": 8,
            "device_ms_per_batch": round(1e3 * per_iter, 3),
        })
        print(
            "B={:3d}  device {:12.0f} frames/s  ({:7.3f} ms/batch)   "
            "e2e {:12.0f} frames/s   e2e x8 batches {:12.0f} frames/s".format(
                B, device_fps, 1e3 * per_iter, e2e_fps, e2e_multi_fps
            )
        )

    line = json.dumps({"metric": "serving_batch_scan", "rows": rows})
    print(line)
    if cli.json:
        with open(cli.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
