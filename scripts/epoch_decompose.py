"""Decompose the realistic-epoch wall clock into measured phases.

Round-3 verdict weak-item 1: BENCH_r03 reported device train throughput
of 14.6M frames/s but realistic-epoch wall clock of 40.5k frames/s, and
the 360x gap was *asserted* to be tunnel latency, not measured. This
script times every phase of the same workload bench_epoch_realistic
runs (SemiMarkovModel.fit on the 44-video CrossTask-like synthetic
corpus) by wrapping the host loop's components:

  * collate      — iter_batches: bucketing, padding, stacking (host)
  * batch_prep   — _batch_device_args + _pad_batch_rows (host numpy)
  * device_put   — host->device transfer of the batch
  * dispatch     — grad_step + update call time (async enqueue, NOT
                   device execution)
  * drain_fetch  — the stacked scalar fetches (each is a full
                   dispatch->fetch round trip through the TPU tunnel)
  * log_fetch    — float(gnorm)-style fetches for the print_every line
  * sched_cb     — plateau scheduler + callback (host)
  * other        — residual (epoch wall - sum of the above)

Usage:  python scripts/epoch_decompose.py [--json OUT]
Prints a per-epoch table and one JSON line; run before/after host-loop
changes to show where the time went (docs/DESIGN.md §9).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


class PhaseTimer:
    def __init__(self):
        self.totals = {}

    def add(self, name, dt):
        self.totals[name] = self.totals.get(name, 0.0) + dt

    def wrap(self, name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self.add(name, time.perf_counter() - t0)
            return out

        return wrapped

    def snapshot(self):
        out = dict(self.totals)
        self.totals = {}
        return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    p.add_argument("--epochs", type=int, default=4)
    args_cli = p.parse_args(argv)

    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from action_segmentation_tpu.data import batching
    from action_segmentation_tpu.models import semimarkov as sm_mod
    from bench import C, D, K, T, bench_epoch_realistic  # noqa: F401  (constants)
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
    args.epochs = args_cli.epochs
    args.lr = 1e-2

    train = SyntheticDatasplit(
        num_videos=44, n_classes=C, max_len=T, min_len=400, span_k=K,
        feature_dim=D, shift=1.5, seed=0,
    )
    total_frames = sum(len(s["gt_single"]) for s in train._samples.values())

    model = SemiMarkovModel.from_args(args, train)
    timer = PhaseTimer()

    # --- instrument the host loop's phases ---------------------------------
    orig_iter = batching.iter_batches

    def timed_iter(*a, **k):
        it = orig_iter(*a, **k)
        while True:
            t0 = time.perf_counter()
            try:
                b = next(it)
            except StopIteration:
                return
            timer.add("collate", time.perf_counter() - t0)
            yield b

    batching.iter_batches = timed_iter
    sm_mod.iter_batches = timed_iter

    model._batch_device_args = timer.wrap(
        "batch_prep", model._batch_device_args
    )
    model._pad_batch_rows = timer.wrap("batch_prep", model._pad_batch_rows)

    orig_device_put = jax.device_put
    jax.device_put = timer.wrap("device_put", orig_device_put)

    orig_get_jitted = model._get_jitted

    def timed_get_jitted(name, builder):
        fn = orig_get_jitted(name, builder)
        key = "dispatch_" + name.split("_")[0]
        if not getattr(fn, "_timed", False):
            fn = timer.wrap(key, fn)
            fn._timed = True
            model._jit_cache[name] = fn
        return fn

    model._get_jitted = timed_get_jitted

    orig_asarray = np.asarray

    def timed_asarray(x, *a, **k):
        if isinstance(x, jax.Array):
            t0 = time.perf_counter()
            out = orig_asarray(x, *a, **k)
            timer.add("drain_fetch", time.perf_counter() - t0)
            return out
        return orig_asarray(x, *a, **k)

    sm_mod.np.asarray = timed_asarray

    epoch_rows = []
    wall = [time.perf_counter()]

    def cb(epoch, stats):
        t0 = time.perf_counter()
        row = timer.snapshot()
        row["epoch_wall"] = t0 - wall[0]
        wall[0] = time.perf_counter()
        epoch_rows.append((epoch, row))

    t_fit0 = time.perf_counter()
    model.fit(train, use_labels=False, callback_fn=cb)
    fit_total = time.perf_counter() - t_fit0

    np.asarray = orig_asarray
    jax.device_put = orig_device_put

    phases = sorted({k for _, r in epoch_rows for k in r if k != "epoch_wall"})
    print("epoch  wall_s  " + "  ".join("{:>12s}".format(p) for p in phases + ["other"]))
    table = []
    for epoch, row in epoch_rows:
        acct = sum(v for k, v in row.items() if k != "epoch_wall")
        other = row["epoch_wall"] - acct
        cells = [row.get(p, 0.0) for p in phases] + [other]
        print(
            "{:>5d}  {:6.3f}  ".format(epoch, row["epoch_wall"])
            + "  ".join("{:12.4f}".format(c) for c in cells)
        )
        table.append({"epoch": epoch, "wall_s": row["epoch_wall"],
                      **{p: row.get(p, 0.0) for p in phases}, "other": other})

    warm = [r for r in table if r["epoch"] >= 1]
    warm_wall = min(r["wall_s"] for r in warm) if warm else None
    out = {
        "metric": "epoch_phase_decomposition",
        "epoch_frames": total_frames,
        "fit_total_s": round(fit_total, 3),
        "warm_epoch_s": round(warm_wall, 4) if warm_wall else None,
        "warm_epoch_frames_per_sec": (
            round(total_frames / warm_wall, 1) if warm_wall else None
        ),
        "epochs": table,
    }
    line = json.dumps(out)
    print(line)
    if args_cli.json:
        with open(args_cli.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
