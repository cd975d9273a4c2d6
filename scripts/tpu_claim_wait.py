"""Wait out a wedged TPU grant with ONE long-lived claimer.

Doctrine (CLAUDE.md "Environment quirks"): killing a TPU process
mid-claim can leave the remote grant held, wedging every later
`jax.devices()`; and a timeout-kill landing mid-init right when the
grant frees re-wedges it. Recovery is therefore a single process that
waits for the grant and EXITS BY ITSELF — never a kill-retry probe
loop.

Run it detached and poll the log:

    nohup python scripts/tpu_claim_wait.py > /tmp/tpu_claim.log 2>&1 &

Exit codes: 0 = grant acquired (a real computation succeeded),
1 = still wedged at the deadline, 2 = backend init FAILED fast
(e.g. `UNAVAILABLE: TPU backend setup/compile error` — an infra
error state distinct from the queued-grant hang; observed 2026-08-18).

The probe runs in a daemon thread because a wedged `jax.devices()`
cannot be interrupted from Python; the main thread owns the deadline.
The wait loop checks `th.is_alive()` so a probe that DIES (fast
backend error) exits immediately instead of busy-spinning — join() on
a dead thread returns instantly, and an earlier version of this
script looped on that, writing gigabytes of repeated status lines.
"""

import sys
import threading
import time
import traceback

DEADLINE_S = 3400  # under one hour; self-exits, never killed externally

out = {}


def probe():
    try:
        import jax

        d = jax.devices()
        out["kind"] = d[0].device_kind
        import jax.numpy as jnp

        # a real computation proves the claim is usable, not just listed
        out["val"] = float(jnp.ones((8, 8)).sum())
    except Exception:
        out["err"] = traceback.format_exc()


def main():
    t0 = time.time()
    th = threading.Thread(target=probe, daemon=True)
    th.start()
    while time.time() - t0 < DEADLINE_S:
        th.join(60)
        # sample liveness BEFORE reading results: a probe that completes
        # in the window between a failed "val" check and a later
        # is_alive() check must not be misreported as "died" (rc 2) —
        # with liveness sampled first, a just-finished probe is caught
        # by the "val" check now or on the next 60 s lap
        alive = th.is_alive()
        elapsed = time.time() - t0
        if "val" in out:
            print(
                "TPU GRANT ACQUIRED: kind={} val={} after {:.0f}s".format(
                    out["kind"], out["val"], elapsed
                ),
                flush=True,
            )
            return 0
        if "err" in out or not alive:
            print(
                "probe thread died after {:.0f}s:\n{}".format(
                    elapsed, out.get("err", "<no traceback>")
                ),
                flush=True,
            )
            return 2
        print("[{:.0f}s] waiting for TPU grant...".format(elapsed), flush=True)
    print("still wedged after {}s".format(DEADLINE_S), flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
