"""Compare a realdata_smoke run's STAT_KEYS against recorded expectations.

main.py finishes each train/test with two aligned CSV-ish lines (the
reference's format, main.py:494-537): a header of STAT_KEYS and a row of
values. This script extracts the LAST such pair from each log and:

  * bootstrap: when --expected does not exist, records the stats there
    (plus the commands and epoch count) and exits 0 — the first green
    run on real data defines the expectations;
  * check: when it exists, every recorded stat must match within
    --atol (default 0.02 — smoke legs are few-epoch and deterministic
    given the seed, so drift beyond noise means a regression).

Table-2 context: on FULL runs (60 epochs) the stats to compare against
the paper (arXiv 2005.03684) are in PARITY.md "Real-data readiness".
"""

import argparse
import json
import math
import os
import sys


def extract_last_stats(log_path, stat_keys_prefix="mof, mof_non_bg"):
    """(keys, values) from the last aligned header/value line pair."""
    pairs = []
    prev = None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if prev is not None and prev.startswith(stat_keys_prefix):
                vals = line.split(", ")
                keys = prev.split(", ")
                if len(vals) == len(keys):
                    try:
                        pairs.append(
                            dict(zip(keys, [float(v) for v in vals]))
                        )
                    except ValueError:
                        pass
            prev = line
    return pairs[-1] if pairs else None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--s6_log")
    p.add_argument("--u7_log")
    p.add_argument("--expected", default="docs/realdata_expected.json")
    p.add_argument("--atol", type=float, default=0.02)
    cli = p.parse_args(argv)

    got = {}
    for name, path in (("s6", cli.s6_log), ("u7", cli.u7_log)):
        if not path:
            continue
        stats = extract_last_stats(path)
        if stats is None:
            print("realdata_stats_check: no stat lines in {}".format(path))
            return 1
        nans = [k for k, v in stats.items() if not math.isfinite(v)]
        if nans:
            # non-finite stats are the failure this kit exists to catch;
            # never record them as expectations or match them silently
            print(
                "realdata_stats_check: {} has non-finite stats: {}".format(
                    name, nans
                )
            )
            return 1
        got[name] = stats
        print("{}: {}".format(name, json.dumps(stats)))

    if not os.path.exists(cli.expected):
        os.makedirs(os.path.dirname(cli.expected) or ".", exist_ok=True)
        with open(cli.expected, "w") as f:
            json.dump(
                {
                    "note": "bootstrap expectations recorded by "
                    "scripts/realdata_stats_check.py on the first green "
                    "realdata_smoke run; later runs must match within "
                    "atol={}".format(cli.atol),
                    "stats": got,
                },
                f,
                indent=2,
            )
        print(
            "realdata_stats_check: BOOTSTRAP — expectations recorded to "
            + cli.expected
        )
        return 0

    with open(cli.expected) as f:
        expected = json.load(f)["stats"]
    bad = []
    for name, stats in expected.items():
        for key, want in stats.items():
            have = got.get(name, {}).get(key)
            if (
                have is None
                or not math.isfinite(have)
                or not math.isfinite(want)
                or abs(have - want) > cli.atol
            ):
                bad.append((name, key, want, have))
    # a run/key present now but missing from the recorded expectations is
    # also a failure: a bootstrap that only saw --s6_log must not let every
    # later u7 leg pass unvalidated
    for name, stats in got.items():
        if name not in expected:
            bad.append((name, "<run>", "<no expectation recorded>", "present"))
            continue
        for key in stats:
            if key not in expected[name]:
                bad.append((name, key, "<no expectation recorded>", stats[key]))
    if bad:
        for name, key, want, have in bad:
            print(
                "realdata_stats_check: MISMATCH {}[{}]: expected {} got "
                "{}".format(name, key, want, have)
            )
        return 1
    print("realdata_stats_check: all stats within {} of expectations".format(
        cli.atol
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
