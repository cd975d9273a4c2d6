"""The real-data readiness kit, tested without real data.

The kit itself (scripts/realdata_smoke.sh + realdata_loader_parity.py +
realdata_stats_check.py) can only complete on a machine with the
CrossTask files mounted; these tests pin the machinery that must work
the FIRST time that happens: the not-mounted exits are clean (rc 3),
the stat extraction parses main.py's aligned header/value lines, and
the bootstrap-then-check expectation flow round-trips.
"""

import json
import subprocess
import sys

from scripts.realdata_stats_check import extract_last_stats, main as stats_main

REPO = __file__.rsplit("/tests/", 1)[0]


def test_smoke_script_exits_3_when_unmounted(tmp_path):
    r = subprocess.run(
        ["bash", "scripts/realdata_smoke.sh"],
        cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "DATA_ROOT": str(tmp_path)},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr)
    assert "not" in r.stdout and "mounted" in r.stdout


def test_loader_parity_exits_3_when_unmounted(tmp_path):
    r = subprocess.run(
        [sys.executable, "scripts/realdata_loader_parity.py",
         "--dataset", "crosstask", "--data_root", str(tmp_path)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr)


def _write_log(path, stats):
    keys = list(stats)
    with open(path, "w") as f:
        f.write("training noise\nEpoch: 00 loss 1.23\n")
        f.write(", ".join(keys) + "\n")
        f.write(", ".join("{:.4f}".format(stats[k]) for k in keys) + "\n")
        f.write("trailing noise\n")


STATS = {
    "mof": 0.61, "mof_non_bg": 0.55, "step_recall_non_bg": 0.4,
    "mean_normed_levenshtein": 0.3, "center_step_recall_non_bg": 0.45,
    "f1": 0.5, "f1_non_bg": 0.48, "pred_background": 0.2,
    "iou_multi_non_bg": 0.35, "predicted_label_types_per_video": 5.0,
    "predicted_label_types_non_bg_per_video": 4.0,
    "predicted_segments_per_video": 9.0,
    "predicted_segments_non_bg_per_video": 8.0, "multiple_gt_labels": 0.01,
}


def test_extract_last_stats_takes_final_pair(tmp_path):
    log = tmp_path / "log.txt"
    first = dict(STATS, mof=0.10)
    with open(log, "w") as f:
        for stats in (first, STATS):
            keys = list(stats)
            f.write(", ".join(keys) + "\n")
            f.write(
                ", ".join("{:.4f}".format(stats[k]) for k in keys) + "\n"
            )
    got = extract_last_stats(str(log))
    assert got["mof"] == 0.61  # the LAST pair, i.e. the final test() dump


def test_stats_check_rejects_nan_stats(tmp_path):
    """A run whose losses blew up prints 'nan' stat values; the check
    must fail loudly — never record NaN expectations (bootstrap) nor
    match them (abs(nan-x) > atol is False, the silent-green trap)."""
    s6 = tmp_path / "s6.txt"
    _write_log(str(s6), dict(STATS, mof=float("nan")))
    expected = tmp_path / "expected.json"
    argv = ["--s6_log", str(s6), "--expected", str(expected)]
    assert stats_main(argv) == 1  # bootstrap mode refuses
    assert not expected.exists()

    _write_log(str(s6), STATS)
    assert stats_main(argv) == 0  # records clean expectations
    _write_log(str(s6), dict(STATS, mof=float("nan")))
    assert stats_main(argv) == 1  # check mode refuses too


def test_stats_check_rejects_inf_stats(tmp_path):
    """'inf' round-trips through '{:.4f}'.format and float() just like
    a finite value, and abs(inf-inf)=nan > atol is False — so an inf
    stat would bootstrap AND silently match forever. The guard must be
    isfinite, not isnan."""
    s6 = tmp_path / "s6.txt"
    _write_log(str(s6), dict(STATS, mof=float("inf")))
    expected = tmp_path / "expected.json"
    argv = ["--s6_log", str(s6), "--expected", str(expected)]
    assert stats_main(argv) == 1  # bootstrap refuses to record inf
    assert not expected.exists()

    _write_log(str(s6), STATS)
    assert stats_main(argv) == 0
    _write_log(str(s6), dict(STATS, mof=float("inf")))
    assert stats_main(argv) == 1  # check mode refuses too


def test_stats_check_fails_on_unvalidated_run_or_key(tmp_path):
    """A bootstrap that only saw --s6_log must not let later u7 legs
    pass unvalidated: any run/key present now but absent from the
    recorded expectations is a failure, not a silent skip."""
    s6 = tmp_path / "s6.txt"
    u7 = tmp_path / "u7.txt"
    _write_log(str(s6), STATS)
    _write_log(str(u7), dict(STATS, mof=0.31))
    expected = tmp_path / "expected.json"

    # bootstrap with s6 only
    assert stats_main(["--s6_log", str(s6), "--expected", str(expected)]) == 0
    # a later full run must FAIL: u7 has no recorded expectation
    assert (
        stats_main(
            ["--s6_log", str(s6), "--u7_log", str(u7),
             "--expected", str(expected)]
        )
        == 1
    )
    # an extra key unknown to the expectations must also fail
    rec = json.load(open(expected))
    del rec["stats"]["s6"]["f1"]
    json.dump(rec, open(expected, "w"))
    assert stats_main(["--s6_log", str(s6), "--expected", str(expected)]) == 1


def test_stats_check_bootstrap_then_match_then_regress(tmp_path):
    s6 = tmp_path / "s6.txt"
    u7 = tmp_path / "u7.txt"
    _write_log(str(s6), STATS)
    _write_log(str(u7), dict(STATS, mof=0.31))
    expected = tmp_path / "expected.json"

    argv = ["--s6_log", str(s6), "--u7_log", str(u7),
            "--expected", str(expected)]
    assert stats_main(argv) == 0  # bootstrap: records expectations
    rec = json.load(open(expected))
    assert rec["stats"]["s6"]["mof"] == 0.61
    assert rec["stats"]["u7"]["mof"] == 0.31

    assert stats_main(argv) == 0  # same run matches itself

    _write_log(str(s6), dict(STATS, mof=0.50))  # a 0.11 regression
    assert stats_main(argv) == 1


def test_smoke_script_pins_table2_commands():
    """Stages 3/4 must run EXACTLY the repo's documented Table-2 S6/U7
    commands: the round-5 review found stage 3 missing the class-space
    flags and stage 4 training a Gaussian HSMM (no --sm_component_model,
    spurious --mix_tasks) — expectations bootstrapped from those would
    validate the wrong model family forever."""
    src = "\n".join(
        line
        for line in open(REPO + "/scripts/realdata_smoke.sh")
        if not line.lstrip().startswith("#")  # commands, not comments
    )
    s6 = src.split("== stage 3")[1].split("== stage 4")[0]
    assert "--task_specific_steps" in s6
    assert "--annotate_background_with_previous" in s6
    assert "--mix_tasks" not in s6
    u7 = src.split("== stage 4")[1].split("== stage 5")[0]
    for flag in (
        "--sm_component_model",
        "--task_specific_steps",
        "--sm_constrain_transitions",
        "--annotate_background_with_previous",
        "--sm_constrain_with_narration train",
    ):
        assert flag in u7, flag
    assert "--mix_tasks" not in u7
