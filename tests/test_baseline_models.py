"""Direct tests for framewise and sequential classifiers on the mini
CrossTask fixture (pipeline tests cover GMM/canonical/oracle; these add
the discriminative and constraint-decoding models)."""

import numpy as np
import pytest

from tests.test_crosstask_pipeline import _base_argv, mini_crosstask  # noqa: F401


def test_framewise_discriminative(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "framewise_discriminative")
        + ["--epochs", "3", "--lr", "1e-2"]
    )
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof > 0.5, (task, mof)


def test_sequential_discriminative(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "sequential_discriminative")
        + ["--epochs", "2", "--lr", "1e-2", "--seq_hidden_size", "32"]
    )
    assert "all" in stats
    for task, s in stats["all"].items():
        assert np.isfinite(s["mof"][0])


def test_framewise_baseline_majority(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "framewise_baseline")
        + ["--framewise_baseline_type", "majority_class"]
    )
    for task, s in stats["all"].items():
        # majority class predicts a single label everywhere
        assert s["predicted_label_types_per_video"][0] / s[
            "predicted_label_types_per_video"
        ][1] == 1.0


def test_sequential_predict_constraints(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(_base_argv(root, "sequential_predict_constraints"))
    # fixture constraints equal the true step intervals: non-background
    # frames decode correctly
    for task, s in stats["all"].items():
        nb = s["mof_non_bg"][0] / s["mof_non_bg"][1]
        assert nb > 0.9, (task, nb)


def test_device_plateau_matches_host_scheduler():
    """DevicePlateauLR (on-device plateau controller; no per-epoch loss
    fetch) must reproduce the host ReduceLROnPlateau's lr trajectory
    exactly — including NaN metrics (never 'improve'), the relative
    threshold, patience resets, and the min_lr floor."""
    import numpy as np

    from action_segmentation_tpu.models.base import (
        DevicePlateauLR,
        ReduceLROnPlateau,
    )

    rng = np.random.RandomState(7)
    metrics = list(rng.randn(40).astype(np.float32) * 10 + 50)
    # plateaus, an improvement burst, a NaN, and a deep floor stretch
    metrics[5:10] = [60.0] * 5
    metrics[12] = float("nan")
    metrics[20:40] = [100.0] * 20

    host = ReduceLROnPlateau(1e-2, factor=0.5, patience=2, min_lr=1e-4)
    dev = DevicePlateauLR(1e-2, factor=0.5, patience=2, min_lr=1e-4)
    for m in metrics:
        lr_h = host.step(m)
        lr_d = float(dev.step(m))
        assert abs(lr_h - lr_d) < 1e-9, (m, lr_h, lr_d)
    assert host.lr <= 1e-4 + 1e-9  # the floor stretch actually decayed

    # lr setter round-trips (checkpoint resume path)
    dev.lr = 3e-3
    assert abs(dev.lr - 3e-3) < 1e-9
