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
