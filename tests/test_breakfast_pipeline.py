"""Breakfast-format pipeline test on a generated miniature dataset.

Builds a tiny on-disk Breakfast layout (mapping.txt, per-participant
annotation txt files under camera directories, fisher-vector .npy
features with the reference's first-row/column convention) and runs the
CLI end-to-end over the 4-fold participant splits.
"""

import os

import numpy as np
import pytest

from action_segmentation_tpu.data.minigen import (
    BREAKFAST_DIM as DIM,
    BREAKFAST_LABELS as LABELS,
    BREAKFAST_PARTICIPANTS as PARTICIPANTS,
    BREAKFAST_TASKS as TASKS,
    write_mini_breakfast as _write_breakfast,
)


@pytest.fixture(scope="module")
def mini_breakfast(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    rng = np.random.RandomState(0)
    _write_breakfast(root, rng)
    return root


def test_breakfast_semimarkov_pipeline(mini_breakfast):
    from action_segmentation_tpu import main as main_mod

    stats = main_mod.main(
        [
            "--classifier", "semimarkov",
            "--dataset", "breakfast",
            "--features", "raw",
            "--data_root", mini_breakfast,
            "--training", "supervised",
            "--sm_supervised_method", "closed-form",
            "--sm_max_span_length", "12",
            "--epochs", "1",
        ]
    )
    assert set(stats.keys()) == {"s1", "s2", "s3", "s4"}
    for split, by_task in stats.items():
        for task, s in by_task.items():
            mof = s["mof"][0] / s["mof"][1]
            assert mof > 0.4, (split, task, mof)


def test_breakfast_pca_preprocessing_and_training(mini_breakfast):
    """PCA CLI writes the processed feature dir; training runs on it."""
    import re

    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data import breakfast as bf

    bdir = os.path.join(mini_breakfast, "breakfast")
    out_root = os.path.join(
        bdir, "breakfast_processed", "breakfast_pca-64_with-bkg_by-task"
    )
    bf.pca_and_serialize_features(
        mapping_file=os.path.join(bdir, "mapping.txt"),
        feature_root=os.path.join(bdir, "reduced_fv_64"),
        label_root=os.path.join(bdir, "BreakfastII_15fps_qvga_sync"),
        output_feature_root=out_root,
        remove_background=False,
        pca_components_per_group=64,
        by_task=True,
        task_ids=list(TASKS.keys()),
    )
    written = os.listdir(os.path.join(out_root, "reduced_64"))
    assert len(written) > 0
    # the datasplit's recursive walk finds the files inside the group
    # subdir; BreakfastVideo's first-row/col drop shifts lengths by one,
    # absorbed by the 50-frame mismatch tolerance (reference behavior)
    stats = main_mod.main(
        [
            "--classifier", "framewise_gaussian_mixture",
            "--dataset", "breakfast",
            "--features", "pca",
            "--pca_components_per_group", "64",
            "--data_root", mini_breakfast,
            "--epochs", "1",
        ]
    )
    assert set(stats.keys()) == {"s1", "s2", "s3", "s4"}


def test_breakfast_remove_background(mini_breakfast):
    from action_segmentation_tpu.data.breakfast import BreakfastCorpus

    corpus = BreakfastCorpus(
        mapping_file=os.path.join(mini_breakfast, "breakfast", "mapping.txt"),
        feature_root=os.path.join(mini_breakfast, "breakfast", "reduced_fv_64"),
        label_root=os.path.join(
            mini_breakfast, "breakfast", "BreakfastII_15fps_qvga_sync"
        ),
    )
    corpus._cache_features = True
    split = corpus.get_datasplit(remove_background=True, splits=["s1"])
    for task, vids in split.videos_by_task.items():
        for name in vids:
            sample = split[(task, name)]
            gts = [g[0] for g in sample["gt"]]
            assert 0 not in gts  # SIL removed
            assert sample["features"].shape[0] == len(gts)
