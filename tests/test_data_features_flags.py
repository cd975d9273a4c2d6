"""Data-layer flag coverage: subsample, downscale, permutation, cv splits."""

import os

import numpy as np
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit


def test_frame_subsample_with_eval_reexpansion(tmp_path):
    """--frame_subsample decodes on subsampled frames and re-expands
    predictions by repetition at eval (reference corpus.py:466-472)."""
    from tests.test_crosstask_pipeline import _write_release, _base_argv
    from action_segmentation_tpu import main as main_mod

    root = str(tmp_path)
    rng = np.random.RandomState(3)
    _write_release(root, rng)
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "supervised",
            "--sm_supervised_method", "closed-form",
            "--frame_subsample", "2",
        ]
    )
    assert "all" in stats
    for task, s in stats["all"].items():
        assert s["mof"][1] > 0  # evaluated against full-rate gt


def test_feature_downscale_and_permutation(tmp_path):
    from tests.test_crosstask_pipeline import _write_release
    from action_segmentation_tpu.data.crosstask import CrosstaskCorpus

    root = str(tmp_path)
    rng = np.random.RandomState(4)
    _write_release(root, rng)
    release = os.path.join(root, "crosstask", "crosstask_release")
    feats = os.path.join(
        root, "crosstask", "crosstask_processed",
        "crosstask_primary_pca-200_with-bkg_by-task",
    )
    cons = os.path.join(root, "crosstask", "crosstask_constraints")

    def make_split(**kw):
        corpus = CrosstaskCorpus(
            release_root=release,
            feature_root=feats,
            dimensions_per_feature_group={"i3d": 4, "resnet": 4, "audio": 4},
            task_specific_steps=True,
            load_constraints=True,
            constraints_root=cons,
        )
        corpus._cache_features = True
        return corpus.get_datasplit(
            remove_background=False, task_sets=["primary"], split="train", **kw
        )

    base = make_split()
    key = base._tasks_and_video_names[0]
    f0 = base[key]["features"]

    scaled = make_split(feature_downscale=2.0)
    np.testing.assert_allclose(scaled[key]["features"], f0 / 2.0, rtol=1e-6)

    perm = make_split(feature_permutation_seed=7)
    fp = perm[key]["features"]
    assert fp.shape == f0.shape
    assert not np.allclose(fp, f0)
    assert np.allclose(np.sort(fp[0]), np.sort(f0[0]))  # a permutation


def test_cross_validation_splits(tmp_path):
    from tests.test_crosstask_pipeline import _write_release
    from action_segmentation_tpu.data.crosstask import load_videos_by_task

    root = str(tmp_path)
    rng = np.random.RandomState(5)
    _write_release(root, rng)
    release = os.path.join(root, "crosstask", "crosstask_release")
    train = load_videos_by_task(release, split="cv_train_3", cv_n_train=2)
    test = load_videos_by_task(release, split="cv_test_3", cv_n_train=2)
    for task in train:
        assert len(train[task]) == 2
        assert not (set(train[task]) & set(test[task]))
    # deterministic in the seed
    train2 = load_videos_by_task(release, split="cv_train_3", cv_n_train=2)
    assert train == train2
    train_other = load_videos_by_task(release, split="cv_train_4", cv_n_train=2)
    assert train != train_other


def test_synthetic_datasplit_contract():
    data = SyntheticDatasplit(num_videos=5, n_classes=3, max_len=20, span_k=4)
    assert len(data) == 5
    assert data.feature_dim == 3
    sample = data[("toy", "vid0000")]
    assert sample["features"].shape[0] == len(sample["gt_single"])
