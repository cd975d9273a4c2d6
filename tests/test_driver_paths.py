"""Driver-path coverage: the default per-task CLI loop (no --mix_tasks)
and seeded cross-validation splits, on a fixture covering all 18 primary
CrossTask task ids (the reference's default configuration iterates every
primary task and crashes if any lacks videos, so the fixture must be
complete)."""

import os

import numpy as np
import pytest

from action_segmentation_tpu.data.crosstask import CrosstaskCorpus

DIM = 4
N_TRAIN = 3
N_VAL = 1


def _write_full_release(root, rng):
    release = os.path.join(root, "crosstask", "crosstask_release")
    os.makedirs(os.path.join(release, "annotations"), exist_ok=True)
    constraints = os.path.join(root, "crosstask", "crosstask_constraints")
    os.makedirs(constraints, exist_ok=True)
    pca_root = os.path.join(
        root, "crosstask", "crosstask_processed",
        "crosstask_primary_pca-200_with-bkg_by-task",
    )
    for group in ("i3d", "resnet", "audio"):
        os.makedirs(os.path.join(pca_root, group), exist_ok=True)

    task_ids = CrosstaskCorpus.TASK_IDS_BY_SET["primary"]
    with open(os.path.join(release, "tasks_primary.txt"), "w") as f:
        for task_id in task_ids:
            f.write(f"{task_id}\ntask {task_id}\nhttp://x\n2\nstep1,step2\n\n")

    videos, val_videos = [], []
    for task_id in task_ids:
        for i in range(N_TRAIN + N_VAL):
            vid = f"v{task_id}_{i}"
            videos.append((task_id, vid))
            if i >= N_TRAIN:
                val_videos.append((task_id, vid))
            rows = []
            t = 2
            labels = [0, 0]
            for s_ix in range(2):
                dur = rng.randint(3, 6)
                rows.append((s_ix + 1, t, t + dur))
                labels.extend([s_ix + 1] * dur)
                t += dur
                labels.extend([0])
                t += 1
            T = len(labels)
            for fname_dir in ("annotations",):
                with open(
                    os.path.join(release, fname_dir, f"{task_id}_{vid}.csv"), "w"
                ) as f:
                    for step, s, e in rows:
                        f.write(f"{step},{s},{e}\n")
            with open(os.path.join(constraints, f"{task_id}_{vid}.csv"), "w") as f:
                for step, s, e in rows:
                    f.write(f"{step},{s},{e}\n")
            for group in ("i3d", "resnet", "audio"):
                feats = rng.randn(T, DIM).astype(np.float32)
                for t_ix, lab in enumerate(labels):
                    feats[t_ix, lab % DIM] += 3.0
                np.save(os.path.join(pca_root, group, f"{vid}.npy"), feats)

    with open(os.path.join(release, "videos.csv"), "w") as f:
        for task_id, vid in videos:
            f.write(f"{task_id},{vid},http://u\n")
    with open(os.path.join(release, "videos_val.csv"), "w") as f:
        for task_id, vid in val_videos:
            f.write(f"{task_id},{vid},http://u\n")


@pytest.fixture(scope="module")
def full_crosstask(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    _write_full_release(root, np.random.RandomState(0))
    return root


def _argv(root, extra):
    return [
        "--classifier", "semimarkov",
        "--dataset", "crosstask",
        "--features", "pca",
        "--pca_components_per_group", str(DIM),
        "--data_root", root,
        "--task_specific_steps",
        "--training", "supervised",
        "--sm_supervised_method", "closed-form",
        "--epochs", "1",
    ] + extra


def test_default_per_task_driver(full_crosstask):
    """The reference's default loop: one model per primary task."""
    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data.crosstask import CrosstaskCorpus

    stats = main_mod.main(_argv(full_crosstask, []))
    task_ids = CrosstaskCorpus.TASK_IDS_BY_SET["primary"]
    assert set(stats.keys()) == {f"{t}_val" for t in task_ids}
    mofs = []
    for split, by_task in stats.items():
        for task, s in by_task.items():
            mofs.append(s["mof"][0] / s["mof"][1])
    assert np.mean(mofs) > 0.6, np.mean(mofs)


def test_cross_validation_driver(full_crosstask, monkeypatch):
    import functools

    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data import crosstask as ct

    # the cv split takes 30 train videos per task (reference
    # crosstask.py:120); shrink for the 4-video fixture
    orig = ct.load_videos_by_task
    monkeypatch.setattr(
        ct, "load_videos_by_task", functools.partial(orig, cv_n_train=2)
    )
    stats = main_mod.main(
        _argv(
            full_crosstask,
            ["--crosstask_cross_validation", "--crosstask_cross_validation_seed", "2", "--mix_tasks"],
        )
    )
    assert "all" in stats
