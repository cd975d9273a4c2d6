"""Full-pipeline test on a generated miniature CrossTask-format dataset.

Writes a tiny on-disk release (tasks_primary.txt, videos.csv,
annotations, constraints, PCA feature dirs) and drives the real CLI
(`main.main`) end-to-end: data loading, closed-form supervised HSMM fit,
Viterbi decode, and Hungarian-matched evaluation.
"""

import os

import numpy as np
import pytest

from action_segmentation_tpu.data.minigen import (
    DIM_PER_GROUP,
    N_TRAIN,
    N_VAL,
    TASKS,
    write_mini_crosstask as _write_release,
)


@pytest.fixture(scope="module")
def mini_crosstask(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    rng = np.random.RandomState(0)
    gt = _write_release(root, rng)
    return root, gt


def _base_argv(root, classifier):
    return [
        "--classifier", classifier,
        "--dataset", "crosstask",
        "--features", "pca",
        "--pca_components_per_group", str(DIM_PER_GROUP),
        "--data_root", root,
        "--mix_tasks",
        "--task_specific_steps",
        "--epochs", "2",
    ]


def test_semimarkov_closed_form_pipeline(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + ["--training", "supervised", "--sm_supervised_method", "closed-form"]
    )
    assert "all" in stats
    # features are highly separable: expect strong frame accuracy
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof > 0.6, (task, mof)


def test_framewise_gaussian_pipeline(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(_base_argv(root, "framewise_gaussian_mixture"))
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof > 0.5, (task, mof)
    # full-covariance variant through the same CLI path
    stats = main_mod.main(
        _base_argv(root, "framewise_gaussian_mixture")
        + ["--gm_covariance", "full"]
    )
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof > 0.5, (task, mof)


def test_sequential_baselines_pipeline(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(_base_argv(root, "sequential_ground_truth"))
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof == 1.0
    stats = main_mod.main(_base_argv(root, "sequential_canonical_baseline"))
    assert "all" in stats


def test_save_then_decode_pipeline(mini_crosstask, tmp_path):
    """Train, serialize, reload via --model_input_path, write predictions."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    model_dir = str(tmp_path / "models")
    pred_dir = str(tmp_path / "preds")
    argv = _base_argv(root, "semimarkov") + [
        "--training", "supervised",
        "--sm_supervised_method", "closed-form",
        "--model_output_path", model_dir,
    ]
    main_mod.main(argv)
    assert os.path.exists(os.path.join(model_dir, "all.pkl"))

    decode_argv = _base_argv(root, "semimarkov") + [
        "--training", "supervised",
        "--sm_supervised_method", "closed-form",
        "--model_input_path", model_dir,
        "--prediction_output_path", pred_dir,
    ]
    stats = main_mod.main(decode_argv)
    assert "all" in stats
    preds = os.listdir(pred_dir)
    assert len(preds) > 0
    with open(os.path.join(pred_dir, preds[0])) as f:
        content = f.read()
    assert "### Frame level recognition: ###" in content


def test_compare_to_prediction_folder(mini_crosstask, tmp_path):
    """The regression-comparison harness re-scores serialized predictions."""
    import json

    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data.crosstask import CrosstaskCorpus

    root, gt_frames = mini_crosstask
    cmp_dir = str(tmp_path / "cmp")
    os.makedirs(cmp_dir, exist_ok=True)

    # build y_true/y_pred json keyed by task/video using one-hot step-space
    y_true = {}
    y_pred = {}
    for task_id, steps in TASKS.items():
        y_true[str(task_id)] = {}
        y_pred[str(task_id)] = {}
        for i in range(N_TRAIN, N_TRAIN + N_VAL):
            vid = f"v{task_id}_{i}"
            labels = gt_frames[vid]
            onehot = np.zeros((len(labels), len(steps) + 1))
            onehot[np.arange(len(labels)), labels] = 1
            y_true[str(task_id)][vid] = onehot.tolist()
            y_pred[str(task_id)][vid] = onehot.tolist()  # perfect predictions
    with open(os.path.join(cmp_dir, "y_true.json"), "w") as f:
        json.dump(y_true, f)
    with open(os.path.join(cmp_dir, "y_pred.json"), "w") as f:
        json.dump(y_pred, f)

    argv = _base_argv(root, "semimarkov") + [
        "--compare_only",
        "--compare_to_prediction_folder", cmp_dir,
    ]
    stats = main_mod.main(argv)
    for task, s in stats["all"].items():
        mof = s["mof"][0] / s["mof"][1]
        assert mof == 1.0, (task, mof)


def test_related_tasks_training_data(mini_crosstask):
    """--crosstask_training_data primary related: secondary tasks load and
    train alongside primary (crosstask.py use_secondary path)."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "supervised",
            "--sm_supervised_method", "closed-form",
            "--crosstask_training_data", "primary", "related",
        ]
    )
    assert "all" in stats
    # evaluation is still over primary tasks only
    assert set(stats["all"].keys()) == set(TASKS.keys())


def test_workers_prefetch(mini_crosstask):
    """--workers N: bounded thread-pool batch prefetch."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "supervised",
            "--sm_supervised_method", "closed-form",
            "--workers", "2",
        ]
    )
    for task, s in stats["all"].items():
        assert s["mof"][0] / s["mof"][1] > 0.6


def test_compare_load_splits_from_predictions(mini_crosstask, tmp_path):
    """--compare_load_splits_from_predictions: the comparison folder's
    y_pred.json defines the validation video set (main.py:325-336)."""
    import json

    from action_segmentation_tpu import main as main_mod

    root, gt_frames = mini_crosstask
    cmp_dir = str(tmp_path / "cmp2")
    os.makedirs(cmp_dir, exist_ok=True)
    y_true = {}
    y_pred = {}
    for task_id, steps in TASKS.items():
        y_true[str(task_id)] = {}
        y_pred[str(task_id)] = {}
        # use TRAIN videos as the override val set
        for i in range(0, 2):
            vid = f"v{task_id}_{i}"
            labels = gt_frames[vid]
            onehot = np.zeros((len(labels), len(steps) + 1))
            onehot[np.arange(len(labels)), labels] = 1
            y_true[str(task_id)][vid] = onehot.tolist()
            y_pred[str(task_id)][vid] = onehot.tolist()
    with open(os.path.join(cmp_dir, "y_true.json"), "w") as f:
        json.dump(y_true, f)
    with open(os.path.join(cmp_dir, "y_pred.json"), "w") as f:
        json.dump(y_pred, f)

    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--compare_only",
            "--compare_to_prediction_folder", cmp_dir,
            "--compare_load_splits_from_predictions",
        ]
    )
    for task, s in stats["all"].items():
        assert s["mof"][0] / s["mof"][1] == 1.0


def test_unsupervised_constrained_pipeline(mini_crosstask):
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "unsupervised",
            "--sm_constrain_transitions",
            "--annotate_background_with_previous",
            "--sm_constrain_with_narration", "train",
            "--epochs", "1",
            "--sm_max_span_length", "10",
        ]
    )
    assert "all" in stats


def test_remove_background_pipeline(mini_crosstask):
    """--remove_background (run_crosstask_no-bkg.sh flow): background
    frames are filtered from features and gt; constrained transitions use
    the background-free canonical ordering."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "unsupervised",
            "--remove_background",
            "--sm_constrain_transitions",
            "--epochs", "1",
            "--sm_max_span_length", "10",
        ]
    )
    assert "all" in stats
    for task, s in stats["all"].items():
        # with background removed, every gt frame is a step frame
        assert s["mof"][1] == s["mof_non_bg"][1]


def test_raw_features_path(mini_crosstask, tmp_path):
    """--features raw loads one unsplit .npy per video
    (crosstask.py:96-104)."""
    import shutil

    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    # build raw features by concatenating the fixture's pca groups
    pca_root = os.path.join(
        root, "crosstask", "crosstask_processed",
        "crosstask_primary_pca-200_with-bkg_by-task",
    )
    raw_root = os.path.join(root, "crosstask", "crosstask_features")
    if not os.path.isdir(raw_root):
        os.makedirs(raw_root)
        for fname in os.listdir(os.path.join(pca_root, "i3d")):
            parts = [
                np.load(os.path.join(pca_root, g, fname))
                for g in ("i3d", "resnet", "audio")
            ]
            np.save(os.path.join(raw_root, fname), np.hstack(parts))
    stats = main_mod.main(
        [
            "--classifier", "semimarkov",
            "--dataset", "crosstask",
            "--features", "raw",
            "--data_root", root,
            "--mix_tasks",
            "--task_specific_steps",
            "--training", "supervised",
            "--sm_supervised_method", "closed-form",
            "--epochs", "1",
        ]
    )
    for task, s in stats["all"].items():
        assert s["mof"][0] / s["mof"][1] > 0.6


def test_u7_component_model_pipeline(mini_crosstask):
    """The paper's U7 configuration (README.md:57): unsupervised compound
    HSMM with canonical-ordering constraints and train-time narration."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "unsupervised",
            "--annotate_background_with_previous",
            "--sm_constrain_transitions",
            "--sm_component_model",
            "--sm_component_embedding_dim", "16",
            "--sm_constrain_with_narration", "train",
            "--epochs", "1",
            "--sm_max_span_length", "10",
            "--lr", "1e-2",
        ]
    )
    assert "all" in stats
    for task, s in stats["all"].items():
        assert np.isfinite(s["mof"][0])


def test_component_decompose_steps(mini_crosstask):
    """--sm_component_decompose_steps: classes embed as the mean of their
    word components shared across tasks (Compound-PCFG-style)."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "unsupervised",
            "--sm_component_model",
            "--sm_component_decompose_steps",
            "--sm_component_embedding_dim", "16",
            "--epochs", "1",
            "--sm_max_span_length", "10",
            "--lr", "1e-2",
        ]
    )
    assert "all" in stats
    for task, s in stats["all"].items():
        assert np.isfinite(s["mof"][0])


def test_narration_constraints_at_test(mini_crosstask):
    """--sm_constrain_with_narration test (the decode_constrained.sh flow):
    fixture constraints equal the true step intervals, so constrained
    decoding pins step frames correctly."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    stats = main_mod.main(
        _base_argv(root, "semimarkov")
        + [
            "--training", "unsupervised",
            "--sm_constrain_transitions",
            "--annotate_background_with_previous",
            "--sm_constrain_with_narration", "test",
            "--epochs", "1",
            "--sm_max_span_length", "10",
        ]
    )
    # narration penalties forbid step labels OUTSIDE their intervals (not
    # background inside them), so after 1 unsupervised epoch expect decent
    # but not perfect step placement
    for task, s in stats["all"].items():
        nb = s["mof_non_bg"][0] / s["mof_non_bg"][1]
        assert nb > 0.4, (task, nb)


def test_shape_bucketing_bounds_compiles(mini_crosstask):
    """Class-count bucketing + fixed-B padding bound the number of jit
    traces: tasks with different step counts (C_sub 3 and 4 here, both
    bucketed to 4) and partial final batches must share decode programs,
    so the trace count is at most the number of length buckets."""
    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    root, _ = mini_crosstask
    parser = main_mod.build_parser()
    args = parser.parse_args(
        _base_argv(root, "semimarkov")
        + ["--training", "supervised", "--sm_supervised_method", "closed-form",
           # force the per-batch STREAMING decode — this test bounds its
           # jit traces; the resident scan path has its own cache
           "--sm_device_resident_mb", "0"]
    )
    (train_data, _, test_data) = main_mod.make_data_splits(args)["all"]
    model = SemiMarkovModel.from_args(args, train_data)
    model.fit_supervised(train_data)
    model.predict(test_data)

    decode = model._jit_cache["decode"]
    # every video's features bucket to a padded length; distinct decode
    # traces = distinct (T_bucket,) shapes only — C and B are pinned
    traces = decode._cache_size()
    from action_segmentation_tpu.data.batching import pad_length_to_bucket

    buckets = set()
    for task, vids in test_data.videos_by_task.items():
        for name in vids:
            sample = test_data[(task, name)]
            if sample is not None:
                buckets.add(pad_length_to_bucket(sample["features"].shape[0]))
    assert traces <= len(buckets), (traces, buckets)


def test_constrained_scan_matches_streaming(mini_crosstask):
    """U7-style constrained training (canonical-ordering masks +
    train-time narration penalties + allowed-end masks) through the
    resident epoch scan vs the streaming loop: the per-epoch stat
    trajectories must match, proving the resident constraint rows
    (incl. the zero-pad expansion beyond each video's length,
    data/resident.py build_resident_corpus) are bit-compatible with
    the streaming collation."""
    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    root, _ = mini_crosstask
    argv = _base_argv(root, "semimarkov") + [
        "--training", "unsupervised",
        "--annotate_background_with_previous",
        "--sm_constrain_transitions",
        "--sm_constrain_with_narration", "train",
        "--sm_max_span_length", "10",
        "--lr", "1e-2",
    ]
    parser = main_mod.build_parser()
    KEYS = (
        "train_loss", "train_nll_frame_avg", "train_kl_vid_avg",
        "train_recon_bound",
    )

    def run(extra):
        args = parser.parse_args(argv + extra)
        train_data, _, _ = next(iter(main_mod.make_data_splits(args).values()))
        model = SemiMarkovModel.from_args(args, train_data)
        stats = []
        model.fit(
            train_data, use_labels=False,
            callback_fn=lambda e, s: stats.append(
                [float(s[k]) for k in KEYS] if s else []
            ),
        )
        return model, [s for s in stats if s]

    m_scan, s_scan = run([])
    res = [r for _, r in m_scan._resident_cache.values() if r is not None]
    assert res and res[0].with_cons and res[0].with_end  # constrained scan ran
    _, s_str = run(["--sm_device_resident_mb", "0"])
    np.testing.assert_allclose(s_scan, s_str, rtol=1e-5, atol=1e-6)


def test_mixed_constraints_fall_back_to_streaming(tmp_path):
    """A corpus where one video lacks its narration-constraints file
    must NOT take the resident scan (which would silently drop the
    penalties for every video); it falls back to the per-batch
    streaming loop, which applies constraints batch by batch (round-4
    review finding)."""
    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data.minigen import write_mini_crosstask
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    root = str(tmp_path)
    write_mini_crosstask(root, np.random.RandomState(0))
    argv = _base_argv(root, "semimarkov") + [
        "--training", "unsupervised",
        "--annotate_background_with_previous",
        "--sm_constrain_transitions",
        "--sm_constrain_with_narration", "train",
        "--sm_max_span_length", "10",
        "--epochs", "1",
        "--lr", "1e-2",
    ]
    args = main_mod.build_parser().parse_args(argv)
    # pick a victim actually IN the train split (constraints are globbed
    # from disk at GroundTruth construction, so remove before rebuild)
    train_data, _, _ = next(iter(main_mod.make_data_splits(args).values()))
    task, video = sorted(
        (t, v) for t, vids in train_data.videos_by_task.items() for v in vids
    )[0]
    victim = os.path.join(
        root, "crosstask", "crosstask_constraints", f"{task}_{video}.csv"
    )
    assert os.path.exists(victim)
    os.remove(victim)
    train_data, _, _ = next(iter(main_mod.make_data_splits(args).values()))
    model = SemiMarkovModel.from_args(args, train_data)
    assert model._get_resident(train_data, True) is None  # streams
    model.fit(train_data, use_labels=False)  # still trains fine
    assert model.predict(train_data)


def test_semimarkov_data_parallel_cli_pipeline(mini_crosstask):
    """--data_parallel through the REAL driver: main() wires the mesh
    train step (psum'd aux stats), the sharded decode inside predict,
    and the stat aggregation — the full train->test->aggregate path on
    the 8-device mesh, compared against the single-device run."""
    from action_segmentation_tpu import main as main_mod

    root, _ = mini_crosstask
    argv = _base_argv(root, "semimarkov") + [
        "--training", "supervised",
        "--sm_supervised_method", "gradient-based",
        "--lr", "1e-2",
    ]
    stats_dp = main_mod.main(argv + ["--data_parallel"])
    stats_sd = main_mod.main(argv)
    for task in stats_sd["all"]:
        for key in ("mof", "f1"):
            a = stats_dp["all"][task][key]
            b = stats_sd["all"][task][key]
            assert abs(a[0] / a[1] - b[0] / b[1]) < 0.05, (task, key, a, b)


def test_segmenter_on_constrained_model(mini_crosstask):
    """A canonical-ordering model served through api.Segmenter must use
    predict()'s per-video end masks (incl. the short-video exception) —
    without them, every end column on a short video is BIG_NEG and
    Viterbi argmaxes over saturated garbage. Segmenter therefore
    requires task= for such models and must match predict() exactly."""
    import pytest

    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.api import Segmenter
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    root, _ = mini_crosstask
    argv = _base_argv(root, "semimarkov") + [
        "--training", "unsupervised",
        "--sm_constrain_transitions",
        "--annotate_background_with_previous",
        "--epochs", "1",
        "--sm_max_span_length", "10",
    ]
    args = main_mod.build_parser().parse_args(argv)
    train_data, _, _ = next(iter(main_mod.make_data_splits(args).values()))
    model = SemiMarkovModel.from_args(args, train_data)
    model.fit(train_data, use_labels=False)
    assert model.module.allowed_ends is not None

    with pytest.raises(ValueError, match="task"):
        Segmenter(model)

    (task, video) = sorted(
        (t, v) for t, vids in train_data.videos_by_task.items() for v in vids
    )[0]
    sample = train_data[(task, video)]
    vc = np.asarray(sample["task_indices"], np.int64)
    seg = Segmenter(model, valid_classes=vc, task=task)
    want = model.predict(train_data)[video]

    # full-length video matches predict() frame for frame
    got = seg.segment(sample["features"])
    np.testing.assert_array_equal(got, want)

    # a SHORT clip (fewer frames than the canonical step sequence) must
    # return in-range labels, not BIG_NEG-saturated garbage
    n_steps = len(model.ordered_indices_by_task[task])
    assert n_steps > 2
    short = seg.segment(sample["features"][: n_steps - 1])
    assert ((short >= 0) & (short < model.n_classes)).all()
