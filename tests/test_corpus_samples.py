"""Sample-assembly unit tests for Datasplit.__getitem__.

CrossTask narration-constraint matrices are built at the annotation
length (crosstask.py get_T/read_assignment), which may overhang or
undershoot the feature count within the 50-frame mismatch tolerance
(corpus.py FEATURE_LABEL_MISMATCH_TOLERANCE). Every constraint row must
stay aligned with its frame through truncation/zero-padding and
subsampling, and the collated batch must be shape-consistent — the
reference neither cut nor subsampled constraints (reference
corpus.py:333-355), so a mismatched video crashed its forward on shape
grounds; alignment-to-the-frame-plan is the documented fix-forward.
"""

import numpy as np

from action_segmentation_tpu.data.batching import collate
from action_segmentation_tpu.data.corpus import Datasplit, Video


class _ArrayVideo(Video):
    def __init__(self, feats, **kw):
        self._feats = np.asarray(feats, np.float32)
        super().__init__(
            feature_root=None, K=3, remove_background=False, **kw
        )

    def load_features(self):
        return self._feats


class _FakeCorpus:
    _background_indices = [0]

    def indices_by_task(self, task):
        return [0, 1, 2]


class _OneTaskSplit(Datasplit):
    def __init__(self, videos, subsample=1):
        self._init_videos = videos
        super().__init__(
            _FakeCorpus(), remove_background=False, subsample=subsample
        )

    def _load_ground_truth_and_videos(self, remove_background):
        self.groundtruth = object()
        self._videos_by_task = {"t": {v.name: v for v in self._init_videos}}
        self._K_by_task = {"t": 3}


def _mk_video(n_feat, n_cons, name, seed=0):
    rng = np.random.RandomState(seed)
    gt = [[1]] * n_feat
    cons = rng.rand(n_cons, 3).astype(np.float32)
    return _ArrayVideo(
        rng.randn(n_feat, 4).astype(np.float32),
        gt=gt,
        gt_with_background=[g[0] for g in gt],
        name=name,
        constraints=cons,
    )


def test_constraints_overhang_truncated_to_feature_frames():
    v = _mk_video(100, 130, "over")
    split = _OneTaskSplit([v])
    s = split[("t", "over")]
    assert s["features"].shape[0] == 100
    assert s["constraints"].shape == (100, 3)
    # rows are the FIRST 100 annotation rows, frame-aligned
    np.testing.assert_array_equal(s["constraints"], v._constraints[:100])


def test_constraints_undershoot_zero_padded():
    v = _mk_video(100, 80, "under")
    split = _OneTaskSplit([v])
    s = split[("t", "under")]
    assert s["constraints"].shape == (100, 3)
    np.testing.assert_array_equal(s["constraints"][:80], v._constraints)
    # zero rows = no narration penalty for unannotated frames
    assert (s["constraints"][80:] == 0).all()


def test_constraints_subsample_uses_feature_indices():
    """One index set (arange(n_feat // s) * s, reference
    corpus.py:335-341) subsamples features, labels, AND constraints, so
    the streams stay frame-aligned even when the raw constraint matrix
    overhangs the features."""
    v = _mk_video(101, 130, "sub")
    split = _OneTaskSplit([v], subsample=7)
    s = split[("t", "sub")]
    idx = np.arange(101 // 7) * 7
    assert s["features"].shape[0] == len(idx)
    assert s["gt_single"].shape[0] == len(idx)
    assert s["constraints"].shape == (len(idx), 3)
    np.testing.assert_array_equal(s["constraints"], v._constraints[idx])
    # the collated batch is shape-consistent
    batch = collate([s])
    assert batch["constraints"].shape[1] == batch["features"].shape[1]


def test_mixed_mismatch_batch_collates():
    vids = [_mk_video(100, 130, "a", 1), _mk_video(90, 70, "b", 2)]
    split = _OneTaskSplit(vids, subsample=3)
    samples = [split[("t", v.name)] for v in vids]
    batch = collate(samples)
    assert batch["features"].shape[0] == 2
    assert batch["constraints"].shape[:2] == batch["features"].shape[:2]
    np.testing.assert_array_equal(
        batch["lengths"], [100 // 3, 90 // 3]
    )


def test_gt_subsample_uses_feature_indices_no_background_export():
    """With features exported without background frames
    (features_contain_background=False) the label stream defines the
    frame plan and features are NOT cut, so gt can overhang the export
    count (within the 50-frame tolerance). Subsampling must index gt by
    the FEATURE-derived index set (reference corpus.py:335-341), not by
    gt's own length, or the two streams collate at different lengths."""
    rng = np.random.RandomState(3)
    n_feat, n_gt = 96, 120
    gt = [[1]] * n_gt
    v = _ArrayVideo(
        rng.randn(n_feat, 4).astype(np.float32),
        gt=gt,
        gt_with_background=[g[0] for g in gt],
        name="nobkg",
        features_contain_background=False,
    )
    split = _OneTaskSplit([v], subsample=5)
    s = split[("t", "nobkg")]
    idx = np.arange(n_feat // 5) * 5
    assert s["features"].shape[0] == len(idx)
    assert s["gt_single"].shape[0] == len(idx)
    np.testing.assert_array_equal(
        s["gt_single"], np.asarray([g[0] for g in gt], np.int64)[idx]
    )
    batch = collate([s])
    assert batch["gt_single"].shape[1] == batch["features"].shape[1]
