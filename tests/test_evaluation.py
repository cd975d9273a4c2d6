"""Evaluation metrics unit tests (Accuracy / F1Score semantics)."""

import numpy as np

from action_segmentation_tpu.evaluation.accuracy import Accuracy, run_length_encode
from action_segmentation_tpu.evaluation.f1 import F1Score


class FakeCorpus:
    def __init__(self, background_indices=(0,), n=5):
        self._background_indices = list(background_indices)
        self.index2label = {i: str(i) for i in range(n)}


def make_acc(gt_videos, pred_videos, bkg=(0,)):
    acc = Accuracy(verbose=False, corpus=FakeCorpus(bkg))
    for gt, pred in zip(gt_videos, pred_videos):
        acc.add_gt_labels([[g] for g in gt])
        acc.add_predicted_labels(list(pred))
    return acc


def test_perfect_prediction_identity():
    gt = [[0, 1, 1, 2, 2, 0], [0, 2, 2, 1, 0, 0]]
    acc = make_acc(gt, gt)
    acc.mof(optimal_assignment=False, possible_gt_labels=[0, 1, 2])
    acc.mof_classes()
    acc.iou_classes()
    acc.levenshtein()
    acc.single_step_recall()
    s = acc.stat()
    assert s["mof"][0] / s["mof"][1] == 1.0
    assert s["mof_non_bg"][0] / s["mof_non_bg"][1] == 1.0
    assert s["f1"][0] == 1.0
    assert s["mean_normed_levenshtein"][0] == 0.0
    assert s["step_recall_non_bg"][0] == s["step_recall_non_bg"][1]
    # 5 background frames (2 + 3 zero labels) out of 12 total
    assert s["pred_background"][0] == 5 and s["pred_background"][1] == 12


def test_hungarian_remapping_recovers_permutation():
    gt = [[1, 1, 1, 2, 2, 2, 0, 0]]
    # predictions use permuted labels: 1<->2, bkg -> 0 stays
    pred = [[2, 2, 2, 1, 1, 1, 0, 0]]
    acc = make_acc(gt, pred)
    acc.mof(optimal_assignment=True, possible_gt_labels=[0, 1, 2])
    acc.mof_classes()
    s = acc.stat()
    assert s["mof"][0] / s["mof"][1] == 1.0
    assert acc._gt2cluster[1] == [2]
    assert acc._gt2cluster[2] == [1]


def test_levenshtein_counts_segment_edits():
    gt = [[1, 1, 2, 2, 0, 0]]
    pred = [[1, 1, 1, 1, 0, 0]]  # missing segment 2 -> 1 deletion
    acc = make_acc(gt, pred)
    acc.mof(optimal_assignment=False, possible_gt_labels=[0, 1, 2])
    acc.levenshtein()
    s = acc.stat()
    assert s["total_levenshtein"][0] == 1.0
    assert s["predicted_segments_per_video"][0] == 2
    assert s["predicted_segments_non_bg_per_video"][0] == 1


def test_multi_label_gt_frames():
    gt_multi = [[[1, 2], [1], [2], [0]]]
    pred = [[2, 1, 2, 0]]
    acc = Accuracy(verbose=False, corpus=FakeCorpus((0,)))
    acc.add_gt_labels(gt_multi[0])
    acc.add_predicted_labels(pred[0])
    acc.mof(optimal_assignment=False, possible_gt_labels=[0, 1, 2])
    acc.mof_classes()
    s = acc.stat()
    # frame 0: pred 2 matches one of {1, 2} -> true positive
    assert s["recall"][0] == 4  # all frames' preds are in their gt sets
    assert s["multiple_gt_labels"][0] == 1 and s["multiple_gt_labels"][1] == 4


def test_run_length_encode():
    assert run_length_encode([1, 1, 2, 2, 2, 0]) == [(1, 2), (2, 3), (0, 1)]
    assert run_length_encode([]) == []
    assert run_length_encode([5]) == [(5, 1)]


def test_f1_score_perfect():
    np.random.seed(0)
    gt = [[g] for g in [1, 1, 1, 2, 2, 2, 1, 1, 1]]
    pr = [1, 1, 1, 2, 2, 2, 1, 1, 1]
    f1 = F1Score(K=2, n_videos=1, verbose=False)
    f1.set_gt(gt)
    f1.set_pr(pr)
    f1.set_gt2pr({1: [1], 2: [2]})
    f1.f1()
    s = f1.stat()
    # reference quirk preserved: the final segment is dropped from
    # bound_masks, so recall denominator is 2 here
    assert s["recall"][1] == 2
    assert s["mean_f1"][0] > 0.99


def test_f1_broadcast_sampling_stream():
    """The vectorized F1 sampling relies on np.random.randint with
    broadcast bounds consuming the legacy RNG stream exactly like the
    reference's per-segment scalar calls (row-major, same bounded-draw
    algorithm). Pin that numpy contract."""
    import numpy as np

    lows = np.array([0, 7, 23, 100, 5, 1000])
    highs = np.array([5, 21, 59, 1000, 5, 1000])
    np.random.seed(123)
    scalar = np.stack(
        [np.random.randint(l, h + 1, 15) for l, h in zip(lows, highs)]
    )
    np.random.seed(123)
    broadcast = np.random.randint(
        lows[:, None], highs[:, None] + 1, size=(len(lows), 15)
    )
    assert (scalar == broadcast).all()


def test_empty_accumulator_mof_runs():
    """A task with zero scored videos (e.g. a CV split whose test half
    is empty, or comparison-only scoring) must not crash the metric
    pass — the reference's frame loop degenerates to zero iterations."""
    acc = make_acc([], [])
    acc.mof(optimal_assignment=False, possible_gt_labels=[0, 1, 2])
    acc.mof_classes()
    s = acc.stat()
    assert s["mof"][1] == 0
