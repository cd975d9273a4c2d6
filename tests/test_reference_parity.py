"""Differential parity tests against the mounted reference implementation.

These import the reference's own evaluation / span-codec / sufficient-
statistics modules (pure numpy/torch/sklearn — its DP stack needs
torch-struct and is not runnable here) and compare their outputs with
ours on randomized inputs. They are skipped when the reference mount is
absent (e.g. a standalone checkout); our own behavior is pinned by the
rest of the suite.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    # the reference imports `editdistance` (a pip C++ package not installed
    # here); shim it with our native implementation
    from action_segmentation_tpu.evaluation import editdistance as our_ed

    shim = types.ModuleType("editdistance")
    shim.eval = our_ed.eval
    sys.modules.setdefault("editdistance", shim)
    sys.path.insert(0, REF)
    try:
        from evaluation import accuracy as ref_accuracy
        from evaluation import f1 as ref_f1
        from models.semimarkov import semimarkov_utils as ref_utils

        yield ref_accuracy, ref_f1, ref_utils
    finally:
        sys.path.remove(REF)


class FakeCorpus:
    def __init__(self, background_indices, n):
        self._background_indices = list(background_indices)
        self.index2label = {i: str(i) for i in range(n)}


def random_videos(rng, n_videos, n_classes, with_permutation=False):
    gts, preds = [], []
    perm = rng.permutation(n_classes) if with_permutation else np.arange(n_classes)
    for _ in range(n_videos):
        T = rng.randint(10, 40)
        gt = []
        t = 0
        while t < T:
            c = int(rng.randint(n_classes))
            d = int(rng.randint(1, 6))
            gt.extend([c] * min(d, T - t))
            t += d
        pred = [
            int(perm[g]) if rng.rand() > 0.25 else int(rng.randint(n_classes))
            for g in gt
        ]
        gts.append([[g] for g in gt])
        preds.append(pred)
    return gts, preds


@pytest.mark.parametrize("optimal", [False, True])
def test_accuracy_parity(ref_modules, optimal):
    ref_accuracy, _, _ = ref_modules
    from action_segmentation_tpu.evaluation.accuracy import Accuracy

    rng = np.random.RandomState(0 if optimal else 1)
    n_classes = 5
    gts, preds = random_videos(rng, 6, n_classes, with_permutation=optimal)

    ours = Accuracy(verbose=False, corpus=FakeCorpus([0], n_classes))
    refs = ref_accuracy.Accuracy(verbose=False, corpus=FakeCorpus([0], n_classes))
    for gt, pred in zip(gts, preds):
        ours.add_gt_labels(gt)
        ours.add_predicted_labels(list(pred))
        refs.add_gt_labels(gt)
        refs.add_predicted_labels(list(pred))

    possible = list(range(n_classes))
    ours.mof(optimal, possible_gt_labels=possible)
    refs.mof(optimal, possible_gt_labels=possible)
    ours.mof_classes()
    refs.mof_classes()
    ours.iou_classes()
    refs.iou_classes()
    ours.levenshtein()
    refs.levenshtein()
    np.random.seed(7)
    ours.single_step_recall()
    np.random.seed(7)
    refs.single_step_recall()

    ref_stats = refs.stat()
    our_stats = ours.stat()
    for key, ref_val in ref_stats.items():
        assert key in our_stats, key
        np.testing.assert_allclose(
            np.asarray(our_stats[key], float),
            np.asarray(ref_val, float),
            rtol=1e-9,
            err_msg=key,
        )


def test_f1_score_parity(ref_modules):
    _, ref_f1, _ = ref_modules
    from action_segmentation_tpu.evaluation.f1 import F1Score

    rng = np.random.RandomState(2)
    gt = []
    t = 0
    while t < 120:
        c = int(rng.randint(3))
        d = int(rng.randint(3, 9))
        gt.extend([c] * d)
        t += d
    pred = [g if rng.rand() > 0.2 else int(rng.randint(3)) for g in gt]
    gt2pr = {0: [0], 1: [1], 2: [2]}

    ours = F1Score(K=3, n_videos=1, verbose=False)
    refs = ref_f1.F1Score(K=3, n_videos=1, verbose=False)
    for f1 in (ours, refs):
        f1.set_gt([[g] for g in gt])
        f1.set_pr(list(pred))
        f1.set_gt2pr(gt2pr)
    # the reference uses np.random.random_integers (inclusive); ours uses
    # randint(low, high+1) — same distribution, same consumption pattern
    np.random.seed(11)
    ours.f1()
    np.random.seed(11)
    refs.f1()
    for key in ("precision", "recall"):
        np.testing.assert_allclose(
            np.asarray(ours.stat()[key], float),
            np.asarray(refs.stat()[key], float),
            rtol=1e-6,
            err_msg=key,
        )
    np.testing.assert_allclose(
        ours.stat()["mean_f1"][0], refs.stat()["mean_f1"][0], rtol=1e-6
    )


def test_span_codec_parity(ref_modules):
    import torch

    _, _, ref_utils = ref_modules
    from action_segmentation_tpu.ops.span_codec import (
        labels_to_spans_np,
        rle_spans,
        spans_to_labels,
    )

    rng = np.random.RandomState(3)
    for max_k in [2, 3, 5, 20, None]:
        labels = rng.randint(0, 4, size=(5, 31))
        ref_spans = ref_utils.labels_to_spans(
            torch.from_numpy(labels).long(), max_k=max_k
        ).numpy()
        our_spans = labels_to_spans_np(labels, max_k)
        assert (our_spans == ref_spans).all(), max_k

        back_ref = ref_utils.spans_to_labels(torch.from_numpy(ref_spans)).numpy()
        back_ours = np.asarray(spans_to_labels(our_spans))
        assert (back_ours == back_ref).all()

        lengths = rng.randint(5, 31, size=5)
        ref_rle = ref_utils.rle_spans(
            torch.from_numpy(ref_spans), torch.from_numpy(lengths)
        )
        our_rle = rle_spans(our_spans, lengths)
        assert our_rle == ref_rle


def test_sufficient_stats_parity(ref_modules):
    import torch

    _, _, ref_utils = ref_modules
    from action_segmentation_tpu.ops.stats import semimarkov_sufficient_stats

    rng = np.random.RandomState(4)
    n_classes, D = 4, 6
    features, labels = [], []
    for _ in range(5):
        T = rng.randint(8, 25)
        lab = rng.randint(0, n_classes, size=T)
        features.append(rng.randn(T, D).astype(np.float64))
        labels.append(lab)

    got = semimarkov_sufficient_stats(features, labels, n_classes, max_k=5)
    gmm, want = ref_utils.semimarkov_sufficient_stats(
        [torch.from_numpy(f) for f in features],
        [torch.from_numpy(l).long() for l in labels],
        covariance_type="tied_diag",
        n_classes=n_classes,
        max_k=5,
    )
    for key in (
        "span_counts",
        "span_lengths",
        "span_start_counts",
        "span_transition_counts",
    ):
        np.testing.assert_allclose(got[key], want[key], err_msg=key)
    assert got["instance_count"] == want["instance_count"]
    np.testing.assert_allclose(got["gaussian_means"], gmm.means_, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        got["gaussian_cov"], gmm.covariances_[0], rtol=1e-5, atol=1e-7
    )


def test_flag_name_parity_with_reference():
    """Every flag declared (uncommented) in the reference's argparse
    surface is accepted by our CLI parser. Flags that exist only in
    commented-out reference code are excluded by construction (the scan
    skips comment lines)."""
    import re

    from action_segmentation_tpu import main as main_mod

    ref_files = [
        "main.py",
        "models/model.py",
        "models/flow.py",
        "models/framewise.py",
        "models/sequential.py",
        "models/semimarkov/semimarkov.py",
        "models/semimarkov/semimarkov_modules.py",
    ]
    pat = re.compile(r"add_argument\(\s*['\"](--[\w-]+)")
    ref_flags = set()
    for rel in ref_files:
        path = os.path.join(REF, rel)
        for line in open(path):
            stripped = line.lstrip()
            if stripped.startswith("#"):
                continue
            for m in pat.finditer(line):
                ref_flags.add(m.group(1))
    assert len(ref_flags) > 40, ref_flags  # sanity: the scan found the surface

    parser = main_mod.build_parser()
    ours = set()
    for action in parser._actions:
        ours.update(action.option_strings)

    # deliberate deltas, documented in PARITY.md
    known_absent = {
        "--cuda",  # device selection is implicit on TPU (PARITY.md)
    }
    missing = ref_flags - ours - known_absent
    assert not missing, sorted(missing)


@pytest.mark.parametrize("cov_type", ["full", "tied"])
def test_gmm_full_covariance_parity(ref_modules, cov_type):
    """--gm_covariance full / tied: our moments match the sklearn
    GaussianMixture the reference builds (semimarkov_utils.py:74-80),
    and our full-covariance emission log-probs match sklearn's
    _estimate_log_prob on the same model."""
    import jax.numpy as jnp
    import torch

    _, _, ref_utils = ref_modules
    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs_fullcov,
    )
    from action_segmentation_tpu.ops.stats import semimarkov_sufficient_stats

    rng = np.random.RandomState(6)
    n_classes, D = 4, 6
    features, labels = [], []
    for _ in range(6):
        T = rng.randint(10, 30)
        labels.append(rng.randint(0, n_classes, size=T))
        features.append(rng.randn(T, D).astype(np.float64))

    got = semimarkov_sufficient_stats(
        features, labels, n_classes, max_k=5, covariance_type=cov_type
    )
    gmm, _ = ref_utils.semimarkov_sufficient_stats(
        [torch.from_numpy(f) for f in features],
        [torch.from_numpy(l).long() for l in labels],
        covariance_type=cov_type,
        n_classes=n_classes,
        max_k=5,
    )
    key = "gaussian_cov_full" if cov_type == "full" else "gaussian_cov_tied"
    np.testing.assert_allclose(
        got[key], gmm.covariances_, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        got["gaussian_means"], gmm.means_, rtol=1e-5, atol=1e-7
    )

    X = rng.randn(50, D)
    ours = np.asarray(
        gaussian_emission_log_probs_fullcov(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(got["gaussian_means"]),
            jnp.asarray(got[key]),
        )
    )
    want = gmm._estimate_log_prob(X)  # per-class log N(x; mu_c, Sigma_c)
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)
