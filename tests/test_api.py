"""Serving API test: train -> save -> Segmenter.load -> segment arrays."""

import pickle

import numpy as np

from action_segmentation_tpu.api import Segmenter
from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel
from tests.test_semimarkov_model import make_args


def test_segmenter_roundtrip(tmp_path):
    train = SyntheticDatasplit(num_videos=40, n_classes=3, max_len=40, span_k=5, seed=0)
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    path = str(tmp_path / "model.pkl")
    with open(path, "wb") as f:
        pickle.dump(model, f)

    seg = Segmenter.load(path)
    test = SyntheticDatasplit(num_videos=8, n_classes=3, max_len=40, span_k=5, seed=1)
    feats = []
    golds = []
    for name in sorted(test._samples):
        feats.append(test._samples[name]["features"])
        golds.append(test._samples[name]["gt_single"])
    preds = seg.segment_many(feats, batch_size=4)
    match = total = 0
    for p, g in zip(preds, golds):
        assert len(p) == len(g)
        match += int((p == g).sum())
        total += len(g)
    assert match / total > 0.7

    single = seg.segment(feats[0])
    np.testing.assert_array_equal(single, preds[0])


def test_segment_many_pipelined_matches_per_video():
    """The pipelined segment_many (async dispatch, labels on device,
    one stacked fetch — round-5 serving fix) returns exactly what
    per-video calls return, across mixed length buckets, partial final
    batches, and >16 in-flight batches (the backpressure point)."""
    train = SyntheticDatasplit(num_videos=40, n_classes=3, max_len=40, span_k=5, seed=0)
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    seg = Segmenter(model)

    rng = np.random.RandomState(3)
    test = SyntheticDatasplit(num_videos=37, n_classes=3, max_len=40, span_k=5, seed=1)
    feats = []
    for name in sorted(test._samples):
        f = test._samples[name]["features"]
        # mixed lengths spanning several pad buckets
        lo = min(8, f.shape[0])
        feats.append(f[: rng.randint(lo, f.shape[0] + 1)])

    # batch_size=2 over 37 videos -> 19 batches: crosses the 16-batch
    # backpressure fetch and ends on a partial batch
    preds = seg.segment_many(feats, batch_size=2)
    assert len(preds) == len(feats)
    for f, p in zip(feats, preds):
        assert p.shape == (f.shape[0],)
        np.testing.assert_array_equal(p, seg.segment(f))


def test_segment_with_marginals():
    train = SyntheticDatasplit(num_videos=40, n_classes=3, max_len=40, span_k=5, seed=0)
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    seg = Segmenter(model)

    test = SyntheticDatasplit(num_videos=2, n_classes=3, max_len=40, span_k=5, seed=1)
    feats = test._samples[sorted(test._samples)[0]]["features"]
    labels, marg = seg.segment_with_marginals(feats)
    assert labels.shape == (feats.shape[0],)
    assert marg.shape == (feats.shape[0], model.n_classes)
    # marginals are a distribution per frame...
    np.testing.assert_allclose(marg.sum(axis=1), 1.0, atol=1e-3)
    assert (marg >= -1e-5).all()
    # ...and agree with the decode on confident frames
    conf = marg.max(axis=1) > 0.9
    assert conf.any()
    assert (marg.argmax(axis=1)[conf] == labels[conf]).mean() > 0.95


def test_segment_with_marginals_subset_classes():
    """With a non-identity valid_classes subset, labels are global ids
    and marginals are indexed by global id too (subset columns scattered
    into an (T, n_classes) array)."""
    train = SyntheticDatasplit(num_videos=40, n_classes=4, max_len=40, span_k=5, seed=0)
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)

    subset = np.array([1, 3], np.int64)
    seg = Segmenter(model, valid_classes=subset)
    feats = train._samples[sorted(train._samples)[0]]["features"]
    labels, marg = seg.segment_with_marginals(feats)
    assert set(np.unique(labels)) <= set(subset.tolist())
    assert marg.shape == (feats.shape[0], model.n_classes)
    # mass only on the subset columns, still a distribution per frame
    off = np.setdiff1d(np.arange(model.n_classes), subset)
    assert np.abs(marg[:, off]).max() == 0.0
    np.testing.assert_allclose(marg.sum(axis=1), 1.0, atol=1e-3)
    # a second segmenter over the same model with the full class set
    # must not collide with the subset segmenter's cached program — a
    # collision would reuse the subset program and leave ZERO mass on
    # the off-subset columns, so shape alone cannot catch it
    seg_full = Segmenter(model)
    labels_f, marg_f = seg_full.segment_with_marginals(feats)
    assert marg_f.shape == (feats.shape[0], model.n_classes)
    assert np.abs(marg_f[:, off]).max() > 0.0, (
        "full-class marginals have no mass outside the subset — cached "
        "program collision"
    )
    np.testing.assert_allclose(marg_f.sum(axis=1), 1.0, atol=1e-3)
