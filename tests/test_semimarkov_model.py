"""End-to-end learnability tests on synthetic data.

Mirrors the reference's test_learn_synthetic / predict_synthetic
(src/models/test_semimarkov.py:90-247): fit the HSMM on class-shifted
Gaussian features (closed form and gradient-based) and require high token
accuracy from Viterbi decoding.
"""

import argparse

import numpy as np
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel


from tests.conftest import make_sm_args


def make_args(**overrides):
    return make_sm_args(**overrides)


def token_accuracy(model, data):
    preds = model.predict(data)
    match = total = 0
    for name, pred in preds.items():
        gold = data.gt_single(name)
        assert len(pred) == len(gold)
        match += int((pred == gold).sum())
        total += len(gold)
    return match / total


@pytest.fixture(scope="module")
def toy_data():
    train = SyntheticDatasplit(num_videos=60, n_classes=3, max_len=40, span_k=5, seed=0)
    test = SyntheticDatasplit(num_videos=20, n_classes=3, max_len=40, span_k=5, seed=1)
    return train, test


def test_closed_form_supervised(toy_data):
    train, test = toy_data
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True, callback_fn=None)
    acc = token_accuracy(model, test)
    assert acc > 0.75, acc


def test_gradient_supervised(toy_data):
    train, test = toy_data
    args = make_args(
        sm_max_span_length=20,
        sm_supervised_method="gradient-based",
        epochs=3,
        lr=5e-2,
        batch_size=10,
    )
    model = SemiMarkovModel.from_args(args, train)
    losses = []
    model.fit(train, use_labels=True, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert losses[-1] < losses[0], losses
    acc = token_accuracy(model, test)
    assert acc > 0.7, acc


def test_unsupervised_improves_likelihood(toy_data):
    train, _ = toy_data
    args = make_args(
        sm_max_span_length=20, epochs=3, lr=5e-2, batch_size=10, training="unsupervised"
    )
    model = SemiMarkovModel.from_args(args, train)
    losses = []
    model.fit(train, use_labels=False, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert losses[-1] < losses[0], losses
    # decode still produces valid labels
    preds = model.predict(train)
    assert all(len(p) > 0 for p in preds.values())


def test_pickle_roundtrip(toy_data):
    import pickle

    train, test = toy_data
    args = make_args(sm_max_span_length=20)
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    blob = pickle.dumps(model)
    model2 = pickle.loads(blob)
    acc1 = token_accuracy(model, test)
    acc2 = token_accuracy(model2, test)
    assert abs(acc1 - acc2) < 1e-9


def test_pickle_does_not_mutate_live_module(toy_data):
    """__getstate__ converts params to numpy FOR THE PICKLE ONLY: a
    driver that saves and keeps decoding with the same model must not
    have its device-resident param leaves swapped for host numpy (that
    would re-upload every leaf per dispatch and drop dp shardings)."""
    import pickle

    import jax

    train, _ = toy_data
    args = make_args(sm_max_span_length=20)
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    leaves_before = jax.tree_util.tree_leaves(model.module.params)
    ids_before = [id(leaf) for leaf in leaves_before]
    types_before = [type(leaf) for leaf in leaves_before]
    pickle.dumps(model)
    leaves_after = jax.tree_util.tree_leaves(model.module.params)
    assert [id(leaf) for leaf in leaves_after] == ids_before
    assert [type(leaf) for leaf in leaves_after] == types_before


def test_refit_invalidates_stale_optimizer_programs(toy_data):
    """Cached jitted programs close over the optimizer; a second fit
    after mutating clip/plateau hyperparameters must rebuild them (and
    an unchanged second fit must NOT, or every fit would re-pay the
    compile)."""
    train, _ = toy_data
    args = make_args(
        sm_max_span_length=20,
        sm_supervised_method="gradient-based",
        epochs=1,
        lr=5e-2,
        batch_size=10,
    )
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    cached = dict(model._jit_cache)
    assert cached  # fit populated the program cache

    model.fit(train, use_labels=True)
    reused = set(cached) & set(model._jit_cache)
    assert reused
    for key in reused:
        assert model._jit_cache[key] is cached[key], key

    model.args.max_grad_norm = 0.5
    model.fit(train, use_labels=True)
    rebuilt = set(cached) & set(model._jit_cache)
    assert rebuilt
    for key in rebuilt:
        assert model._jit_cache[key] is not cached[key], key


def test_class_shape_bucket_parity():
    """Padding the valid-class set with -1 sentinels (shape bucketing,
    --sm_class_shape_bucket) must not change predictions or training
    losses: padded classes are exactly masked out of every softmax."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    def make_args(**overrides):
        return make_sm_args(batch_size=4, **overrides)

    data = SyntheticDatasplit(num_videos=9, n_classes=3, max_len=22, span_k=4, seed=2)

    preds = {}
    losses = {}
    for bucket in (1, 4, 7):
        args = make_args(
            sm_max_span_length=8,
            sm_supervised_method="gradient-based",
            epochs=2,
            lr=1e-2,
            sm_class_shape_bucket=bucket,
        )
        model = SemiMarkovModel.from_args(args, data)
        ls = []
        model.fit(data, use_labels=True, callback_fn=lambda e, s: ls.append(s["train_loss"]))
        losses[bucket] = ls
        preds[bucket] = model.predict(data)

    for bucket in (4, 7):
        assert np.allclose(losses[bucket], losses[1], rtol=1e-5, atol=1e-4), (
            bucket, losses[bucket], losses[1],
        )
        for video, want in preds[1].items():
            assert (preds[bucket][video] == want).all(), (bucket, video)
