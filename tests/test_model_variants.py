"""Coverage for model variants: HMM mode, warm-start, discriminative."""

import argparse
import pickle

import numpy as np
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel


def make_args(**overrides):
    from action_segmentation_tpu.models.base import add_training_args

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--annotate_background_with_previous", action="store_true")
    parser.add_argument("--no_merge_classes", action="store_true")
    args = parser.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def toy_data():
    train = SyntheticDatasplit(num_videos=30, n_classes=3, max_len=24, span_k=4, seed=0)
    test = SyntheticDatasplit(num_videos=10, n_classes=3, max_len=24, span_k=4, seed=1)
    return train, test


def _accuracy(model, data):
    preds = model.predict(data)
    match = total = 0
    for name, pred in preds.items():
        gold = data.gt_single(name)
        match += int((np.asarray(pred) == gold).sum())
        total += len(gold)
    return match / total


def test_hidden_markov_mode(toy_data):
    """--sm_max_span_length 1: every frame its own span (HMM); the
    reference's K=1 duration table special case (modules.py:389-391)."""
    train, test = toy_data
    args = make_args(sm_max_span_length=1, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    acc = _accuracy(model, test)
    assert acc > 0.6, acc


def test_discriminative_training(toy_data):
    train, test = toy_data
    args = make_args(
        sm_max_span_length=10,
        sm_supervised_method="gradient-based",
        sm_train_discriminatively=True,
        epochs=2,
        lr=5e-2,
    )
    model = SemiMarkovModel.from_args(args, train)
    losses = []
    model.fit(train, use_labels=True, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert losses[-1] < losses[0]
    assert _accuracy(model, test) > 0.6


def test_init_non_projection_parameters_from(toy_data, tmp_path):
    """Warm-start non-flow params from a serialized model
    (semimarkov_modules.py:90-94)."""
    train, _ = toy_data
    args = make_args(sm_max_span_length=10, sm_supervised_method="closed-form")
    base = SemiMarkovModel.from_args(args, train)
    base.fit(train, use_labels=True)
    path = str(tmp_path / "base.pkl")
    with open(path, "wb") as f:
        pickle.dump(base, f)

    args2 = make_args(
        sm_max_span_length=10,
        sm_feature_projection=True,
        flow_couple_layers=2,
        flow_hidden_units=8,
        sm_init_non_projection_parameters_from=path,
        epochs=0,
    )
    warm = SemiMarkovModel.from_args(args2, train)
    np.testing.assert_allclose(
        np.asarray(warm.module.params["gaussian_means"]),
        np.asarray(base.module.params["gaussian_means"]),
    )
    assert "feature_projector" in warm.module.params
