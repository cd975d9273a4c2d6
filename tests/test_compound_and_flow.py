"""Tests for the compound (neural) HSMM module and the NICE flow."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel
from action_segmentation_tpu.models import flow as nice_flow


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
    train = SyntheticDatasplit(
        num_videos=30, n_classes=3, max_len=24, span_k=5, feature_dim=8, seed=0
    )
    return train


def test_component_model_trains(toy_data):
    args = make_args(
        sm_max_span_length=10,
        sm_component_model=True,
        sm_component_embedding_dim=16,
        epochs=2,
        lr=1e-2,
    )
    model = SemiMarkovModel.from_args(args, toy_data)
    losses = []
    model.fit(toy_data, use_labels=False, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    preds = model.predict(toy_data)
    assert all(len(p) > 0 for p in preds.values())


def test_component_model_with_vae_z(toy_data):
    args = make_args(
        sm_max_span_length=10,
        sm_component_model=True,
        sm_component_embedding_dim=16,
        sm_component_z_dim=4,
        sm_component_z_hidden_dim=16,
        epochs=1,
        lr=1e-2,
    )
    model = SemiMarkovModel.from_args(args, toy_data)
    losses = []
    model.fit(toy_data, use_labels=False, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert np.isfinite(losses).all()
    preds = model.predict(toy_data)
    assert all(len(p) > 0 for p in preds.values())


def test_flow_projector_trains(toy_data):
    args = make_args(
        sm_max_span_length=10,
        sm_feature_projection=True,
        flow_couple_layers=2,
        flow_hidden_units=16,
        sm_supervised_method="gradient-based",
        epochs=2,
        lr=1e-2,
    )
    model = SemiMarkovModel.from_args(args, toy_data)
    losses = []
    model.fit(toy_data, use_labels=True, callback_fn=lambda e, s: losses.append(s["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_nice_flow_invertibility_props():
    """Additive NICE couplings: log-det is exactly zero; with scale cells
    zero-initialized the flow starts at identity (flow.py:35-43)."""

    class A:
        flow_hidden_layers = 1
        flow_hidden_units = 8
        flow_couple_layers = 4
        flow_scale = False
        flow_scale_no_zero = False

    rng = jax.random.PRNGKey(0)
    params = nice_flow.nice_init(rng, A(), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 8))
    h, log_det = nice_flow.nice_apply(params, x)
    assert h.shape == x.shape
    assert np.allclose(np.asarray(log_det), 0.0)

    A.flow_scale = True
    params = nice_flow.nice_init(rng, A(), 8)
    h, log_det = nice_flow.nice_apply(params, x)
    # zero-initialized scale nets: s = 0 -> log_det 0, h = additive output
    assert np.allclose(np.asarray(log_det), 0.0)


def test_closed_then_gradient(toy_data):
    args = make_args(
        sm_max_span_length=10,
        sm_supervised_method="closed-then-gradient",
        epochs=1,
        lr=1e-3,
    )
    model = SemiMarkovModel.from_args(args, toy_data)
    calls = []
    model.fit(toy_data, use_labels=True, callback_fn=lambda e, s: calls.append(e))
    assert calls[0] == -1  # closed-form warm start callback
    assert len(calls) >= 2
