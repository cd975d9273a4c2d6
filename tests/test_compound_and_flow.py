"""Tests for the compound (neural) HSMM module and the NICE flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel
from action_segmentation_tpu.models import flow as nice_flow


from tests.conftest import make_sm_args


def make_args(**overrides):
    return make_sm_args(**overrides)


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


def _nice_invert(params, h):
    """Test-local inverse of nice_apply's coupling stack (reversed
    layer order; odd layers transform the FIRST half from the second)."""
    import jax.numpy as jnp

    half = h.shape[-1] // 2
    out = h
    scale_cells = params.get("scale_cells")
    for i in reversed(range(len(params["cells"]))):
        cell = params["cells"][i]
        h1, h2p = out[..., :half], out[..., half:]
        if i % 2 == 1:
            h1, h2p = h2p, h1
        t = nice_flow.relu_net_apply(cell, h1)
        if scale_cells is not None:
            s = nice_flow.relu_net_apply(scale_cells[i], h1)
            h2 = (h2p - t) * jnp.exp(-s)
        else:
            h2 = h2p - t
        if i % 2 == 1:
            h1, h2 = h2, h1
        out = jnp.concatenate([h1, h2], axis=-1)
    return out


def test_nice_flow_invertibility_props():
    """NICE couplings: additive log-det is exactly zero; zero-init scale
    cells reproduce the additive flow's h exactly (the coupling nets
    share the same key draws); and the flow is actually INVERTIBLE — a
    hand-written inverse round-trips x for both the additive and the
    affine (flow_scale_no_zero) variants. The earlier version asserted
    only log_det == 0 and discarded h (round-5 test review)."""

    class A:
        flow_hidden_layers = 1
        flow_hidden_units = 8
        flow_couple_layers = 4
        flow_scale = False
        flow_scale_no_zero = False

    rng = jax.random.PRNGKey(0)
    params = nice_flow.nice_init(rng, A(), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 8))
    h_add, log_det = nice_flow.nice_apply(params, x)
    assert h_add.shape == x.shape
    assert np.allclose(np.asarray(log_det), 0.0)
    np.testing.assert_allclose(
        np.asarray(_nice_invert(params, h_add)), np.asarray(x),
        rtol=1e-5, atol=1e-5,
    )

    A.flow_scale = True
    params = nice_flow.nice_init(rng, A(), 8)
    h, log_det = nice_flow.nice_apply(params, x)
    # zero-initialized scale nets: s = 0 -> log_det 0 AND h equals the
    # additive flow's output (identical coupling-net draws)
    assert np.allclose(np.asarray(log_det), 0.0)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(h_add), rtol=1e-6, atol=1e-6
    )

    # affine variant with LIVE scale nets: log-det nonzero, invertible
    A.flow_scale_no_zero = True
    params = nice_flow.nice_init(rng, A(), 8)
    h, log_det = nice_flow.nice_apply(params, x)
    assert np.abs(np.asarray(log_det)).max() > 0.0
    np.testing.assert_allclose(
        np.asarray(_nice_invert(params, h)), np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )


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
