"""Coverage for model variants: HMM mode, warm-start, discriminative."""

import argparse
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel


from tests.conftest import make_sm_args


def make_args(**overrides):
    return make_sm_args(**overrides)


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


def test_hidden_markov_flag_fixes_k1():
    """--sm_hidden_markov degrades the HSMM to an HMM (K=1), as the
    reference's help text promises (its implementation never wired the
    flag)."""
    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    data = SyntheticDatasplit(num_videos=8, n_classes=3, max_len=20, span_k=4, seed=0)
    args = make_args(sm_max_span_length=8, sm_hidden_markov=True)
    model = SemiMarkovModel.from_args(args, data)
    assert model.module.max_k == 1
    model.fit_supervised(data)
    preds = model.predict(data)
    assert len(preds) == 8


def test_gm_covariance_all_types():
    """All four --gm_covariance choices of the reference
    (framewise.py:198) fit and predict: per-class diagonal, per-class
    full, and shared full covariances."""
    import argparse

    import pytest

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.framewise import FramewiseGaussianMixture

    def gm_args(cov):
        parser = argparse.ArgumentParser()
        FramewiseGaussianMixture.add_args(parser)
        add_training_args(parser)
        parser.add_argument("--batch_size", type=int, default=4)
        args = parser.parse_args([])
        args.gm_covariance = cov
        return args

    data = SyntheticDatasplit(
        num_videos=30, n_classes=3, max_len=24, span_k=4, feature_dim=8, seed=0
    )
    want_ndim = {"tied_diag": 1, "diag": 2, "full": 3, "tied": 2}
    for cov_type, ndim in want_ndim.items():
        model = FramewiseGaussianMixture.from_args(gm_args(cov_type), data)
        model.fit(data, use_labels=True)
        assert model.cov.ndim == ndim, cov_type
        if cov_type == "full":
            assert model.cov.shape[0] == 3  # per-class matrices
        preds = model.predict(data)
        match = total = 0
        for name, pred in preds.items():
            gold = data.gt_single(name)
            match += int((np.asarray(pred) == gold).sum())
            total += len(gold)
        assert match / total > 0.6, (cov_type, match / total)


def test_compound_z_padding_invariant():
    """The latent z (and hence potentials/KL) must not depend on how much
    padding a video's batch carries: the encoder pools with a masked max
    and the flow log-det is masked to real frames."""
    import jax

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    data = SyntheticDatasplit(
        num_videos=6, n_classes=3, max_len=20, span_k=4, feature_dim=8, seed=0
    )
    args = make_args(
        sm_max_span_length=8,
        sm_component_model=True,
        sm_component_embedding_dim=16,
        sm_component_z_dim=8,
        sm_feature_projection=True,
        flow_scale=True,
    )
    model = SemiMarkovModel.from_args(args, data)
    module = model.module

    rng = np.random.RandomState(0)
    T_real = 14
    feats = rng.randn(1, T_real, data.feature_dim).astype(np.float32)
    lengths = np.array([T_real], np.int32)
    C = model.n_classes
    vc = np.arange(C, dtype=np.int32)

    outs = {}
    for T_pad in (T_real, T_real + 18):
        f = np.zeros((1, T_pad, data.feature_dim), np.float32)
        f[:, :T_real] = feats
        cons = np.zeros((1, T_pad, C), np.float32)
        end = np.zeros((1, C), np.float32)
        pots, log_det, kl = module.compute_potentials(
            module.params,
            jnp.asarray(f),
            jnp.asarray(lengths),
            jnp.asarray(vc),
            jnp.asarray(cons),
            jnp.asarray(end),
            jax.random.PRNGKey(0),
            use_mean_z=True,
        )
        outs[T_pad] = (
            np.asarray(log_det),
            np.asarray(kl),
            np.asarray(pots.trans),
            np.asarray(pots.emit)[:, :T_real],
        )
    a, b = outs[T_real], outs[T_real + 18]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-5)
