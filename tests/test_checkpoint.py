"""Checkpoint/resume tests: orbax pytree checkpoints + warm-start subsets."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from action_segmentation_tpu import checkpoint as ckpt
from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel


from tests.conftest import make_sm_args


def make_args(**overrides):
    return make_sm_args(**overrides)


def test_orbax_roundtrip(tmp_path):
    params = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "nested": {"b": jnp.ones(4)},
    }
    args = make_args(sm_max_span_length=5)
    ckpt.save_orbax(params, args, 3, str(tmp_path / "ck"))
    assert ckpt.latest_step(str(tmp_path / "ck")) == 3
    restored, args_dict, step = ckpt.load_orbax(str(tmp_path / "ck"), target=params)
    assert step == 3
    assert args_dict["sm_max_span_length"] == 5
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]), np.ones(4))


def test_train_checkpoint_and_resume(tmp_path):
    train = SyntheticDatasplit(num_videos=20, n_classes=3, max_len=20, span_k=4, seed=0)
    ck_dir = str(tmp_path / "run")
    args = make_args(
        sm_max_span_length=8,
        sm_supervised_method="gradient-based",
        epochs=2,
        lr=1e-2,
        checkpoint_dir=ck_dir,
        checkpoint_every=1,
    )
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    assert ckpt.latest_step(ck_dir) == 1

    # resume: continue to more epochs without redoing earlier ones
    args2 = make_args(
        sm_max_span_length=8,
        sm_supervised_method="gradient-based",
        epochs=3,
        lr=1e-2,
        checkpoint_dir=ck_dir,
        checkpoint_every=1,
        resume=True,
    )
    model2 = SemiMarkovModel.from_args(args2, train)
    epochs_seen = []
    model2.fit(train, use_labels=True, callback_fn=lambda e, s: epochs_seen.append(e))
    assert epochs_seen == [2], epochs_seen  # only the resumed epoch runs
    assert ckpt.latest_step(ck_dir) == 2


def test_init_subset_from():
    params = {"a": jnp.zeros(3), "feature_projector": {"w": jnp.zeros(2)}}
    src = {"a": jnp.ones(3), "feature_projector": {"w": jnp.ones(2)}, "extra": jnp.ones(1)}
    out = ckpt.init_subset_from(params, src)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(3))
    np.testing.assert_array_equal(
        np.asarray(out["feature_projector"]["w"]), np.zeros(2)
    )
    assert "extra" not in out


def test_train_state_checkpoint_roundtrip(tmp_path):
    """Resume restores the FULL train state: params, Adam moments, and
    the plateau scheduler's live learning rate (a params-only restore
    silently resets optimizer state)."""
    import argparse

    import optax

    from action_segmentation_tpu import checkpoint as ckpt

    params = {
        "w": jnp.arange(6.0).reshape(2, 3),
        "b": jnp.ones(3),
    }
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    # take one update so the moments are nonzero
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    args = argparse.Namespace(lr=5e-3, foo="bar")
    d = str(tmp_path / "ck")
    ckpt.save_orbax(
        {"params": params, "opt_state": opt_state}, args, 3, d, lr=1e-3
    )

    target = {"params": jax.tree_util.tree_map(jnp.zeros_like, params),
              "opt_state": tx.init(jax.tree_util.tree_map(jnp.zeros_like, params))}
    state, args_dict, step = ckpt.load_orbax(d, target=target)
    assert step == 3
    for k in params:
        np.testing.assert_allclose(np.asarray(state["params"][k]), np.asarray(params[k]))
    got_mu = jax.tree_util.tree_leaves(state["opt_state"])
    want_mu = jax.tree_util.tree_leaves(opt_state)
    assert len(got_mu) == len(want_mu)
    for g, w in zip(got_mu, want_mu):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))
    meta = ckpt.load_meta(d, step)
    assert meta["lr"] == 1e-3


def test_import_reference_state_dict(tmp_path):
    """A reference-trained SemiMarkovModule state_dict (torch tensors,
    reference param names + constraint buffers) imports into a
    serving-ready model whose decode matches a natively-built module
    with the same weights."""
    import torch

    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter
    from action_segmentation_tpu.models.semimarkov import (
        semimarkov_from_reference_state_dict,
    )
    from tests.test_semimarkov_model import make_args

    C, D = 4, 6
    rng = np.random.RandomState(0)
    sd = {
        "poisson_log_rates": torch.tensor(rng.randn(C).astype(np.float32)),
        "gaussian_means": torch.tensor(rng.randn(C, D).astype(np.float32) * 2),
        "gaussian_cov": torch.tensor(np.abs(rng.randn(D)).astype(np.float32) + 0.5),
        "transition_logits": torch.tensor(rng.randn(C, C).astype(np.float32)),
        "init_logits": torch.tensor(rng.randn(C).astype(np.float32)),
        "init_constraints": torch.zeros(C),  # buffer: must be skipped
        "transition_constraints": torch.zeros(C, C),
    }
    sd_path = str(tmp_path / "ref_module.pt")
    torch.save(sd, sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main(["--state_dict", sd_path, "--output", out_path])

    seg = Segmenter.load(out_path)
    feats = rng.randn(30, D).astype(np.float32) + 0.5
    got = seg.segment(feats)

    # natively-built model with identical weights must decode identically
    args = make_args()
    native = semimarkov_from_reference_state_dict(
        args, {k: v.numpy() for k, v in sd.items()}
    )
    want = Segmenter(native).segment(feats)
    assert (got == want).all()
    assert got.shape == (30,)


def test_resume_restores_plateau_state(tmp_path):
    """Resume must restore the plateau controller's POST-step
    best/num_bad, not just the rate: a reset best=inf counts the next
    epoch as an improvement and skips a pending LR cut, silently
    diverging from the uninterrupted run's LR trajectory."""
    train = SyntheticDatasplit(num_videos=20, n_classes=3, max_len=20, span_k=4, seed=0)
    ck_dir = str(tmp_path / "run")
    common = dict(
        sm_max_span_length=8,
        sm_supervised_method="gradient-based",
        lr=1e-2,
        checkpoint_dir=ck_dir,
        checkpoint_every=1,
    )
    model = SemiMarkovModel.from_args(make_args(epochs=2, **common), train)
    model.fit(train, use_labels=True)
    step = ckpt.latest_step(ck_dir)
    meta = ckpt.load_meta(ck_dir, step)
    sched = meta["sched"]
    assert np.isfinite(sched["best"])  # a real epoch loss, not a reset

    # resume with epochs == step+1: the epoch loop body never runs, so
    # the scheduler state visible after fit IS the restored state
    args2 = make_args(epochs=step + 1, resume=True, **common)
    model2 = SemiMarkovModel.from_args(args2, train)
    model2.fit(train, use_labels=True)
    st = model2._scheduler.state
    assert float(st["lr"]) == sched["lr"]
    assert float(st["best"]) == sched["best"]
    assert int(st["num_bad"]) == sched["num_bad"]
