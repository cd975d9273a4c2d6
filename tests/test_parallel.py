"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates that the full data-parallel sharded training step compiles
and executes, and that the graft-entry dry run passes for several
device counts. (Class-table tensor parallelism was retired in round 3;
model_parallel > 1 raises — see parallel/mesh.py.)
"""

import numpy as np

from tests.conftest import make_sm_args
import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_entry_forward_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_data_parallel_fit_matches_single_device():
    """SemiMarkovModel.fit with --data_parallel reproduces the
    single-device loss trajectory (weighted-mean padding, psum grads)."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    def make_args(**overrides):
        return make_sm_args(batch_size=6, **overrides)

    train = SyntheticDatasplit(num_videos=13, n_classes=3, max_len=20, span_k=4, seed=0)

    losses = {}
    for dp in (False, True):
        args = make_args(
            sm_max_span_length=8,
            sm_supervised_method="gradient-based",
            epochs=2,
            lr=1e-2,
            data_parallel=dp,
        )
        model = SemiMarkovModel.from_args(args, train)
        ls = []
        model.fit(train, use_labels=True, callback_fn=lambda e, s: ls.append(s["train_loss"]))
        losses[dp] = ls
        assert ls[-1] < ls[0]
    assert abs(losses[True][0] - losses[False][0]) < 1e-2, losses
    assert abs(losses[True][-1] - losses[False][-1]) < 0.1, losses


def test_sharded_matches_single_device():
    """Sharded train step produces the same loss as the unsharded one."""
    import argparse

    import jax.numpy as jnp

    from action_segmentation_tpu.models.base import add_training_args, make_optimizer
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm, SemiMarkovModel
    from action_segmentation_tpu.parallel.mesh import (
        build_sharded_train_step,
        make_mesh,
        shard_shared_inputs,
        shard_train_inputs,
    )

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    args = parser.parse_args([])
    C, D, B, T = 6, 16, 8, 48
    module = GaussianHsmm(args, C, D, allow_self_transitions=True, seed=0)
    key = jax.random.PRNGKey(0)
    module.params["gaussian_means"] = jax.random.normal(key, (C, D)) * 0.1

    tx, _ = make_optimizer(args)
    opt_state = tx.init(module.params)
    rng = np.random.RandomState(0)
    features = rng.randn(B, T, D).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    gt = rng.randint(0, C, size=(B, T)).astype(np.int64)
    cons = np.zeros((B, T, C), np.float32)
    end_allowed = np.zeros((B, C), np.float32)
    vc = np.arange(C, dtype=np.int32)
    inv_map = np.arange(C, dtype=np.int32)

    weights = np.ones(B, np.float32)
    losses = {}
    for mp in (1,):
        mesh = make_mesh(8, model_parallel=mp)
        with mesh:
            step = build_sharded_train_step(module, tx, mesh, use_labels=True)
            params, opt, placed = shard_train_inputs(
                mesh, module.params, opt_state,
                [features, lengths, gt, cons, end_allowed, weights],
            )
            s_vc, s_inv = shard_shared_inputs(mesh, vc, inv_map)
            b_feat, b_len, b_gt, b_cons, b_end, b_w = placed
            _, _, loss, _, _ = step(
                params, opt, b_feat, b_len, s_vc, s_inv, b_gt, b_cons, b_end, b_w,
                5e-3, jax.random.PRNGKey(0),
            )
            losses[mp] = float(loss)

    # retired tensor-parallel axis fails loudly, not silently
    import pytest

    with pytest.raises(NotImplementedError):
        make_mesh(8, model_parallel=2)

    # single-device reference
    from action_segmentation_tpu.ops.hsmm import hsmm_gold_score
    from action_segmentation_tpu.ops.span_codec import labels_to_spans

    pots, log_det, _ = module.compute_potentials(
        module.params,
        jnp.asarray(features),
        jnp.asarray(lengths),
        jnp.asarray(vc),
        jnp.asarray(cons),
        jnp.asarray(end_allowed),
        jax.random.PRNGKey(0),
        use_mean_z=True,
    )
    spans = labels_to_spans(jnp.asarray(inv_map)[jnp.asarray(gt)], module.max_k)
    want = float(
        -(hsmm_gold_score(pots, jnp.asarray(lengths), spans).mean()) - log_det.mean()
    )
    for mp, loss in losses.items():
        assert abs(loss - want) < 1e-2, (mp, loss, want)


def test_data_parallel_predict_matches_single_device():
    """SemiMarkovModel.predict with --data_parallel shards decode over
    the mesh and must produce exactly the single-device labels (padding
    rows dropped, weighted batches resharded)."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    def make_args(**overrides):
        return make_sm_args(batch_size=5, **overrides)

    data = SyntheticDatasplit(num_videos=11, n_classes=3, max_len=24, span_k=4, seed=1)

    preds = {}
    for dp in (False, True):
        args = make_args(sm_max_span_length=8, epochs=1, data_parallel=dp)
        model = SemiMarkovModel.from_args(args, data)
        model.fit_supervised(data)
        preds[dp] = model.predict(data)

    assert set(preds[True]) == set(preds[False])
    for video, want in preds[False].items():
        got = preds[True][video]
        assert got.shape == want.shape, video
        assert (got == want).all(), video


def test_data_parallel_discriminative_matches_single_device():
    """--sm_train_discriminatively must train the same objective under
    --data_parallel (gold score MINUS partition; the sharded step
    previously silently dropped the partition term)."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    def make_args(**overrides):
        return make_sm_args(batch_size=4, **overrides)

    train = SyntheticDatasplit(num_videos=8, n_classes=3, max_len=18, span_k=4, seed=3)
    losses = {}
    for dp in (False, True):
        args = make_args(
            sm_max_span_length=6,
            sm_supervised_method="gradient-based",
            sm_train_discriminatively=True,
            epochs=1,
            lr=1e-2,
            data_parallel=dp,
        )
        model = SemiMarkovModel.from_args(args, train)
        ls = []
        model.fit(train, use_labels=True, callback_fn=lambda e, s: ls.append(s["train_loss"]))
        losses[dp] = ls[0]
    # discriminative loss is -log p(y|x) <= ~0 magnitude, very unlike the
    # generative NLL; the two paths must agree
    assert abs(losses[True] - losses[False]) < 1e-2, losses


def test_sharded_decode_pallas_interpret(monkeypatch):
    """The packed Pallas decode must compose with shard_map — this is
    the path real multi-chip TPUs take, while CPU tests otherwise fall
    to the jnp branch. Force the Pallas labels decode (interpret mode)
    inside build_sharded_decode_step on the 8-device mesh and compare
    with the single-device jnp decode."""
    import argparse
    import functools

    import jax.numpy as jnp

    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm, SemiMarkovModel
    from action_segmentation_tpu.ops import hsmm_pallas as hp
    from action_segmentation_tpu.ops.hsmm import hsmm_viterbi
    from action_segmentation_tpu.ops.span_codec import spans_to_labels
    from action_segmentation_tpu.parallel.mesh import (
        build_sharded_decode_step,
        make_mesh,
        shard_shared_inputs,
        shard_train_inputs,
    )

    monkeypatch.setattr(hp, "pallas_supported", lambda n: True)
    monkeypatch.setattr(
        hp,
        "hsmm_viterbi_labels_pallas",
        functools.partial(hp.hsmm_viterbi_labels_pallas.__wrapped__, interpret=True)
        if hasattr(hp.hsmm_viterbi_labels_pallas, "__wrapped__")
        else functools.partial(hp.hsmm_viterbi_labels_pallas, interpret=True),
    )

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    args = parser.parse_args([])
    C, D, B, T = 5, 12, 8, 32
    module = GaussianHsmm(args, C, D, allow_self_transitions=True, seed=0)
    key = jax.random.PRNGKey(0)
    module.params["gaussian_means"] = jax.random.normal(key, (C, D)) * 0.1

    rng = np.random.RandomState(0)
    features = rng.randn(B, T, D).astype(np.float32)
    lengths = np.concatenate([np.full(B - 2, T), [T - 5, T - 9]]).astype(np.int32)
    cons = np.zeros((B, T, C), np.float32)
    end_allowed = np.zeros((B, C), np.float32)
    vc = np.arange(C, dtype=np.int32)
    inv_map = np.arange(C, dtype=np.int32)
    weights = np.ones(B, np.float32)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        decode = build_sharded_decode_step(module, mesh, n_classes=C)
        params, _, placed = shard_train_inputs(
            mesh, module.params, None,
            [features, lengths, np.zeros((B, T), np.int64), cons, end_allowed, weights],
        )
        s_vc, _ = shard_shared_inputs(mesh, vc, inv_map)
        b_feat, b_len, _, b_cons, b_end, _ = placed
        labels, scores = decode(
            params, b_feat, b_len, s_vc, b_cons, b_end, jax.random.PRNGKey(0)
        )
    labels = np.asarray(labels)
    scores = np.asarray(scores)

    pots, _, _ = module.compute_potentials(
        module.params, jnp.asarray(features), jnp.asarray(lengths),
        jnp.asarray(vc), jnp.asarray(cons), jnp.asarray(end_allowed),
        jax.random.PRNGKey(0), use_mean_z=True,
    )
    spans, want_scores = hsmm_viterbi(pots, jnp.asarray(lengths))
    want = np.asarray(spans_to_labels(spans))
    np.testing.assert_allclose(scores, np.asarray(want_scores), rtol=1e-5, atol=1e-3)
    for b in range(B):
        L = int(lengths[b])
        assert (labels[b, :L] == want[b, :L]).all(), b


def test_sharded_train_pallas_interpret(monkeypatch):
    """The custom-VJP Pallas partition must compose with shard_map +
    value_and_grad — the exact path a real multi-chip TPU runs for
    *training* (parallel/mesh.py selects hsmm_partition_fast inside the
    dp-only shard_map when pallas_supported). CPU tests otherwise take
    the jnp branch, so force the Pallas forward/backward in interpret
    mode and assert the sharded step's loss AND updated parameters match
    a single-device step built on the jnp partition."""
    import argparse
    import functools

    import jax.numpy as jnp

    from action_segmentation_tpu.models.base import (
        add_training_args,
        apply_lr,
        make_optimizer,
    )
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm, SemiMarkovModel
    from action_segmentation_tpu.ops import hsmm_grad as hg
    from action_segmentation_tpu.ops import hsmm_pallas as hp
    from action_segmentation_tpu.ops.hsmm import hsmm_partition
    from action_segmentation_tpu.parallel.mesh import (
        build_sharded_train_step,
        make_mesh,
        shard_shared_inputs,
        shard_train_inputs,
    )

    monkeypatch.setattr(hp, "pallas_supported", lambda n: True)
    monkeypatch.setattr(
        hg,
        "hsmm_partition_fast",
        functools.partial(hg.hsmm_partition_fast, interpret=True),
    )

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    args = parser.parse_args([])
    C, D, B, T = 5, 12, 8, 32
    module = GaussianHsmm(args, C, D, allow_self_transitions=True, seed=0)
    key = jax.random.PRNGKey(0)
    module.params["gaussian_means"] = jax.random.normal(key, (C, D)) * 0.1

    tx, _ = make_optimizer(args)
    opt_state = tx.init(module.params)
    rng = np.random.RandomState(0)
    features = rng.randn(B, T, D).astype(np.float32)
    lengths = np.concatenate([np.full(B - 2, T), [T - 5, T - 9]]).astype(np.int32)
    gt = np.zeros((B, T), np.int64)
    cons = np.zeros((B, T, C), np.float32)
    end_allowed = np.zeros((B, C), np.float32)
    vc = np.arange(C, dtype=np.int32)
    inv_map = np.arange(C, dtype=np.int32)
    weights = np.ones(B, np.float32)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        # unsupervised: the loss runs partition_fn (= the forced Pallas
        # custom-VJP) under value_and_grad inside shard_map
        step = build_sharded_train_step(module, tx, mesh, use_labels=False)
        params, opt, placed = shard_train_inputs(
            mesh, module.params, opt_state,
            [features, lengths, gt, cons, end_allowed, weights],
        )
        s_vc, s_inv = shard_shared_inputs(mesh, vc, inv_map)
        b_feat, b_len, b_gt, b_cons, b_end, b_w = placed
        new_params, _, loss, aux, gnorm = step(
            params, opt, b_feat, b_len, s_vc, s_inv, b_gt, b_cons, b_end, b_w,
            5e-3, jax.random.PRNGKey(0),
        )
    loss = float(loss)

    # single-device reference on the jnp partition
    def ref_loss(p):
        pots, log_det, _ = module.compute_potentials(
            p, jnp.asarray(features), jnp.asarray(lengths), jnp.asarray(vc),
            jnp.asarray(cons), jnp.asarray(end_allowed),
            jax.random.PRNGKey(0), use_mean_z=False,
        )
        return (
            -hsmm_partition(pots, jnp.asarray(lengths)).mean() - log_det.mean()
        )

    want_loss, grads = jax.value_and_grad(ref_loss)(module.params)
    updates, _ = tx.update(grads, opt_state, module.params)
    want_params = jax.tree_util.tree_map(
        lambda p, u: p + u, module.params, apply_lr(updates, 5e-3)
    )
    assert abs(loss - float(want_loss)) < 1e-2, (loss, float(want_loss))
    assert abs(float(aux["nll"]) - float(want_loss)) < 1e-2
    for k in module.params:
        np.testing.assert_allclose(
            np.asarray(new_params[k]), np.asarray(want_params[k]),
            rtol=1e-4, atol=2e-5, err_msg=k,
        )


def _make_fit_args(batch_size=6, **overrides):
    return make_sm_args(batch_size=batch_size, **overrides)


def test_sharded_grad_step_matches_single_device_grads():
    """build_sharded_grad_step's psum'd global gradient (the
    --batch_accumulation-under-dp building block) must match the
    single-device gradient of the same weighted-mean loss tightly —
    this is the semantic check; the fit-level test below tolerates
    Adam-amplified reduction-order float noise."""
    import jax.numpy as jnp

    from action_segmentation_tpu.models.semimarkov import GaussianHsmm
    from action_segmentation_tpu.ops.hsmm import hsmm_gold_score
    from action_segmentation_tpu.ops.span_codec import labels_to_spans
    from action_segmentation_tpu.parallel.mesh import (
        build_sharded_grad_step,
        make_mesh,
        shard_shared_inputs,
        shard_train_inputs,
    )

    args = _make_fit_args()
    C, D, B, T = 5, 12, 8, 40
    module = GaussianHsmm(args, C, D, allow_self_transitions=True, seed=0)
    module.params["gaussian_means"] = jax.random.normal(
        jax.random.PRNGKey(0), (C, D)
    ) * 0.1

    rng = np.random.RandomState(0)
    features = rng.randn(B, T, D).astype(np.float32)
    lengths = np.concatenate([np.full(B - 2, T), [T - 7, T - 3]]).astype(np.int32)
    gt = rng.randint(0, C, size=(B, T)).astype(np.int64)
    cons = np.zeros((B, T, C), np.float32)
    end_allowed = np.zeros((B, C), np.float32)
    vc = np.arange(C, dtype=np.int32)
    inv_map = np.arange(C, dtype=np.int32)
    weights = np.concatenate([np.ones(B - 1), [0.0]]).astype(np.float32)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        gstep = build_sharded_grad_step(module, mesh, use_labels=True)
        params, _, placed = shard_train_inputs(
            mesh, module.params, None,
            [features, lengths, gt, cons, end_allowed, weights],
        )
        s_vc, s_inv = shard_shared_inputs(mesh, vc, inv_map)
        b_feat, b_len, b_gt, b_cons, b_end, b_w = placed
        loss, aux, grads = gstep(
            params, b_feat, b_len, s_vc, s_inv, b_gt, b_cons, b_end, b_w,
            jax.random.PRNGKey(0),
        )

    def ref_loss(p):
        pots, log_det, _ = module.compute_potentials(
            p, jnp.asarray(features), jnp.asarray(lengths), jnp.asarray(vc),
            jnp.asarray(cons), jnp.asarray(end_allowed),
            jax.random.PRNGKey(0), use_mean_z=True,
        )
        spans = labels_to_spans(jnp.asarray(inv_map)[jnp.asarray(gt)], module.max_k)
        w = jnp.asarray(weights)
        den = jnp.maximum(w.sum(), 1.0)
        return (
            -jnp.sum(hsmm_gold_score(pots, jnp.asarray(lengths), spans) * w) / den
            - jnp.sum(log_det * w) / den
        )

    want_loss, want_grads = jax.value_and_grad(ref_loss)(module.params)
    assert abs(float(loss) - float(want_loss)) < 1e-4, (float(loss), float(want_loss))
    for k in module.params:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(want_grads[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_data_parallel_batch_accumulation_matches_single_device():
    """--batch_accumulation > 1 under --data_parallel (sharded grad-only
    step + host accumulation + shared update) reproduces the
    single-device accumulation trajectory. Losses match tightly at epoch
    0; params match to a loose tolerance (8-way psum reassociation noise
    is amplified by Adam's sqrt(v) normalization over few steps — a
    semantic error like a wrong denominator would be O(2x), not O(0.5%);
    the tight gradient check is
    test_sharded_grad_step_matches_single_device_grads)."""
    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    train = SyntheticDatasplit(num_videos=13, n_classes=3, max_len=20, span_k=4, seed=0)

    losses, params = {}, {}
    for dp in (False, True):
        args = _make_fit_args(
            batch_size=4,
            sm_max_span_length=8,
            sm_supervised_method="gradient-based",
            batch_accumulation=2,
            epochs=2,
            lr=1e-2,
            data_parallel=dp,
        )
        model = SemiMarkovModel.from_args(args, train)
        ls = []
        model.fit(train, use_labels=True, callback_fn=lambda e, s: ls.append(s["train_loss"]))
        losses[dp] = ls
        params[dp] = jax.tree_util.tree_map(np.asarray, model.module.params)
        assert ls[-1] < ls[0]
    assert abs(losses[True][0] - losses[False][0]) < 1e-2, losses
    assert abs(losses[True][-1] - losses[False][-1]) < 0.1, losses
    flat_dp, _ = jax.tree_util.tree_flatten_with_path(params[True])
    flat_sd = dict(jax.tree_util.tree_flatten_with_path(params[False])[0])
    for path, leaf in flat_dp:
        np.testing.assert_allclose(
            leaf, flat_sd[path], rtol=2e-2, atol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_data_parallel_logs_grad_norm(caplog):
    """The |GParam|/lr/loss/throughput training line (reference
    semimarkov.py:289-304) must print under --data_parallel — the mode
    meant for real experiments must not lose observability."""
    import logging
    import re

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    train = SyntheticDatasplit(num_videos=8, n_classes=3, max_len=16, span_k=4, seed=2)
    args = _make_fit_args(
        batch_size=4,
        sm_max_span_length=6,
        sm_supervised_method="gradient-based",
        epochs=1,
        lr=1e-2,
        print_every=1,
        data_parallel=True,
    )
    model = SemiMarkovModel.from_args(args, train)
    with caplog.at_level(logging.DEBUG, logger="action_segmentation_tpu"):
        model.fit(train, use_labels=True)
    lines = [r.message for r in caplog.records if "|GParam|" in r.message]
    assert lines, "no |GParam| training log line under --data_parallel"
    m = re.search(r"\|GParam\|: ([0-9.]+)", lines[0])
    assert m and float(m.group(1)) > 0.0, lines[0]


def test_data_parallel_fit_compound_z_matches_single_device():
    """--data_parallel with the compound model and z_dim > 0: per-video
    key folding makes the VAE noise device-count invariant, and the
    sharded step's aux stats feed the same callback components as
    single-device training."""
    import argparse

    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    def make_args(**overrides):
        return make_sm_args(batch_size=6, **overrides)

    train = SyntheticDatasplit(num_videos=13, n_classes=3, max_len=20, span_k=4, seed=0)

    stats = {}
    for dp in (False, True):
        args = make_args(
            sm_max_span_length=6,
            sm_component_model=True,
            sm_component_embedding_dim=12,
            sm_component_z_dim=4,
            sm_component_z_hidden_dim=12,
            epochs=1,
            lr=1e-2,
            data_parallel=dp,
        )
        model = SemiMarkovModel.from_args(args, train)
        ss = []
        model.fit(train, use_labels=False, callback_fn=lambda e, s: ss.append(s))
        stats[dp] = ss[0]
    for key in ("train_loss", "train_nll_frame_avg", "train_kl_vid_avg"):
        a, b = stats[True][key], stats[False][key]
        assert abs(a - b) < 1e-2, (key, a, b)
    # z noise is actually drawn (kl > 0) — the parity above is not a
    # z=0 degenerate case
    assert stats[False]["train_kl_vid_avg"] > 1e-4, stats[False]


def test_data_parallel_checkpoint_resume(tmp_path):
    """Checkpoint mid-training under the 8-device mesh, resume, and
    match an uninterrupted dp run: params, Adam moments (via the
    continued trajectory), and losses (round-3 verdict weak-item 4).
    The Gaussian module draws no per-step noise, so epochs after the
    restore point are deterministic given (params, opt_state, lr)."""
    from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    train = SyntheticDatasplit(num_videos=9, n_classes=3, max_len=16, span_k=4, seed=5)

    def run(epochs, ckpt_dir, resume):
        args = _make_fit_args(
            batch_size=4,
            sm_max_span_length=6,
            sm_supervised_method="gradient-based",
            epochs=epochs,
            lr=1e-2,
            data_parallel=True,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=1,
            resume=resume,
            no_reduce_plateau=True,
        )
        model = SemiMarkovModel.from_args(args, train)
        ls = []
        model.fit(train, use_labels=True,
                  callback_fn=lambda e, s: ls.append((e, s["train_loss"])))
        return model, ls

    m_full, ls_full = run(4, str(tmp_path / "full"), False)

    m_part, _ = run(2, str(tmp_path / "resumed"), False)   # dies after epoch 1
    m_res, ls_res = run(4, str(tmp_path / "resumed"), True)  # resumes at epoch 2

    # the resumed run skipped epochs 0-1 and reproduced 2-3
    assert [e for e, _ in ls_res] == [2, 3], ls_res
    for (e_r, l_r), (e_f, l_f) in zip(ls_res, ls_full[2:]):
        assert e_r == e_f
        assert abs(l_r - l_f) < 1e-3, (e_r, l_r, l_f)
    for k in m_full.module.params:
        np.testing.assert_allclose(
            np.asarray(m_res.module.params[k]),
            np.asarray(m_full.module.params[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
