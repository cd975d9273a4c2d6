"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates that the full sharded training step (dp over videos on 'data',
tp over class tables on 'model') compiles and executes, and that the
graft-entry dry run passes for several device counts.
"""

import numpy as np
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

    losses = {}
    for mp in (1, 2):
        mesh = make_mesh(8, model_parallel=mp)
        with mesh:
            step = build_sharded_train_step(module, tx, mesh, use_labels=True)
            params, opt, placed = shard_train_inputs(
                mesh, module.params, opt_state, [features, lengths, gt, cons, end_allowed]
            )
            s_vc, s_inv = shard_shared_inputs(mesh, vc, inv_map)
            b_feat, b_len, b_gt, b_cons, b_end = placed
            _, _, loss = step(
                params, opt, b_feat, b_len, s_vc, s_inv, b_gt, b_cons, b_end,
                5e-3, jax.random.PRNGKey(0),
            )
            losses[mp] = float(loss)

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
