"""Resident-corpus epoch-scan parity tests (round 4).

The device-resident training/decode path (data/resident.py +
SemiMarkovModel._build_epoch_scan/_build_decode_scan) must reproduce
the streaming per-batch loop exactly:

  * training plans are a single exact-order scan group (make_plan
    global_order), so fit trajectories (per-epoch losses, final
    params) match the streaming path to numerical tolerance on ragged
    multi-bucket corpora too, not just uniform-length ones;
  * predictions match per video on ragged corpora too (decoding is
    order-free and padding-invariant);
  * per-batch PRNG keys fold from (epoch, original batch index), so
    checkpoint/resume under scan mode reproduces the uninterrupted run;
  * corpora over --sm_device_resident_mb fall back to streaming.

Mirrors the reference's synthetic learnability harness
(src/models/test_semimarkov.py:90-247) for data construction.
"""

import numpy as np

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel


from tests.conftest import make_sm_args


def make_args(**overrides):
    return make_sm_args(**overrides)


STAT_KEYS = (
    "train_loss", "train_nll_frame_avg", "train_kl_vid_avg",
    "train_recon_bound",
)


def fit_and_collect(args, train, use_labels):
    model = SemiMarkovModel.from_args(args, train)
    stats = []
    model.fit(
        train, use_labels=use_labels,
        callback_fn=lambda e, s: stats.append(
            [float(s[k]) for k in STAT_KEYS] if s else []
        ),
    )
    losses = [s[0] for s in stats if s]
    return model, losses, [s for s in stats if s]


def assert_params_close(pa, pb, atol=2e-4):
    import jax

    la = jax.tree_util.tree_leaves_with_path(pa)
    lb = jax.tree_util.tree_leaves_with_path(pb)
    assert len(la) == len(lb)
    for (ka, va), (kb, vb) in zip(la, lb):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=atol, rtol=1e-4,
            err_msg=str(ka),
        )


def _cfg(**over):
    base = dict(
        sm_max_span_length=8,
        epochs=3,
        lr=1e-2,
        batch_size=10,
        seed=3,
    )
    base.update(over)
    return base


def test_scan_matches_streaming_unsupervised():
    """Uniform lengths -> one bucket group -> scan order == streaming
    order: per-epoch stats must match (includes a partial final batch
    exercising the idx=-1 dummy-row convention).

    Raw params are NOT compared here: at the symmetric unsupervised
    init, transition/init logit gradients are mathematically zero
    (~1e-7 float noise), and Adam's first step turns per-program
    rounding differences into ~lr-scale kicks along loss-invariant
    (softmax-shift) directions — both trajectories are equally valid
    and produce bit-identical losses.  Param-trajectory parity is
    asserted from a symmetry-broken init in
    test_scan_matches_streaming_closed_then_gradient; decode parity on
    a SHARED param set in test_scan_predict_matches_streaming_*.
    """
    train = SyntheticDatasplit(
        num_videos=25, n_classes=3, max_len=24, min_len=24, span_k=4, seed=0
    )
    m_scan, l_scan, s_scan = fit_and_collect(
        make_args(**_cfg(training="unsupervised")), train, use_labels=False
    )
    assert m_scan._get_resident(train, False) is not None  # scan path ran
    m_str, l_str, s_str = fit_and_collect(
        make_args(**_cfg(training="unsupervised", sm_device_resident_mb=0)),
        train, use_labels=False,
    )
    np.testing.assert_allclose(s_scan, s_str, rtol=1e-5, atol=1e-6)
    # emission means inherit ~1e-3-scale drift through posterior
    # coupling with the noise-kicked logits; this is a sanity bound,
    # not the parity statement (the 3-epoch stat trajectory above is)
    assert_params_close(
        {"m": m_scan.module.params["gaussian_means"]},
        {"m": m_str.module.params["gaussian_means"]},
        atol=5e-3,
    )


def test_scan_matches_streaming_supervised_gradient():
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=20, min_len=20, span_k=4, seed=1
    )
    cfg = _cfg(sm_supervised_method="gradient-based", epochs=2)
    m_scan, l_scan, _ = fit_and_collect(make_args(**cfg), train, use_labels=True)
    m_str, l_str, _ = fit_and_collect(
        make_args(**cfg, sm_device_resident_mb=0), train, use_labels=True
    )
    np.testing.assert_allclose(l_scan, l_str, rtol=1e-5)
    assert_params_close(m_scan.module.params, m_str.module.params)


def test_scan_matches_streaming_closed_then_gradient():
    """closed-then-gradient starts the gradient phase from the
    asymmetric closed-form fit, so every logit gradient is
    non-degenerate and the full param trajectories must track."""
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=20, min_len=20, span_k=4, seed=7
    )
    cfg = _cfg(sm_supervised_method="closed-then-gradient", epochs=2)
    m_scan, l_scan, _ = fit_and_collect(make_args(**cfg), train, use_labels=True)
    m_str, l_str, _ = fit_and_collect(
        make_args(**cfg, sm_device_resident_mb=0), train, use_labels=True
    )
    np.testing.assert_allclose(l_scan, l_str, rtol=1e-5)
    assert_params_close(m_scan.module.params, m_str.module.params)


def test_scan_matches_streaming_ragged_trajectory():
    """Multi-bucket corpus: the training scan must apply Adam updates
    in the exact shuffled epoch order (make_plan global_order), not
    bucket-grouped — grouping would impose a short-before-long
    curriculum absent from the streaming/reference loop (round-4
    review finding). From the asymmetric closed-form init the full
    loss AND param trajectories must track the streaming path, even
    though the scan computes every batch at the widest batch's padded
    length (the DP is padding-invariant under the end fold)."""
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=150, min_len=8, span_k=5, seed=9
    )
    cfg = _cfg(
        sm_supervised_method="closed-then-gradient", epochs=2, batch_size=4
    )
    m_scan, l_scan, _ = fit_and_collect(make_args(**cfg), train, use_labels=True)
    res = m_scan._get_resident(train, False)
    assert res is not None
    plan = res.make_plan(4, shuffle=True, seed=4, global_order=True)
    assert len(plan.groups) == 1  # exact-order: a single scan group
    assert list(plan.groups[0].bixs) == sorted(plan.groups[0].bixs)
    assert len(res.make_plan(4, shuffle=True, seed=4).groups) > 1  # ragged
    m_str, l_str, _ = fit_and_collect(
        make_args(**cfg, sm_device_resident_mb=0), train, use_labels=True
    )
    np.testing.assert_allclose(l_scan, l_str, rtol=1e-5)
    assert_params_close(m_scan.module.params, m_str.module.params)


def test_scan_predict_matches_streaming_on_ragged_corpus():
    """Ragged lengths span several buckets; the scanned decode must
    reproduce the streaming decode per video regardless of grouping or
    the wider scan padding."""
    train = SyntheticDatasplit(
        num_videos=18, n_classes=3, max_len=60, min_len=8, span_k=5, seed=2
    )
    args = make_args(**_cfg(sm_supervised_method="closed-form"))
    model = SemiMarkovModel.from_args(args, train)
    model.fit(train, use_labels=True)
    p_scan = model.predict(train)
    assert model._get_resident(
        train, False
    ) is not None  # the resident decode path actually ran
    model.args.sm_device_resident_mb = 0
    model._resident_cache = {}
    p_str = model.predict(train)
    assert set(p_scan) == set(p_str)
    for name in p_scan:
        np.testing.assert_array_equal(p_scan[name], p_str[name])


def test_scan_matches_streaming_compound():
    """Compound (VAE z) model: the per-batch PRNG keys drive z sampling,
    so matching kl/recon trajectories proves the fold_in key derivation
    is identical across the two loops.  Raw params are checked only on
    the decompose projection (non-degenerate grads); logit leaves are
    subject to the Adam zero-grad noise kick (see
    test_scan_matches_streaming_unsupervised).  Decode parity on shared
    params is asserted separately below."""
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=20, min_len=20, span_k=4,
        feature_dim=8, seed=4,
    )
    cfg = _cfg(
        training="unsupervised",
        sm_component_model=True,
        epochs=2,
        batch_size=10,
    )
    m_scan, l_scan, s_scan = fit_and_collect(
        make_args(**cfg), train, use_labels=False
    )
    m_str, l_str, s_str = fit_and_collect(
        make_args(**cfg, sm_device_resident_mb=0), train, use_labels=False
    )
    np.testing.assert_allclose(s_scan, s_str, rtol=1e-4, atol=1e-6)
    # same model params, scan decode vs streaming decode must agree
    p_scan = m_scan.predict(train)
    assert m_scan._get_resident(train, False) is not None
    m_scan.args.sm_device_resident_mb = 0
    m_scan._resident_cache = {}
    p_str = m_scan.predict(train)
    assert set(p_scan) == set(p_str)
    for name in p_scan:
        np.testing.assert_array_equal(p_scan[name], p_str[name])


def test_scan_resume_matches_uninterrupted(tmp_path):
    """fold_in(epoch, batch) keys are resume-stable: a run killed after
    epoch 1 and resumed reproduces the uninterrupted run's params."""
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=20, min_len=20, span_k=4, seed=5
    )
    cfg = _cfg(sm_supervised_method="gradient-based", epochs=4)

    m_full, _, _ = fit_and_collect(make_args(**cfg), train, use_labels=True)

    ck = str(tmp_path / "ck")
    m_part, _, _ = fit_and_collect(
        make_args(**{**cfg, "epochs": 2, "checkpoint_dir": ck,
                     "checkpoint_every": 1}),
        train, use_labels=True,
    )
    args_res = make_args(
        **cfg, checkpoint_dir=ck, checkpoint_every=1, resume=True
    )
    m_res = SemiMarkovModel.from_args(args_res, train)
    epochs_seen = []
    m_res.fit(
        train, use_labels=True,
        callback_fn=lambda e, s: epochs_seen.append(e),
    )
    assert epochs_seen == [2, 3], epochs_seen
    assert_params_close(m_res.module.params, m_full.module.params, atol=5e-4)


def test_dp_scan_matches_single_scan():
    """--data_parallel resident epoch scan (shard_map'd per-bucket
    program, mesh.py build_sharded_epoch_scan) reproduces the
    single-device scan: symmetry-broken closed-then-gradient
    trajectories track and predictions match exactly (the sharded
    decode scan shards rows over the mesh)."""
    train = SyntheticDatasplit(
        num_videos=24, n_classes=3, max_len=20, min_len=20, span_k=4, seed=7
    )
    cfg = _cfg(
        sm_supervised_method="closed-then-gradient", epochs=2, batch_size=8
    )
    m_dp, l_dp, _ = fit_and_collect(
        make_args(**cfg, data_parallel=True), train, use_labels=True
    )
    assert m_dp._get_resident(train, False) is not None  # scan path ran
    m_sg, l_sg, _ = fit_and_collect(make_args(**cfg), train, use_labels=True)
    np.testing.assert_allclose(l_dp, l_sg, rtol=1e-5)
    assert_params_close(m_dp.module.params, m_sg.module.params, atol=5e-4)
    p_dp = m_dp.predict(train)
    p_sg = m_sg.predict(train)
    assert set(p_dp) == set(p_sg)
    for name in p_dp:
        np.testing.assert_array_equal(p_dp[name], p_sg[name])


def test_dp_scan_matches_dp_streaming():
    """dp resident scan vs dp per-batch streaming (the over-budget
    fallback): identical shard_map loss/psum semantics, so the loss
    trajectories must match tightly; includes a partial final batch
    (20 videos over batch 8) exercising pad_rows_to row padding."""
    train = SyntheticDatasplit(
        num_videos=20, n_classes=3, max_len=20, min_len=20, span_k=4, seed=8
    )
    cfg = _cfg(
        sm_supervised_method="closed-then-gradient", epochs=2, batch_size=8
    )
    _, l_scan, s_scan = fit_and_collect(
        make_args(**cfg, data_parallel=True), train, use_labels=True
    )
    _, l_str, s_str = fit_and_collect(
        make_args(**cfg, data_parallel=True, sm_device_resident_mb=0),
        train, use_labels=True,
    )
    np.testing.assert_allclose(s_scan, s_str, rtol=1e-5, atol=1e-6)


def test_dp_scan_compound_z_keys():
    """Compound (VAE z) under the dp scan: per-row z keys derive from
    axis_index * local_B offsets, so kl/recon trajectories must match
    the single-device scan (which indexes rows globally)."""
    train = SyntheticDatasplit(
        num_videos=16, n_classes=3, max_len=20, min_len=20, span_k=4,
        feature_dim=8, seed=9,
    )
    cfg = _cfg(
        training="unsupervised", sm_component_model=True, epochs=2,
        batch_size=8,
    )
    _, _, s_dp = fit_and_collect(
        make_args(**cfg, data_parallel=True), train, use_labels=False
    )
    _, _, s_sg = fit_and_collect(make_args(**cfg), train, use_labels=False)
    np.testing.assert_allclose(s_dp, s_sg, rtol=1e-4, atol=1e-6)


def test_unloadable_video_resident_predict():
    """A video whose sample fails to load (Datasplit.__getitem__ ->
    None) must not crash the resident path: it is skipped from the
    resident rows, length-sorted decode plans sort it as 0 (the
    streaming iter_batches convention), and predictions match the
    streaming path on the remaining videos (round-4 review finding)."""
    base = SyntheticDatasplit(
        num_videos=12, n_classes=3, max_len=40, min_len=8, span_k=4, seed=11
    )
    bad = sorted(
        (t, n) for t, vids in base.videos_by_task.items() for n in vids
    )[3]

    class _Flaky:
        videos_by_task = base.videos_by_task

        def __getitem__(self, key):
            return None if key == bad else base[key]

        def __len__(self):
            return len(base) - 1

    flaky = _Flaky()
    args = make_args(**_cfg(sm_supervised_method="closed-form"))
    model = SemiMarkovModel.from_args(args, base)
    model.fit(base, use_labels=True)
    p_scan = model.predict(flaky)
    assert model._get_resident(flaky, False) is not None  # resident ran
    assert bad[1] not in p_scan
    model.args.sm_device_resident_mb = 0
    model._resident_cache = {}
    p_str = model.predict(flaky)
    assert set(p_scan) == set(p_str)
    for name in p_scan:
        np.testing.assert_array_equal(p_scan[name], p_str[name])


def test_dp_reference_pooling_matches_single():
    """--sm_reference_pooling windows pool to the BATCH max length; under
    shard_map the local max is not the batch max, so the window pmaxes
    over 'data' (round-4 review finding). Ragged batches decoded under
    dp must match the single-device decode exactly."""
    train = SyntheticDatasplit(
        num_videos=16, n_classes=3, max_len=40, min_len=8, span_k=4,
        feature_dim=8, seed=12,
    )
    cfg = _cfg(
        training="unsupervised", sm_component_model=True,
        sm_reference_pooling=True, epochs=1, batch_size=8,
    )
    m_sg, _, _ = fit_and_collect(make_args(**cfg), train, use_labels=False)
    p_sg = m_sg.predict(train)
    m_sg.args.data_parallel = True
    m_sg._jit_cache = {}
    m_sg._resident_cache = {}
    p_dp = m_sg.predict(train)
    assert set(p_dp) == set(p_sg)
    for name in p_dp:
        np.testing.assert_array_equal(p_dp[name], p_sg[name])


def test_budget_fallback_streams():
    train = SyntheticDatasplit(
        num_videos=12, n_classes=3, max_len=24, min_len=24, span_k=4, seed=6
    )
    args = make_args(**_cfg(training="unsupervised", sm_device_resident_mb=0))
    model = SemiMarkovModel.from_args(args, train)
    assert model._get_resident(train, False) is None
    # sub-megabyte budget: corpus over budget -> fallback, fit still runs
    args2 = make_args(**_cfg(training="unsupervised", epochs=1))
    args2.sm_device_resident_mb = 0
    model2 = SemiMarkovModel.from_args(args2, train)
    model2.fit(train, use_labels=False)
    assert model2.predict(train)


def test_resident_budget_is_shared_across_cache_entries():
    """--sm_device_resident_mb bounds TOTAL pinned HBM across live
    cache entries, not each corpus alone: a U7-style fit pins the
    train split twice ((id, True)/(id, False)) plus subset/dev splits,
    so per-corpus charging could pin ~4x the stated budget."""
    train = SyntheticDatasplit(
        num_videos=12, n_classes=3, max_len=64, span_k=8, seed=0
    )
    dev = SyntheticDatasplit(
        num_videos=12, n_classes=3, max_len=64, span_k=8, seed=1
    )
    args = make_args(sm_max_span_length=8, epochs=1, batch_size=6)
    model = SemiMarkovModel.from_args(args, train)

    r_train = model._get_resident(train, False)
    assert r_train is not None
    # shrink the budget so the SECOND corpus alone would fit, but not
    # alongside the already-pinned first
    each_mb = r_train.nbytes / float(1 << 20)
    model.args.sm_device_resident_mb = each_mb * 1.5
    r_dev = model._get_resident(dev, False)
    assert r_dev is None  # remaining budget after train is 0.5x < 1x
    # with the first entry evicted the same split fits again
    model._resident_cache.clear()
    assert model._get_resident(dev, False) is not None


def test_resident_eviction_frees_budget_before_new_build():
    """The LRU cap evicts BEFORE the shared-budget check, so a 5th
    split can use the HBM the eviction is about to free instead of
    spuriously falling back to streaming."""
    splits = [
        SyntheticDatasplit(
            num_videos=10, n_classes=3, max_len=64, span_k=8, seed=i
        )
        for i in range(5)
    ]
    args = make_args(sm_max_span_length=8, epochs=1, batch_size=5)
    model = SemiMarkovModel.from_args(args, splits[0])
    first = model._get_resident(splits[0], False)
    assert first is not None
    each_mb = first.nbytes / float(1 << 20)
    # budget fits exactly 4 corpora (equal-size splits)
    model.args.sm_device_resident_mb = each_mb * 4.2
    for s in splits[1:4]:
        assert model._get_resident(s, False) is not None
    assert len(model._resident_cache) == 4
    # 5th: without evict-first, pinned=4x and the build would fail
    assert model._get_resident(splits[4], False) is not None
    assert len(model._resident_cache) == 4
    assert model._resident_key(splits[0], False) not in model._resident_cache


def test_resident_pin_survives_cache_pressure():
    """A pinned entry (fit's training corpus) is never evicted — and
    keeps counting toward the shared budget — while unpinned entries
    cycle."""
    splits = [
        SyntheticDatasplit(
            num_videos=10, n_classes=3, max_len=64, span_k=8, seed=i
        )
        for i in range(6)
    ]
    args = make_args(sm_max_span_length=8, epochs=1, batch_size=5)
    model = SemiMarkovModel.from_args(args, splits[0])
    pinned = model._get_resident(splits[0], False)
    model._pin_resident(splits[0], False)
    assert pinned is not None
    for s in splits[1:]:
        model._get_resident(s, False)
    key = model._resident_key(splits[0], False)
    assert key in model._resident_cache  # survived 5 later entries
    model._unpin_resident(splits[0], False)
    for s in splits[1:]:
        k = (id(s), False)
        if k in model._resident_cache:  # survivors of the LRU churn
            model._resident_cache.move_to_end(k)
    model._get_resident(
        SyntheticDatasplit(num_videos=10, n_classes=3, max_len=64,
                           span_k=8, seed=99),
        False,
    )
    assert key not in model._resident_cache  # unpinned -> evictable


def test_resident_key_reflects_baked_args():
    """The resident tensors bake in the narration penalty scaling and
    class-width bucketing; mutating those args between fits must miss
    the cache (reusing W1-scaled constraints for a W2 fit would train
    with the old penalty while the streaming fallback uses W2)."""
    split = SyntheticDatasplit(
        num_videos=10, n_classes=3, max_len=64, span_k=8, seed=0
    )
    args = make_args(sm_max_span_length=8, epochs=1, batch_size=5)
    model = SemiMarkovModel.from_args(args, split)
    r1 = model._get_resident(split, False)
    assert r1 is not None
    k1 = model._resident_key(split, False)
    # the narration weight only keys narration-scaled builds
    model.args.sm_constrain_narration_weight = 2.5
    assert model._resident_key(split, False) == k1
    assert model._get_resident(split, False) is r1
    ka = model._resident_key(split, True)
    model.args.sm_constrain_narration_weight = 5.0
    assert model._resident_key(split, True) != ka
    # class bucketing changes the padded class width c_max
    model.args.sm_class_shape_bucket = 7
    k2 = model._resident_key(split, False)
    assert k2 != k1
    r2 = model._get_resident(split, False)
    assert r2 is not None and r2 is not r1


def test_resident_failure_watermark_validates_referent():
    """The budget-failure watermark holds only a weakref to its
    datasplit; an entry whose keyed id() was recycled by a DIFFERENT
    split must be purged, not silently suppress that split's build
    (which would lock it to per-batch streaming forever)."""
    import weakref

    split_a = SyntheticDatasplit(
        num_videos=10, n_classes=3, max_len=64, span_k=8, seed=0
    )
    split_b = SyntheticDatasplit(
        num_videos=10, n_classes=3, max_len=64, span_k=8, seed=1
    )
    args = make_args(sm_max_span_length=8, epochs=1, batch_size=5)
    model = SemiMarkovModel.from_args(args, split_a)
    key_b = model._resident_key(split_b, False)
    # simulate id() recycling: a watermark keyed like split_b but whose
    # referent is (a dead or different) split_a, set so high that a
    # genuine match would always suppress the build
    model._resident_failed = {key_b: (weakref.ref(split_a), 1e9)}
    assert model._get_resident(split_b, False) is not None
    assert key_b not in model._resident_failed
