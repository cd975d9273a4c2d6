"""Device mesh + sharded train/decode steps.

The reference is strictly single-device (SURVEY §2.10: no distributed
backend at all); this module is the scale-out path the TPU build adds.
The natural decomposition for this workload:

* **data parallelism** over videos: the batch axis of features / lengths /
  constraints is sharded over the 'data' mesh axis; gradients are reduced
  by XLA from the sharding specs (scaling-book recipe: pick a mesh,
  annotate shardings, let XLA insert the collectives over ICI).
* the time-scan itself stays per-device (sequential dependence); long
  videos fit because the scan's working set is O(K*C), not O(T*K*C^2).

Tensor parallelism over classes (sharding the (T, D) x (D, C) emission
matmul's class axis over a 'model' axis) was built in rounds 1-2 and
RETIRED in round 3: the sharded tables are a few KB, the path could not
use the Pallas kernels (pallas_call does not auto-partition), and no
measured win exists or can be measured here (single-chip hardware) —
carrying an unexercised parallel construction is risk without payoff.
`--model_parallel > 1` raises loudly; the design record lives in
docs/DESIGN.md §6 (alongside the time-axis-sharding rejection) so a
future builder with a pod starts from the rationale, not the search.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from action_segmentation_tpu.models.base import (
    apply_lr,
    global_norm,
    mask_grads,
)
from action_segmentation_tpu.ops.hsmm import (
    hsmm_gold_score,
    hsmm_partition,
    hsmm_viterbi,
)
from action_segmentation_tpu.ops.span_codec import labels_to_spans, spans_to_labels
from action_segmentation_tpu.data.resident import (
    build_decode_scan_fn as _build_decode_scan_fn,
    build_epoch_scan_fn as _build_epoch_scan_fn,
)


def make_mesh(n_devices=None, model_parallel=1):
    """Data-parallel mesh over ('data', 'model') with the 'model' axis
    fixed at 1 (kept in the axis tuple so shardings/specs stay stable).

    Fails loudly when the backend exposes fewer devices than requested
    (round-1 postmortem: a silent 1-device axon backend made the 8-way
    dryrun assert). ``model_parallel > 1`` raises: the class-table
    tensor-parallel path was retired in round 3 (module docstring /
    docs/DESIGN.md §6).
    """
    if model_parallel not in (None, 1):
        raise NotImplementedError(
            "model_parallel={} : tensor parallelism over class tables "
            "was retired (tables are KBs, the Pallas kernels cannot "
            "auto-partition, and no multi-chip win was ever measured); "
            "use data parallelism. Design record: docs/DESIGN.md §6."
            .format(model_parallel)
        )
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                "make_mesh: requested {} devices but backend '{}' exposes "
                "only {}. For a virtual multi-device run, start a process "
                "with XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "and call jax.config.update('jax_platforms', 'cpu') before "
                "any backend use (see tests/conftest.py).".format(
                    n_devices, devices[0].platform, len(devices)
                )
            )
        devices = devices[:n_devices]
    n = len(devices)
    dev_array = mesh_utils.create_device_mesh((n, 1), devices=np.array(devices))
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh, ndim):
    """Leading-axis 'data' sharding for a batch array of rank `ndim`."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _params_shardings(mesh, params):
    """Replicate parameters across the mesh (the HSMM tables are a few
    KB; the class-axis tensor-parallel sharding was retired — module
    docstring)."""
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)


def _local_loss_terms(module, use_labels, discriminative, partition_fn,
                      params, features, lengths, vc, inv_map, gt, cons,
                      end_allowed, weights, rng, key_offset=0):
    """Weighted SUMS of the per-component loss terms over one shard of a
    batch, plus the weight sum (global weighted means = psum(weighted
    sums) / psum(weights)). Returning the components separately lets the
    drain log real nll/kl/log_det under --data_parallel."""
    # pad_batch_for_mesh fills dummy rows with length 0; clamp so the
    # weight-0 rows still run a well-defined length-1 DP (a 0-length
    # forward pass going non-finite would NaN the batch via 0 * nan).
    # The single-device loss_fn applies the SAME clamp
    # (models/semimarkov.py _build_loss_fn) so dp == single holds even
    # for degenerate 0-frame rows.
    lengths = jnp.maximum(lengths, 1)
    pots, log_det, kl = module.compute_potentials(
        params, features, lengths, vc, cons, end_allowed, rng,
        use_mean_z=use_labels, key_offset=key_offset, axis_name="data",
    )
    if use_labels:
        labels_sub = inv_map[gt]
        spans = labels_to_spans(labels_sub, module.max_k)
        ll = hsmm_gold_score(pots, lengths, spans)
        if discriminative:
            ll = ll - partition_fn(pots, lengths)
    else:
        ll = partition_fn(pots, lengths)
    return (
        jnp.sum(-ll * weights),
        jnp.sum(kl * weights),
        jnp.sum(log_det * weights),
        weights.sum(),
    )


def _terms_to_loss_aux(nll, kl, log_det, den, use_labels):
    """Global weighted means -> (loss, aux) with the same decomposition
    as SemiMarkovModel._build_loss_fn (loss = nll - log_det [+ kl when
    unsupervised]; aux logs every component either way)."""
    den = jnp.maximum(den, 1.0)
    nll, kl, log_det = nll / den, kl / den, log_det / den
    loss = nll - log_det
    if not use_labels:
        loss = loss + kl
    return loss, {"nll": nll, "kl": kl, "log_det": log_det}


def _shard_map_fn():
    try:
        from jax import shard_map  # jax >= 0.8

        return shard_map, {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map, {"check_rep": False}


def _make_local_loss(module, use_labels):
    """Per-shard share of the global weighted-mean loss, built so that
    **no psum sits inside the differentiated region**.

    JAX transposes ``psum`` as ``psum`` (the pmap convention), so
    differentiating a loss that psums its terms multiplies every
    shard's cotangent by the axis size: grad-of-psum'd-loss = N x the
    shard's true contribution, and psum'ing those grads yields N x the
    global gradient. That exact bug shipped in rounds 2-3 — masked in
    training because clip_by_global_norm(10) rescaled the inflated
    gradients back onto the true direction whenever ||g|| > 10 — and
    was caught by test_sharded_grad_step_matches_single_device_grads
    (round 4). The fix: each shard differentiates only its LOCAL
    weighted term sums divided by the (stop_gradient'ed, psum'd) global
    weight; psum of those per-shard grads is then exactly the global
    gradient, and the loss/aux values are psum'd OUTSIDE the grad
    closure.

    Returns ``local_loss(params, ...) -> (local_share, local_terms)``
    where local_terms = (nll_sum, kl_sum, log_det_sum, weight_sum) are
    this shard's unreduced sums (psum them for reporting).
    """
    from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fast
    from action_segmentation_tpu.ops.hsmm_pallas import pallas_supported

    discriminative = getattr(module.args, "sm_train_discriminatively", False)
    use_pallas = pallas_supported(module.n_classes)
    partition_fn = hsmm_partition_fast if use_pallas else hsmm_partition

    def local_loss(params, features, lengths, vc, inv_map, gt, cons,
                   end_allowed, weights, rng):
        # compound-z parity: fold the step key with each instance's
        # GLOBAL batch index, so sampling matches single-device runs
        # under any device count
        key_offset = jax.lax.axis_index("data") * features.shape[0]
        nll_s, kl_s, log_det_s, den_s = _local_loss_terms(
            module, use_labels, discriminative, partition_fn,
            params, features, lengths, vc, inv_map, gt, cons,
            end_allowed, weights, rng, key_offset=key_offset,
        )
        # global denominator: weights carry no tangent, but
        # stop_gradient keeps the psum out of the transposed graph
        # regardless of how callers thread inputs
        gden = jnp.maximum(
            jax.lax.stop_gradient(jax.lax.psum(den_s, "data")), 1.0
        )
        local_share = (nll_s - log_det_s) / gden
        if not use_labels:
            local_share = local_share + kl_s / gden
        return local_share, (nll_s, kl_s, log_det_s, den_s)

    return local_loss


def _reduce_terms(terms, use_labels):
    """psum a shard's local term sums and form the global (loss, aux)."""
    nll, kl, log_det, den = (jax.lax.psum(t, "data") for t in terms)
    return _terms_to_loss_aux(nll, kl, log_det, den, use_labels)


def build_sharded_train_step(module, tx, mesh, use_labels):
    """jit a FULL training step (loss -> grads -> adam update) over the
    mesh.

    Data-parallel shard_map over 'data' — each device runs the SAME
    compute path as single-device training (including the Pallas
    custom-VJP partition on TPU and --sm_train_discriminatively),
    computes local weighted loss sums, and psums them inside the shard
    so autodiff yields globally correct gradients. (A dp x tp variant
    existed through round 2; retired — module docstring.)

    `weights` (B,) supports batches padded up to a multiple of the data
    axis: padded instances get weight 0 and the loss is a weighted mean,
    so data-parallel runs reproduce single-device losses exactly.

    Signature of the returned step:
      (params, opt_state, features, lengths, vc, inv_map, gt, cons,
       end_allowed, weights, lr, rng)
      -> (params, opt_state, loss, aux, grad_norm)
    grad_norm is the pre-clip global gradient norm (the reference's
    |GParam| training log, semimarkov.py:289-304).
    """
    assert mesh.shape.get("model", 1) == 1, "tp retired; see make_mesh"
    local_loss = _make_local_loss(module, use_labels)
    trainable = module.trainable_mask

    def local_step(params, opt_state, features, lengths, vc, inv_map,
                   gt, cons, end_allowed, weights, lr, rng):
        (_, terms), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(
            params, features, lengths, vc, inv_map, gt, cons,
            end_allowed, weights, rng,
        )
        # each shard's autodiff carries only its own local share of the
        # global mean (no psum inside the grad closure — see
        # _make_local_loss); the global gradient is their sum
        grads = mask_grads(jax.lax.psum(grads, "data"), trainable)
        loss, aux = _reduce_terms(terms, use_labels)
        gnorm = global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, apply_lr(updates, lr)
        )
        return params, opt_state, loss, aux, gnorm

    shard_map, check_kwargs = _shard_map_fn()
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(), P(),                      # params, opt_state
            P("data"), P("data"),          # features, lengths
            P(), P(),                      # vc, inv_map
            P("data"), P("data"), P("data"), P("data"),  # gt, cons, end, w
            P(), P(),                      # lr, rng
        ),
        out_specs=(
            P(), P(), P(),
            {"nll": P(), "kl": P(), "log_det": P()},
            P(),
        ),
        **check_kwargs,
    )
    return jax.jit(sharded)


def build_sharded_grad_step(module, mesh, use_labels):
    """Data-parallel loss + GLOBAL gradients without the optimizer
    update, for --batch_accumulation under --data_parallel: the host
    accumulates the returned (replicated) gradient pytrees across
    micro-batches and applies the shared update step once per window —
    the reference's accumulation semantics (semimarkov.py:284-309) on
    the mesh.

    Signature: (params, features, lengths, vc, inv_map, gt, cons,
    end_allowed, weights, rng) -> (loss, aux, grads); `grads` is the
    psum'd global gradient, replicated across the mesh.
    """
    assert mesh.shape.get("model", 1) == 1, "tp retired; see make_mesh"
    local_loss = _make_local_loss(module, use_labels)
    trainable = module.trainable_mask

    def local_grads(params, features, lengths, vc, inv_map, gt, cons,
                    end_allowed, weights, rng):
        (_, terms), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, features, lengths, vc, inv_map, gt, cons,
            end_allowed, weights, rng,
        )
        grads = mask_grads(jax.lax.psum(grads, "data"), trainable)
        loss, aux = _reduce_terms(terms, use_labels)
        return loss, aux, grads

    shard_map, check_kwargs = _shard_map_fn()
    sharded = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(
            P(),                           # params
            P("data"), P("data"),          # features, lengths
            P(), P(),                      # vc, inv_map
            P("data"), P("data"), P("data"), P("data"),  # gt, cons, end, w
            P(),                           # rng
        ),
        out_specs=(
            P(),
            {"nll": P(), "kl": P(), "log_det": P()},
            P(),
        ),
        **check_kwargs,
    )
    return jax.jit(sharded)



def pad_batch_for_mesh(mesh, arrays, batch_size, pad_to=None):
    """Pad leading batch dims up to a multiple of the data axis (and at
    least `pad_to`, for jit-shape reuse across partial final batches);
    returns (padded arrays, weights)."""
    dp = mesh.shape["data"]
    Bp = -(-max(batch_size, pad_to or 0) // dp) * dp
    padded = []
    for arr in arrays:
        arr = np.asarray(arr)
        pad = [(0, Bp - batch_size)] + [(0, 0)] * (arr.ndim - 1)
        padded.append(np.pad(arr, pad))
    weights = np.zeros(Bp, np.float32)
    weights[:batch_size] = 1.0
    return padded, weights


def _make_decode_local(module, n_classes=None):
    """Per-shard Viterbi decode body shared by the per-batch sharded
    decode step and the resident-corpus sharded decode scan. Returns
    (labels (B_local, T) int32 global class ids with -1 padding,
    scores (B_local,)); padded lengths of 0 are clamped to 1 locally
    so the traceback stays well-defined."""
    from action_segmentation_tpu.ops.hsmm_pallas import (
        hsmm_viterbi_labels_pallas,
        pallas_supported,
    )

    if n_classes is None:
        n_classes = getattr(module, "n_classes", None)
    use_pallas = n_classes is not None and pallas_supported(n_classes)

    def decode_local(params, features, lengths, vc, cons, end_allowed, rng):
        lengths = jnp.maximum(lengths, 1)
        key_offset = jax.lax.axis_index("data") * features.shape[0]
        pots, _, _ = module.compute_potentials(
            params, features, lengths, vc, cons, end_allowed, rng,
            use_mean_z=True, key_offset=key_offset, axis_name="data",
        )
        if use_pallas:
            labels_sub, scores = hsmm_viterbi_labels_pallas(pots, lengths)
        else:
            spans_sub, scores = hsmm_viterbi(pots, lengths)
            labels_sub = jnp.where(
                jnp.arange(features.shape[1])[None, :] < lengths[:, None],
                spans_to_labels(spans_sub),
                -1,
            )
        labels = jnp.where(labels_sub >= 0, vc[jnp.clip(labels_sub, 0)], -1)
        return labels, scores

    return decode_local


def build_sharded_decode_step(module, mesh, n_classes=None):
    """Data-parallel Viterbi decode over the mesh's 'data' axis.

    Same contract as SemiMarkovModel._build_decode_step: returns
    (labels (B, T) int32 global class ids with -1 padding, scores (B,)).
    Built with shard_map so each device decodes its local batch shard —
    on TPU the fused Pallas kernels run per shard (pallas_call inside a
    plainly-sharded jit would see a partitioned batch axis it cannot
    repack). The caller pads B to a multiple of the data axis
    (pad_batch_for_mesh) and drops the padded rows.
    """
    shard_map, check_kwargs = _shard_map_fn()
    decode_local = _make_decode_local(module, n_classes)

    sharded = shard_map(
        decode_local,
        mesh=mesh,
        in_specs=(
            P(),            # params (replicated pytree)
            P("data"),      # features
            P("data"),      # lengths
            P(),            # valid classes
            P("data"),      # constraint penalties
            P("data"),      # end masks
            P(),            # rng
        ),
        out_specs=(P("data"), P("data")),
        **check_kwargs,
    )
    return jax.jit(sharded)


def build_sharded_epoch_scan(module, tx, mesh, use_labels, with_cons,
                             with_end, t_width):
    """Resident-corpus epoch scan over the mesh: one jitted program per
    length bucket scans the bucket's batches with each device gathering
    its OWN row shard from the (replicated) corpus, differentiating the
    local loss share, psum'ing grads over 'data', and applying the
    replicated Adam update — the sharded analogue of
    SemiMarkovModel._build_epoch_scan, with the same per-batch fold_key
    derivation and the same z-key offsets as the per-batch streaming dp
    step (dp==single and dp-scan==dp-streaming trajectory parity).

    Signature: (params, opt_state, stats, lr, base_rng, epoch, res,
    idxs (n, Bp), vcs (n, Cw), invs (n, C), bixs (n,), bws (n,)) ->
    (params, opt_state, stats, losses (n,), snaps (n*5,)); idxs is
    sharded over its ROW axis ('data'), everything else replicated.
    Bp must be a multiple of the data axis (make_plan pad_rows_to).
    """
    assert mesh.shape.get("model", 1) == 1, "tp retired; see make_mesh"
    local_loss = _make_local_loss(module, use_labels)
    trainable = module.trainable_mask

    def step_terms(params, f, l, vc, inv, g, c, e, w, rng):
        (_, terms), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, f, l, vc, inv, g, c, e, w, rng)
        grads = mask_grads(jax.lax.psum(grads, "data"), trainable)
        loss, aux = _reduce_terms(terms, use_labels)
        return loss, aux, grads

    # the gather/fold/update/stats/snap scan body is the single shared
    # definition in data/resident.py — only loss/grad production (the
    # psum'd local share above) is mesh-specific
    scan_fn = _build_epoch_scan_fn(step_terms, tx, with_cons, with_end)

    def local_epoch(params, opt_state, stats, lr, base_rng, epoch, res,
                    idxs, vcs, invs, bixs, bws):
        return scan_fn(params, opt_state, stats, lr, base_rng, epoch,
                       res, idxs, vcs, invs, bixs, bws, t_width)

    shard_map, check_kwargs = _shard_map_fn()
    sharded = shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(),  # params, opt, stats, lr, rng, epoch
            P(),                           # resident corpus (replicated)
            P(None, "data"),               # idxs: rows sharded over 'data'
            P(), P(), P(), P(),            # vcs, invs, bixs, bws
        ),
        out_specs=(P(), P(), P(), P(), P()),
        **check_kwargs,
    )
    return jax.jit(sharded)


def build_sharded_decode_scan(module, mesh, with_cons, with_end, t_width,
                              n_classes=None):
    """Resident-corpus decode scan over the mesh: scans a bucket group
    with each device decoding its row shard; labels come back
    row-sharded and flattened so a whole sharded predict() is a handful
    of dispatches plus ONE fetch (the sharded analogue of
    SemiMarkovModel._build_decode_scan).

    Signature: (params, base_rng, res, idxs (n, Bp), vcs, bixs) ->
    labels (n * Bp * t_width,) int32 global class ids, -1 padding.
    """
    assert mesh.shape.get("model", 1) == 1, "tp retired; see make_mesh"
    # shared scan body (data/resident.py); the injected decode closure
    # is the shard-local one (per-device z-key offsets inside)
    scan_fn = _build_decode_scan_fn(
        _make_decode_local(module, n_classes), with_cons, with_end
    )

    def local_scan(params, base_rng, res, idxs, vcs, bixs):
        # (n, B_local, t_width); flattened by the caller
        return scan_fn(params, base_rng, res, idxs, vcs, bixs, t_width)

    shard_map, check_kwargs = _shard_map_fn()
    sharded = shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(
            P(), P(),            # params, rng
            P(),                 # resident corpus (replicated)
            P(None, "data"),     # idxs
            P(), P(),            # vcs, bixs
        ),
        out_specs=P(None, "data"),
        **check_kwargs,
    )

    def fn(params, base_rng, res, idxs, vcs, bixs):
        return jnp.reshape(sharded(params, base_rng, res, idxs, vcs, bixs), (-1,))

    return jax.jit(fn)


def replicate_resident(mesh, resident):
    """Place a ResidentCorpus's device tuple replicated over the mesh
    (one broadcast; cached by mutating device_args in place)."""
    if getattr(resident, "_mesh_placed", None) is not mesh:
        resident.device_args = tuple(
            jax.device_put(a, replicated(mesh)) for a in resident.device_args
        )
        resident._mesh_placed = mesh
    return resident


def shard_train_inputs(mesh, params, opt_state, batch_args):
    """Place params and optimizer state (replicated — tensor
    parallelism was retired, see make_mesh) and batch arrays
    (data-sharded on axis 0) onto the mesh. The batch arrays go in ONE
    batched device_put (the round-trip rule: N separate transfers pay N
    dispatch latencies through the TPU tunnel)."""
    p_shard = _params_shardings(mesh, params)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, jax.tree_util.tree_map(
        lambda _: replicated(mesh), opt_state
    ))
    arrs = tuple(jnp.asarray(a) for a in batch_args)
    placed = list(
        jax.device_put(arrs, tuple(batch_sharding(mesh, a.ndim) for a in arrs))
    )
    return params, opt_state, placed


def shard_shared_inputs(mesh, *arrays):
    """Replicate small shared arrays (valid classes, inverse maps)."""
    return [jax.device_put(jnp.asarray(a), replicated(mesh)) for a in arrays]
