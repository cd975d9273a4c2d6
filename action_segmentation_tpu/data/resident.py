"""Device-resident corpus: upload a datasplit to HBM once, gather
batches on device by row index.

Motivation (round 4, docs/DESIGN.md §9): after the training loop was
reduced to one fused program per batch, the realistic-epoch wall clock
was bounded by the REMAINING tunnel requests — chiefly the per-batch
host->device transfer of features that never change across epochs.
A corpus is static for the lifetime of a fit/predict loop, so the
TPU-native layout is to keep it resident in HBM and form batches with
an on-device gather:

  * one `device_put` per (datasplit, narration) pair per model —
    amortized across every epoch and every per-epoch evaluation;
  * batch composition stays a host decision (the same seeded
    shuffle/bucketing as `iter_batches`) but travels as a tiny int32
    index matrix riding the dispatch;
  * a whole training epoch executes as ONE `lax.scan` program over
    all batches in the exact streaming order (decode groups batches
    per length bucket instead — order-free), so per-epoch tunnel
    requests drop from O(batches x programs) to O(1)/O(buckets).

Size is gated by ``--sm_device_resident_mb``: corpora whose resident
tensors exceed the budget fall back to the per-batch streaming path
(the reference-style loop in models/semimarkov.py). On a 16 GB v5e
chip the full CrossTask PCA-200 feature set is ~650 MB — resident by
default.

Replaces no single reference file: the reference re-collates and
re-uploads every batch every epoch (src/data/corpus.py:613-644 +
src/models/model.py:42-77 DataLoader); this module is the TPU-native
redesign of that data path.
"""

from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import numpy as np

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.data.batching import (
    make_batch_keys,
    pad_length_to_bucket,
)


@dataclass
class PlanGroup:
    """Batches sharing one padded length bucket, in epoch order."""

    t_width: int                 # static padded time width (bucket)
    idxs: np.ndarray             # (n, Bp) int32 corpus rows, -1 = pad row
    vcs: np.ndarray              # (n, Cmax) int32 valid classes, -1 = pad
    invs: np.ndarray             # (n, C) int32 global->subset map
    bixs: np.ndarray             # (n,) int32 original epoch batch index
    bws: np.ndarray              # (n,) float32 true batch sizes
    keys: List[List[Tuple[str, str]]]  # per batch: (task, video) keys
    batch_sizes: List[int]       # true B per batch
    batch_frames: List[int]      # real frames per batch

    @property
    def n(self):
        return int(self.idxs.shape[0])

    @property
    def bp(self):
        return int(self.idxs.shape[1])


@dataclass
class EpochPlan:
    groups: List[PlanGroup]
    videos: int
    frames: int

    @property
    def n(self):
        return sum(g.n for g in self.groups)


@dataclass
class ResidentCorpus:
    """Device tensors + host-side batch planning for one datasplit."""

    device_args: Tuple[Any, ...]   # (feat, length, gt[, cons][, end]) on device
    with_cons: bool
    with_end: bool
    t_max: int
    c_max: int
    n_classes: int
    nbytes: int
    row_of: Dict[Tuple[str, str], int]
    host_len: np.ndarray           # (N,) int32
    task_vc: Dict[str, np.ndarray]   # task -> (Cmax,) int32 padded vc
    task_inv: Dict[str, np.ndarray]  # task -> (C,) int32 inv map
    videos_by_task: Dict[str, Any]
    datasplit: Any = field(repr=False, default=None)  # keeps id() stable

    def _length_of(self, key):
        # missing (unloadable) videos sort as 0, the same convention as
        # iter_batches' exact-length fallback (data/batching.py)
        row = self.row_of.get(key)
        return int(self.host_len[row]) if row is not None else 0

    def make_plan(self, batch_size, shuffle, seed, limit=None,
                  sort_by_length=False, pad_rows_to=1,
                  global_order=False) -> EpochPlan:
        """The SAME batch composition as iter_batches (make_batch_keys
        chunking + seeded batch-granularity shuffle), expressed as
        index-matrix groups.

        `global_order=True` (training): ONE group containing every
        batch in the original shuffled epoch order, padded to the
        widest batch's length bucket — the sequential Adam chain then
        applies updates in exactly the streaming loop's order. The
        padding waste is device compute, which is ~50x below the epoch
        wall clock (docs/DESIGN.md §9), so order parity costs nothing
        observable.

        `global_order=False` (decode): one group per length bucket —
        batch execution is REORDERED (stable within a group), which is
        only safe when results are position-keyed and order-independent.
        Batch contents, padded widths, and per-batch PRNG keys (folded
        from the original epoch batch index) are identical to the
        streaming path either way.

        `pad_rows_to`: round the row width Bp up to this multiple (the
        mesh's data-axis size under --data_parallel, matching
        pad_batch_for_mesh's pad_to=batch_size convention so per-row z
        keys line up with the streaming dp path); pad rows carry
        idx=-1 / weight 0."""
        # sort-key parity with iter_batches: prefer the datasplit's
        # annotation-based approx_length (what the streaming decode
        # sorts by) over the exact post-subsample host_len, so batch
        # COMPOSITION is identical between the two paths
        length_of = None
        if sort_by_length:
            length_of = getattr(self.datasplit, "approx_length", None)
            if length_of is None:
                length_of = self._length_of
        keys_batches = make_batch_keys(
            self.videos_by_task, batch_size, batch_by_task=True,
            shuffle=shuffle, seed=seed, length_of=length_of,
        )
        entries = []  # (bix, task, rows, fsum, t_width, keys) in epoch order
        videos = 0
        frames = 0
        bix = -1
        for keys in keys_batches:
            present = [k for k in keys if k in self.row_of]
            if not present:
                # iter_batches yields nothing for an all-missing batch,
                # so the streaming loop's batch_ix (and hence fold_key
                # rng and --train_limit counting) skips it too
                continue
            rows = [self.row_of[k] for k in present]
            bix += 1
            if limit and bix >= limit:
                break
            lens = self.host_len[rows]
            t_width = pad_length_to_bucket(int(lens.max()))
            task = keys[0][0]
            entries.append((bix, task, rows, int(lens.sum()), t_width, present))
            videos += len(rows)
            frames += int(lens.sum())

        def _make_group(t_width, grp_entries):
            n = len(grp_entries)
            Bp = -(-batch_size // max(pad_rows_to, 1)) * max(pad_rows_to, 1)
            idxs = np.full((n, Bp), -1, np.int32)
            vcs = np.zeros((n, self.c_max), np.int32)
            invs = np.zeros((n, self.n_classes), np.int32)
            bixs = np.zeros(n, np.int32)
            bws = np.zeros(n, np.float32)
            g_keys, g_sizes, g_frames = [], [], []
            for i, (bix, task, rows, fsum, _, keys_b) in enumerate(grp_entries):
                idxs[i, : len(rows)] = rows
                vcs[i] = self.task_vc[task]
                invs[i] = self.task_inv[task]
                bixs[i] = bix
                bws[i] = float(len(rows))
                g_keys.append(keys_b)
                g_sizes.append(len(rows))
                g_frames.append(fsum)
            return PlanGroup(
                t_width=t_width, idxs=idxs, vcs=vcs, invs=invs, bixs=bixs,
                bws=bws, keys=g_keys, batch_sizes=g_sizes,
                batch_frames=g_frames,
            )

        if global_order:
            groups = (
                [_make_group(max(e[4] for e in entries), entries)]
                if entries else []
            )
        else:
            by_width: "OrderedDict[int, list]" = OrderedDict()
            for e in entries:
                by_width.setdefault(e[4], []).append(e)
            groups = [
                _make_group(w, by_width[w]) for w in sorted(by_width)
            ]
        return EpochPlan(groups=groups, videos=videos, frames=frames)


def resident_views(res, with_cons, with_end):
    """Unpack the resident device tuple (ResidentCorpus.device_args
    layout: feat, length, gt[, cons][, end]) into named views; absent
    optional tensors come back as None."""
    feat, length, gt = res[0], res[1], res[2]
    k = 3
    cons_r = None
    end_r = None
    if with_cons:
        cons_r = res[k]
        k += 1
    if with_end:
        end_r = res[k]
    return feat, length, gt, cons_r, end_r


def gather_resident_rows(feat, length, gt, cons_r, end_r, idx, t_width, Cw):
    """Traceable on-device gather of one batch's rows from the resident
    corpus (idx = -1 rows become weight-0 length-1 dummies, the same
    convention as SemiMarkovModel._pad_batch_rows — a 0-length DP would
    NaN the batch). gt=None (decode) returns g=None. Shared by the
    single-device scan programs (models/semimarkov.py) and the sharded
    mesh scans (parallel/mesh.py)."""
    import jax.numpy as jnp

    valid = idx >= 0
    ri = jnp.clip(idx, 0)
    Bl = idx.shape[0]
    f = feat[ri, :t_width]
    l = jnp.where(valid, length[ri], 1)
    g = gt[ri, :t_width] if gt is not None else None
    w = valid.astype(jnp.float32)
    c = (
        cons_r[ri, :t_width]
        if cons_r is not None
        else jnp.zeros((Bl, t_width, Cw), jnp.float32)
    )
    e = (
        end_r[ri]
        if end_r is not None
        else jnp.zeros((Bl, Cw), jnp.float32)
    )
    return f, l, g, w, c, e


def build_epoch_scan_fn(step_terms, tx, with_cons, with_end):
    """Shared body of the resident epoch scan — the ONE definition of
    "scan the plan's batches: gather, fold the PRNG, take a step, fold
    stats, snapshot the log vector". The single-device program
    (models/semimarkov.py _build_epoch_scan) and the mesh program
    (parallel/mesh.py build_sharded_epoch_scan) differ ONLY in how a
    batch's loss/grads are produced, so that is the injection point:

      step_terms(params, f, l, vc, inv, g, c, e, w, rng)
        -> (loss, aux, grads)

    (single-device: value_and_grad + trainable mask; sharded:
    local-share value_and_grad + psum over 'data' + term reduction).
    Returns fn(params, opt_state, stats, lr, base_rng, epoch, res,
    idxs, vcs, invs, bixs, bws, t_width) -> (params, opt_state, stats,
    losses (n,), snaps (n*5,)); `t_width` must be static at jit time.
    """
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.models.base import (
        apply_lr,
        fold_key,
        fold_stats,
        global_norm,
    )

    def fn(params, opt_state, stats, lr, base_rng, epoch, res,
           idxs, vcs, invs, bixs, bws, t_width):
        feat, length, gt, cons_r, end_r = resident_views(
            res, with_cons, with_end
        )
        Cw = vcs.shape[1]

        def body(carry, xs):
            params, opt_state, stats = carry
            idx, vc, inv, bix, bw = xs
            f, l, g, w, c, e = gather_resident_rows(
                feat, length, gt, cons_r, end_r, idx, t_width, Cw
            )
            rng = fold_key(base_rng, epoch, bix)
            loss, aux, grads = step_terms(
                params, f, l, vc, inv, g, c, e, w, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, apply_lr(updates, lr)
            )
            stats = fold_stats(stats, loss, aux, bw)
            snap = jnp.stack([
                global_norm(grads),
                jnp.asarray(lr, jnp.float32),
                stats[2], stats[3], stats[4],
            ])
            return (params, opt_state, stats), (loss, snap)

        (params, opt_state, stats), (losses, snaps) = jax.lax.scan(
            body, (params, opt_state, stats),
            (idxs, vcs, invs, bixs, bws),
        )
        return params, opt_state, stats, losses, jnp.reshape(snaps, (-1,))

    return fn


def build_decode_scan_fn(decode, with_cons, with_end):
    """Shared body of the resident decode scan (see build_epoch_scan_fn
    — the injection point here is the per-batch `decode(params, f, l,
    vc, c, e, rng) -> (labels, scores)` closure). Returns
    fn(params, base_rng, res, idxs, vcs, bixs, t_width) -> labels
    (n, Bp, t_width) int32; callers flatten/shard as they need."""
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.models.base import fold_key

    def fn(params, base_rng, res, idxs, vcs, bixs, t_width):
        feat, length, _, cons_r, end_r = resident_views(
            res, with_cons, with_end
        )
        Cw = vcs.shape[1]

        def body(_, xs):
            idx, vc, bix = xs
            f, l, _, _, c, e = gather_resident_rows(
                feat, length, None, cons_r, end_r, idx, t_width, Cw
            )
            rng = fold_key(base_rng, 0, bix)
            labels, _ = decode(params, f, l, vc, c, e, rng)
            return 0, labels.astype(jnp.int32)

        _, labels = jax.lax.scan(body, 0, (idxs, vcs, bixs))
        return labels

    return fn


def pad_class_width(n_sub, class_bucket, lanes):
    """THE class-count bucketing rule (shared by the streaming
    collation SemiMarkovModel._batch_device_args and the resident
    build below — one definition so the two paths cannot drift): pad
    to a multiple of --sm_class_shape_bucket so tasks with different
    step counts reuse one compiled program, but never past the Pallas
    lane width when the true count fits in it (pallas_supported()
    checks the unpadded count; a padded C above the lane width would
    crash the kernels' lane packing at trace time)."""
    bucket = max(1, class_bucket or 1)
    cp = -(-n_sub // bucket) * bucket
    if n_sub <= lanes:
        cp = min(cp, lanes)
    return cp


def build_resident_corpus(
    model, datasplit, use_narration, budget_mb, reason_out=None, mesh=None
):
    """Build the resident tensors for `datasplit`, or return None when
    they exceed `budget_mb` (callers fall back to per-batch streaming).

    Semantics per video row mirror the streaming collation exactly:
    features/gt zero-padded to the largest length bucket, narration
    constraints expanded to task-local class columns and scaled by
    --sm_constrain_narration_weight (models/semimarkov.py
    _batch_device_args), end masks 0/BIG_NEG over the padded class
    width with BIG_NEG beyond each task's true class count.

    `reason_out` (a dict, optional) receives why a build returned None:
    'budget' (could succeed once pinned entries free up) vs 'inherent'
    (empty split / mixed narration coverage — no budget would help).
    `mesh` (optional) places the tensors replicated over the mesh AT
    BUILD TIME — one transfer — instead of committing to device 0 and
    re-placing in replicate_resident (a second full-corpus transfer
    through the ~1.5 GB/s tunnel).
    """
    import jax

    from action_segmentation_tpu.ops.hsmm_pallas import LANES

    def _why(why):
        if reason_out is not None:
            reason_out["why"] = why

    if budget_mb <= 0:
        # bail BEFORE the corpus read below: a budget-exhausted build
        # would otherwise pay a full feature-set disk read (~hundreds
        # of MB for CrossTask PCA) just to return None
        _why("budget")
        return None

    args = model.args
    C = model.n_classes

    # one pass over the datasplit: rows in deterministic (task, video)
    # order; missing samples are skipped exactly like collate() does
    rows = []
    per_task_vc = {}
    for task in sorted(datasplit.videos_by_task.keys()):
        for name in sorted(datasplit.videos_by_task[task]):
            sample = datasplit[(task, name)]
            if sample is None:
                continue
            if task not in per_task_vc:
                per_task_vc[task] = np.asarray(sample["task_indices"], np.int32)
            rows.append((task, name, sample))
    if not rows:
        _why("inherent")
        return None

    c_max = max(
        pad_class_width(len(vc), getattr(args, "sm_class_shape_bucket", 1), LANES)
        for vc in per_task_vc.values()
    )
    lengths = np.array([s["features"].shape[0] for _, _, s in rows], np.int32)
    t_max = pad_length_to_bucket(int(lengths.max()))
    N = len(rows)
    D = rows[0][2]["features"].shape[1]

    have_cons = [s.get("constraints") is not None for _, _, s in rows]
    with_cons = bool(use_narration and all(have_cons))
    if use_narration and any(have_cons) and not all(have_cons):
        # mixed corpus: the streaming path applies penalties batch by
        # batch; a resident build would silently drop them for every
        # video, so stream instead (parity over speed)
        from action_segmentation_tpu.utils import logger

        logger.debug(
            "resident corpus: %d/%d videos lack narration constraints; "
            "falling back to per-batch streaming",
            len(have_cons) - sum(have_cons), len(have_cons),
        )
        _why("inherent")
        return None
    with_end = model.module.allowed_ends is not None

    nbytes = N * t_max * (D + 1) * 4 + N * 4
    if with_cons:
        nbytes += N * t_max * c_max * 4
    if with_end:
        nbytes += N * c_max * 4
    if nbytes > budget_mb * (1 << 20):
        _why("budget")
        return None

    feat = np.zeros((N, t_max, D), np.float32)
    gt = np.zeros((N, t_max), np.int32)
    cons = np.zeros((N, t_max, c_max), np.float32) if with_cons else None
    end = np.full((N, c_max), BIG_NEG, np.float32) if with_end else None
    row_of = {}
    task_vc = {}
    task_inv = {}
    task_pad_row = {}
    for task, vc in per_task_vc.items():
        vcp = np.full(c_max, -1, np.int32)
        vcp[: len(vc)] = vc
        task_vc[task] = vcp
        inv = np.zeros(C, np.int32)
        inv[vc] = np.arange(len(vc), dtype=np.int32)
        task_inv[task] = inv

    for i, (task, name, sample) in enumerate(rows):
        L = int(lengths[i])
        row_of[(task, name)] = i
        feat[i, :L] = sample["features"]
        if "gt_single" in sample:
            gt[i, :L] = np.asarray(sample["gt_single"], np.int32)
        vc = per_task_vc[task]
        if with_cons:
            expanded = model._expand_constraints(
                datasplit, task, vc, sample["constraints"][None]
            )[0]
            cons[i, :L, : len(vc)] = (
                expanded * args.sm_constrain_narration_weight
            )
            # streaming parity: collate zero-pads constraints past each
            # video's length BEFORE expansion, and 1-0=1 puts a penalty
            # at every step column on padded frames (masked out of the
            # DP by the end fold, but kept bit-identical here). The pad
            # row depends only on the task; memoize across its videos.
            pad_row = task_pad_row.get(task)
            if pad_row is None:
                pad_row = model._expand_constraints(
                    datasplit, task, vc,
                    np.zeros(
                        (1, 1, sample["constraints"].shape[1]), np.float32
                    ),
                )[0, 0]
                task_pad_row[task] = pad_row
            cons[i, L:, : len(vc)] = (
                pad_row * args.sm_constrain_narration_weight
            )
        if with_end:
            end[i, : len(vc)] = model._end_mask_row(vc, task, L)

    dev = [feat, lengths, gt]
    if with_cons:
        dev.append(cons)
    if with_end:
        dev.append(end)
    if mesh is not None:
        from action_segmentation_tpu.parallel.mesh import replicated

        device_args = jax.device_put(tuple(dev), replicated(mesh))
    else:
        device_args = jax.device_put(tuple(dev))
    # either way ONE batched transfer (device_put takes a pytree)

    out = ResidentCorpus(
        device_args=device_args,
        with_cons=with_cons,
        with_end=with_end,
        t_max=t_max,
        c_max=c_max,
        n_classes=C,
        nbytes=nbytes,
        row_of=row_of,
        host_len=lengths,
        task_vc=task_vc,
        task_inv=task_inv,
        videos_by_task=datasplit.videos_by_task,
        datasplit=datasplit,
    )
    if mesh is not None:
        # replicate_resident sees the placement and skips its re-put
        out._mesh_placed = mesh
    return out
