"""Hidden semi-Markov segmentation model, TPU-native.

Counterpart of the reference's SemiMarkovModel / SemiMarkovModule
(src/models/semimarkov/semimarkov.py, semimarkov_modules.py) redesigned
around pure jitted functions:

* parameters are a plain pytree (Poisson log-rates, Gaussian means, tied
  diagonal covariance, transition/init logits, optional NICE flow params);
* factor construction (masked softmaxes, Poisson table, batched Gaussian
  emission matmul) + the banded semi-Markov DP are fused in one jitted
  step — no b x N x K x C x C edge tensor, no host round-trips;
* class subsetting (`valid_classes`), class merging, canonical-ordering
  transition constraints, narration penalties, and per-instance allowed
  ends are all expressed as device-side gathers/masks, so one compiled
  program serves every task with the same (C_sub, T_bucket, B) shape;
* supervised training scores gold spans in closed form or by gradient,
  unsupervised training maximizes the marginal likelihood (partition),
  exactly mirroring the reference's losses (semimarkov.py:253-272).
"""

import functools
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.data.batching import iter_batches
from action_segmentation_tpu.models import flow as nice_flow
from action_segmentation_tpu.models.base import (
    Model,
    apply_lr,
    fold_key as _fold_key,
    fold_stats as _fold_stats,
    global_norm,
    make_optimizer,
    mask_grads,
)
from action_segmentation_tpu.ops.distributions import (
    gaussian_emission_log_probs,
    initial_log_probs,
    poisson_length_log_probs,
    transition_log_probs,
)
from action_segmentation_tpu.ops.hsmm import (
    HsmmPotentials,
    hsmm_gold_score,
    hsmm_partition,
    hsmm_viterbi,
)
from action_segmentation_tpu.ops.span_codec import labels_to_spans, spans_to_labels
from action_segmentation_tpu.ops.stats import semimarkov_sufficient_stats
from action_segmentation_tpu.utils import all_equal, logger


def _constraint_buffers(n_classes, allowed_starts, allowed_transitions, allowed_ends):
    """Boolean disallowed-masks from allowed sets (semimarkov_modules.py:169-193)."""
    if allowed_starts is None:
        return None, None, None
    init_dis = np.ones(n_classes, bool)
    init_dis[sorted(allowed_starts)] = False
    trans_dis = np.ones((n_classes, n_classes), bool)
    for src, targets in allowed_transitions.items():
        for tgt in targets:
            trans_dis[tgt, src] = False
    return init_dis, trans_dis, allowed_ends


class GaussianHsmm:
    """Gaussian-emission HSMM parameterization (SemiMarkovModule parity)."""

    batched_factors = False

    def __init__(
        self,
        args,
        n_classes,
        n_dims,
        allow_self_transitions=False,
        allowed_starts=None,
        allowed_transitions=None,
        allowed_ends=None,
        merge_classes=None,
        seed=0,
    ):
        self.args = args
        self.n_classes = n_classes
        self.feature_dim = n_dims
        self.allow_self_transitions = allow_self_transitions
        # --sm_hidden_markov fixes K=1 (degenerate HSMM -> HMM); the
        # reference declares but never wires this flag — its help text
        # ("fix K=1") is honored here
        self.max_k = (
            1 if getattr(args, "sm_hidden_markov", False) else args.sm_max_span_length
        )
        self.init_dis, self.trans_dis, self.allowed_ends = _constraint_buffers(
            n_classes, allowed_starts, allowed_transitions, allowed_ends
        )
        if merge_classes is not None:
            mm = np.arange(n_classes)
            for src, sink in merge_classes.items():
                mm[src] = sink
            self.merge_map = mm
        else:
            self.merge_map = None
        self.params = self.init_params(jax.random.PRNGKey(seed))
        if getattr(args, "sm_init_non_projection_parameters_from", None):
            self._load_nonprojection_params(args.sm_init_non_projection_parameters_from)

    def init_params(self, rng):
        k_init, k_flow = jax.random.split(rng)
        params = {
            "poisson_log_rates": jnp.zeros(self.n_classes, jnp.float32),
            "gaussian_means": jnp.zeros((self.n_classes, self.feature_dim), jnp.float32),
            "gaussian_cov": jnp.ones(self.feature_dim, jnp.float32),
            "transition_logits": jnp.zeros((self.n_classes, self.n_classes), jnp.float32),
            "init_logits": jax.random.uniform(k_init, (self.n_classes,), jnp.float32),
        }
        if getattr(self.args, "sm_feature_projection", False):
            params["feature_projector"] = nice_flow.nice_init(
                k_flow, self.args, self.feature_dim
            )
        return params

    def _load_nonprojection_params(self, path):
        """Warm-start every non-flow parameter from a serialized model
        (semimarkov_modules.py:90-94, :125-129)."""
        from action_segmentation_tpu.checkpoint import init_subset_from

        logger.debug(f"loading all non-flow parameters from {path}")
        with open(path, "rb") as f:
            other = pickle.load(f)
        src = other.module.params if hasattr(other, "module") else other
        src = {k: jnp.asarray(v) for k, v in src.items()}
        self.params = init_subset_from(self.params, src)

    @property
    def trainable_mask(self):
        """Pytree of bools: gaussian_cov is frozen (modules.py:150-151)."""
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "gaussian_cov" not in str(path[0]), self.params
        )

    # ----- factor computation (runs under jit) -----

    def project_features(self, params, features, lengths=None):
        if "feature_projector" in params:
            if features.ndim == 3 and lengths is not None:
                # mask the log-det to real frames: with --flow_scale the
                # padded frames contribute nonzero scale outputs, making
                # the loss depend on the length bucket
                h, ld_steps = nice_flow.nice_apply(
                    params["feature_projector"], features, per_step=True
                )
                mask = (
                    jnp.arange(features.shape[1])[None, :] < lengths[:, None]
                ).astype(ld_steps.dtype)
                return h, (ld_steps * mask).sum(axis=1)
            return nice_flow.nice_apply(params["feature_projector"], features)
        return features, jnp.zeros(features.shape[0], jnp.float32)

    def compute_potentials(
        self, params, features, lengths, vc, constraints_add, end_allowed, rng,
        use_mean_z, key_offset=0, axis_name=None,
    ):
        """Build batched HsmmPotentials for valid classes `vc` (C_sub,).

        constraints_add: (B, T, C_sub) additive emission penalties (zeros
        when unused); end_allowed: (B, C_sub) additive end mask.
        `key_offset` is part of the shared module interface (the compound
        model's per-video z keys); the Gaussian module draws no noise.
        Returns (pots, log_det (B,), kl (B,)).

        vc entries of -1 are shape padding (class-count bucketing, so
        tasks with different class counts share one compiled program):
        their initial/transition rows are masked to BIG_NEG before every
        softmax, so they carry no probability mass and are never
        decoded; parameter gathers use a clipped index.
        """
        B = features.shape[0]
        C_sub = vc.shape[0]
        pad = vc < 0
        vcs = jnp.where(pad, 0, vc)
        mvc = jnp.asarray(self.merge_map)[vcs] if self.merge_map is not None else vcs

        init_mask = pad
        if self.init_dis is not None:
            init_mask = init_mask | jnp.asarray(self.init_dis)[vcs]
        init = initial_log_probs(params["init_logits"][vcs], init_mask)
        trans_mask = pad[:, None] | pad[None, :]
        if self.trans_dis is not None:
            trans_mask = trans_mask | jnp.asarray(self.trans_dis)[vcs][:, vcs]
        trans = transition_log_probs(
            params["transition_logits"][vcs][:, vcs],
            trans_mask,
            self.allow_self_transitions,
        )
        lens = poisson_length_log_probs(params["poisson_log_rates"][mvc], self.max_k)

        feats, log_det = self.project_features(params, features, lengths)
        cov = jax.lax.stop_gradient(params["gaussian_cov"])
        emit = gaussian_emission_log_probs(feats, params["gaussian_means"][mvc], cov)
        emit = emit + constraints_add

        pots = HsmmPotentials(
            trans=jnp.broadcast_to(trans, (B,) + trans.shape),
            init=jnp.broadcast_to(init, (B,) + init.shape),
            lens=jnp.broadcast_to(lens, (B,) + lens.shape),
            emit=emit,
            end_mask=end_allowed,
        )
        kl = jnp.zeros(B, jnp.float32)
        return pots, log_det, kl

    # ----- closed-form + moment initialization (host side) -----

    def initialize_gaussian(self, feature_list):
        """Mean/variance moment init (semimarkov_modules.py:263-282)."""
        feats = np.concatenate([np.asarray(f) for f in feature_list], axis=0)
        if "feature_projector" in self.params:
            feats = np.asarray(
                nice_flow.nice_apply(self.params["feature_projector"], jnp.asarray(feats))[0]
            )
        mean = feats.mean(axis=0)
        var = feats.var(axis=0, ddof=1)
        self.params["gaussian_means"] = jnp.broadcast_to(
            jnp.asarray(mean, jnp.float32), (self.n_classes, self.feature_dim)
        ).copy()
        self.params["gaussian_cov"] = jnp.asarray(var, jnp.float32)

    def fit_supervised(self, feature_list, label_list):
        """Smoothed closed-form MLE (semimarkov_modules.py:195-256)."""
        if "feature_projector" in self.params:
            raise NotImplementedError("closed-form fit with feature projector")
        if self.trans_dis is not None or self.init_dis is not None:
            raise NotImplementedError("closed-form fit with constrained transitions")
        stats = semimarkov_sufficient_stats(
            feature_list, label_list, n_classes=self.n_classes, max_k=self.max_k
        )
        if self.merge_map is not None:
            merged_labels = [self.merge_map[np.asarray(l)] for l in label_list]
            stats_merged = semimarkov_sufficient_stats(
                feature_list, merged_labels, n_classes=self.n_classes, max_k=self.max_k
            )
        else:
            stats_merged = stats

        ss = self.args.sm_supervised_state_smoothing
        ls = self.args.sm_supervised_length_smoothing

        init_probs = (stats["span_start_counts"] + ss) / float(
            stats["instance_count"] + ss * self.n_classes
        )
        init_probs[np.isnan(init_probs)] = 0
        with np.errstate(divide="ignore"):
            self.params["init_logits"] = jnp.asarray(np.log(init_probs), jnp.float32)

            smoothed = stats["span_transition_counts"] + ss
            trans_probs = smoothed / smoothed.sum(axis=0)[None, :]
            trans_probs[np.isnan(trans_probs)] = 0
            self.params["transition_logits"] = jnp.asarray(
                np.log(trans_probs), jnp.float32
            )

            mean_lengths = (stats_merged["span_lengths"] + ls) / (
                stats_merged["span_counts"] + ls
            )
            self.params["poisson_log_rates"] = jnp.asarray(
                np.log(mean_lengths), jnp.float32
            )
        self.params["gaussian_means"] = jnp.asarray(stats_merged["gaussian_means"])
        self.params["gaussian_cov"] = jnp.asarray(stats_merged["gaussian_cov"])


class SemiMarkovModel(Model):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--sm_max_span_length", type=int, default=20)
        parser.add_argument(
            "--sm_class_shape_bucket",
            type=int,
            default=4,
            help="round each task's class count up to a multiple of this "
            "for jit shapes (padded classes are exactly masked out), so "
            "tasks with different step counts share compiled programs; "
            "1 disables",
        )
        parser.add_argument(
            "--sm_device_resident_mb",
            type=int,
            default=1024,
            help="HBM budget (MB) for keeping a datasplit's tensors "
            "device-resident: epochs/decodes then run as scan "
            "programs with on-device batch gathers instead of "
            "per-batch host transfers (data/resident.py; under "
            "--data_parallel the scans are shard_map'd over the mesh). "
            "Corpora over budget and --batch_accumulation stream "
            "per batch. 0 disables",
        )
        parser.add_argument("--sm_supervised_state_smoothing", type=float, default=1e-2)
        parser.add_argument("--sm_supervised_length_smoothing", type=float, default=1e-1)
        parser.add_argument(
            "--sm_supervised_method",
            choices=["closed-form", "gradient-based", "closed-then-gradient"],
            default="closed-form",
        )
        parser.add_argument("--sm_feature_projection", action="store_true", help="use a flow")
        parser.add_argument("--sm_init_non_projection_parameters_from")
        nice_flow.add_args(parser)
        from action_segmentation_tpu.models.compound import ComponentHsmm

        ComponentHsmm.add_args(parser)
        parser.add_argument("--sm_component_model", action="store_true")
        parser.add_argument("--sm_constrain_transitions", action="store_true")
        parser.add_argument(
            "--sm_constrain_with_narration",
            choices=["train", "test"],
            nargs="*",
            default=[],
        )
        parser.add_argument("--sm_constrain_narration_weight", type=float, default=-1e4)
        parser.add_argument("--sm_train_discriminatively", action="store_true")
        parser.add_argument(
            "--sm_hidden_markov",
            action="store_true",
            help="train as hidden markov model (fix K=1)",
        )
        parser.add_argument("--sm_predict_single", action="store_true")

    @classmethod
    def from_args(cls, args, train_data):
        n_classes = train_data.corpus.n_classes
        feature_dim = train_data.feature_dim
        allow_self_transitions = True

        assert args.sm_max_span_length is not None
        if args.sm_constrain_transitions:
            (
                allowed_starts,
                allowed_transitions,
                allowed_ends,
                ordered_indices_by_task,
            ) = train_data.get_allowed_starts_and_transitions()
            if allow_self_transitions:
                for src in range(n_classes):
                    allowed_transitions.setdefault(src, set()).add(src)
        else:
            allowed_starts = allowed_transitions = allowed_ends = None
            ordered_indices_by_task = None

        if args.annotate_background_with_previous and not args.no_merge_classes:
            merge_classes = {}
            for task, indices in train_data.corpus._indices_by_task.items():
                bkg = [ix for ix in indices if ix in train_data.corpus._background_indices]
                non_bkg = [ix for ix in indices if ix not in train_data.corpus._background_indices]
                canon = bkg[0]
                for ix in bkg:
                    assert merge_classes.get(ix, canon) == canon
                    merge_classes[ix] = canon
                for ix in non_bkg:
                    assert merge_classes.get(ix, ix) == ix
                    merge_classes[ix] = ix
        else:
            merge_classes = None

        if args.sm_component_model:
            from action_segmentation_tpu.models.compound import ComponentHsmm

            if args.sm_component_decompose_steps:
                n_components = train_data.corpus.n_components
                class_to_components = dict(train_data.corpus.label_indices2component_indices)
            else:
                n_components = n_classes
                class_to_components = {c: {c} for c in range(n_classes)}
            module = ComponentHsmm(
                args,
                n_classes,
                n_components=n_components,
                class_to_components=class_to_components,
                feature_dim=feature_dim,
                allow_self_transitions=allow_self_transitions,
                allowed_starts=allowed_starts,
                allowed_transitions=allowed_transitions,
                allowed_ends=allowed_ends,
                merge_classes=merge_classes,
                seed=getattr(args, "seed", 0) or 0,
            )
        else:
            module = GaussianHsmm(
                args,
                n_classes,
                feature_dim,
                allow_self_transitions=allow_self_transitions,
                allowed_starts=allowed_starts,
                allowed_transitions=allowed_transitions,
                allowed_ends=allowed_ends,
                merge_classes=merge_classes,
                seed=getattr(args, "seed", 0) or 0,
            )
        return SemiMarkovModel(args, n_classes, feature_dim, module, ordered_indices_by_task)

    def __init__(self, args, n_classes, feature_dim, module, ordered_indices_by_task=None):
        self.args = args
        self.n_classes = n_classes
        self.feature_dim = feature_dim
        self.module = module
        self.ordered_indices_by_task = ordered_indices_by_task
        self._jit_cache = {}

    # pickling: drop compiled closures and device-resident corpora
    # (rebuilt lazily on demand), keep numpy params
    def __getstate__(self):
        import copy

        state = dict(self.__dict__)
        state["_jit_cache"] = {}
        state.pop("_resident_cache", None)
        state.pop("_resident_pins", None)
        state.pop("_resident_failed", None)
        # the live plateau controller holds a jitted closure (not
        # picklable); resume restores its state from the checkpoint
        # sidecar, not the pickle
        state.pop("_scheduler", None)
        # shallow-copy the module so converting params to numpy for the
        # pickle never mutates the LIVE object: a driver that saves and
        # keeps decoding with the same model would otherwise re-upload
        # every param leaf per dispatch (and drop dp shardings)
        mod = copy.copy(state["module"])
        mod.params = jax.tree_util.tree_map(np.asarray, mod.params)
        state["module"] = mod
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.module.params = jax.tree_util.tree_map(jnp.asarray, self.module.params)

    # ----- host-side batch preparation -----

    def _batch_device_args(self, batch, datasplit, use_narration):
        """Extract shared valid classes and build dense per-batch arrays."""
        tasks = batch["task_name"]
        assert all_equal(
            tuple(ti.tolist()) for ti in batch["task_indices"]
        ), "batch must share valid_classes"
        vc = np.asarray(batch["task_indices"][0], np.int32)
        C_sub = len(vc)
        B, T = batch["features"].shape[:2]

        inv_map = np.zeros(self.n_classes, np.int32)
        inv_map[vc] = np.arange(C_sub, dtype=np.int32)

        if use_narration and "constraints" in batch:
            cons = self._expand_constraints(datasplit, tasks[0], vc, batch["constraints"])
            cons = cons * self.args.sm_constrain_narration_weight
        else:
            cons = np.zeros((B, T, C_sub), np.float32)

        end_allowed = np.zeros((B, C_sub), np.float32)
        if self.module.allowed_ends is not None:
            for i in range(B):
                end_allowed[i] = self._end_mask_row(
                    vc, tasks[i], batch["lengths"][i]
                )

        # class-count bucketing: pad the valid-class set with -1
        # sentinels (masked to BIG_NEG in compute_potentials) so tasks
        # with different step counts reuse one compiled program per
        # length bucket — jit compiles are minutes each through the
        # remote-TPU tunnel. The width rule is shared with the
        # resident-corpus build (resident.pad_class_width).
        from action_segmentation_tpu.data.resident import pad_class_width
        from action_segmentation_tpu.ops.hsmm_pallas import LANES

        Cp = pad_class_width(
            C_sub, getattr(self.args, "sm_class_shape_bucket", 1), LANES
        )
        if Cp > C_sub:
            extra = Cp - C_sub
            vc = np.concatenate([vc, np.full(extra, -1, np.int32)])
            cons = np.pad(cons, ((0, 0), (0, 0), (0, extra)))
            end_allowed = np.pad(
                end_allowed, ((0, 0), (0, extra)), constant_values=BIG_NEG
            )

        return vc, inv_map, cons.astype(np.float32), end_allowed

    def _pad_batch_rows(self, features, lengths, gt, cons, end_allowed):
        """Pad the batch to --batch_size rows (weight-0, length-1
        dummies) so partial final batches reuse the full batch's
        compiled program; returns (padded arrays..., weights (Bp,))."""
        B = len(lengths)
        Bp = max(int(getattr(self.args, "batch_size", B) or B), B)
        weights = np.zeros(Bp, np.float32)
        weights[:B] = 1.0
        if Bp > B:
            def padz(arr):
                arr = np.asarray(arr)
                return np.pad(arr, [(0, Bp - B)] + [(0, 0)] * (arr.ndim - 1))

            features = padz(features)
            gt = padz(gt)
            cons = padz(cons)
            end_allowed = padz(end_allowed)
            lengths = np.concatenate(
                [np.asarray(lengths), np.ones(Bp - B, np.asarray(lengths).dtype)]
            )
        return features, lengths, gt, cons, end_allowed, weights

    def _expand_constraints(self, datasplit, task, vc, constraints):
        """(B, T, K_steps) narration 0/1 -> (B, T, C_sub) penalties of
        (1 - constraint) at each step's column (semimarkov.py:149-157)."""
        vc_list = list(vc)
        step_indices = datasplit.get_ordered_indices_no_background()[task]
        B, T, Ks = constraints.shape
        assert Ks == len(step_indices), (Ks, len(step_indices))
        expanded = np.zeros((B, T, len(vc_list)), np.float32)
        for index, label in enumerate(step_indices):
            expanded[:, :, vc_list.index(label)] = 1.0 - constraints[:, :, index]
        return expanded

    def _end_mask_row(self, vc, task, length):
        """THE 0/BIG_NEG end-mask row for one video over valid classes
        `vc` — shared by the streaming collation above and the
        resident-corpus build (data/resident.py) so the two paths
        cannot drift: allowed ends plus the mid-canonical-order
        exception for short videos."""
        addl = self._make_additional_allowed_ends([task], [length])[0]
        allowed = set(self.module.allowed_ends) | set(addl)
        mask = np.array([ix in allowed for ix in vc])
        assert mask.any(), "no allowed end classes for instance"
        return np.where(mask, 0.0, BIG_NEG).astype(np.float32)

    def _make_additional_allowed_ends(self, tasks, lengths):
        """Allow ending mid-canonical-order for videos shorter than the
        step sequence (semimarkov.py:135-147)."""
        if self.ordered_indices_by_task is None:
            return [[] for _ in tasks]
        addl = []
        for task, length in zip(tasks, lengths):
            ord_indices = self.ordered_indices_by_task[task]
            if int(length) < len(ord_indices):
                addl.append([ord_indices[int(length) - 1]])
            else:
                addl.append([])
        return addl

    # ----- jitted step builders -----

    def _get_jitted(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _build_loss_fn(self, use_labels):
        from action_segmentation_tpu.ops.hsmm_grad import hsmm_partition_fast
        from action_segmentation_tpu.ops.hsmm_pallas import pallas_supported

        module = self.module
        K = module.max_k
        discriminative = getattr(self.args, "sm_train_discriminatively", False)
        use_pallas = pallas_supported(self.n_classes)

        def loss_fn(params, features, lengths, vc, inv_map, gt, cons, end_allowed, weights, rng):
            # marginal-likelihood training runs the partition through the
            # custom-VJP Pallas forward/backward when on TPU (the forward
            # kernel streams time chunks, so T is unbounded).
            # `weights` (B,) supports batches padded to a fixed size for
            # jit-shape reuse: padded rows get weight 0 and every mean is
            # weighted, so padding never changes the loss.
            partition_fn = hsmm_partition_fast if use_pallas else hsmm_partition
            # padded rows carry length 0; clamp to a well-defined
            # length-1 DP exactly like the mesh paths
            # (parallel/mesh.py _local_loss_terms) so single-device and
            # --data_parallel trajectories stay bit-comparable even for
            # degenerate 0-frame rows (their terms are weight-0 anyway)
            lengths = jnp.maximum(lengths, 1)
            denom = jnp.maximum(weights.sum(), 1.0)

            def wmean(x):
                return jnp.sum(x * weights) / denom

            pots, log_det, kl = module.compute_potentials(
                params, features, lengths, vc, cons, end_allowed, rng, use_mean_z=use_labels
            )
            if use_labels:
                labels_sub = inv_map[gt]
                spans = labels_to_spans(labels_sub, K)
                if discriminative:
                    ll = wmean(
                        hsmm_gold_score(pots, lengths, spans)
                        - partition_fn(pots, lengths)
                    )
                else:
                    ll = wmean(hsmm_gold_score(pots, lengths, spans))
            else:
                ll = wmean(partition_fn(pots, lengths))
            nll = -ll
            loss = nll - wmean(log_det)
            if not use_labels:
                loss = loss + wmean(kl)
            return loss, {"nll": nll, "kl": wmean(kl), "log_det": wmean(log_det)}

        return loss_fn

    def _build_grad_step(self, use_labels):
        """Gradient-only per-batch program for --batch_accumulation:
        key fold-in + value_and_grad + stats fold in one dispatch; the
        shared update step applies once per window."""
        loss_fn = self._build_loss_fn(use_labels)

        @jax.jit
        def grad_step(params, stats, base_rng, epoch, bix, bw,
                      features, lengths, vc, inv_map, gt, cons, end_allowed, weights):
            rng = _fold_key(base_rng, epoch, bix)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, features, lengths, vc, inv_map, gt, cons, end_allowed, weights, rng
            )
            return _fold_stats(stats, loss, aux, bw), loss, grads

        return grad_step

    def _build_update_step(self, tx):
        trainable = self.module.trainable_mask

        @jax.jit
        def update(params, opt_state, grads, lr):
            grads = mask_grads(grads, trainable)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = apply_lr(updates, lr)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, global_norm(grads)

        return update

    def _build_train_step(self, tx, use_labels):
        """Fused per-batch program for the single-device
        no-accumulation path: PRNG fold-in, value_and_grad, Adam
        update, and the epoch-stats fold all execute in ONE dispatch.

        On the remote-TPU tunnel every dispatched program pays its own
        round-trip latency when the queue drains, so per-batch side
        programs (the rng split, the stats fold, a separate update)
        cost as much as the train step itself — the round-4a loop's
        ~4 programs/batch bounded the realistic-epoch wall clock
        (docs/DESIGN.md §9). The split grad/update pair remains for
        --batch_accumulation, whose window semantics match the
        reference (semimarkov.py:284-309)."""
        loss_fn = self._build_loss_fn(use_labels)
        trainable = self.module.trainable_mask

        @jax.jit
        def train_step(
            params, opt_state, stats, lr, base_rng, epoch, bix, bw,
            features, lengths, vc, inv_map, gt, cons, end_allowed, weights,
        ):
            rng = _fold_key(base_rng, epoch, bix)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, features, lengths, vc, inv_map, gt, cons, end_allowed,
                weights, rng,
            )
            grads = mask_grads(grads, trainable)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = apply_lr(updates, lr)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, _fold_stats(stats, loss, aux, bw), loss, global_norm(grads)

        return train_step

    def _decode_core(self):
        """Traceable (params, features, lengths, vc, cons, end_allowed,
        rng) -> (labels, scores) shared by the per-batch decode program
        and the resident-corpus decode scan."""
        from action_segmentation_tpu.ops.hsmm_pallas import (
            hsmm_viterbi_labels_pallas,
            pallas_supported,
        )

        module = self.module
        use_pallas = pallas_supported(self.n_classes)

        def decode(params, features, lengths, vc, cons, end_allowed, rng):
            # same length-1 clamp as the mesh decode
            # (parallel/mesh.py _make_decode_local): padded rows stay
            # well-defined and both paths see identical inputs
            lengths = jnp.maximum(lengths, 1)
            pots, _, _ = module.compute_potentials(
                params, features, lengths, vc, cons, end_allowed, rng, use_mean_z=True
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

        return decode

    def _build_decode_step(self):
        return jax.jit(self._decode_core())

    # ----- resident-corpus scan programs (round 4) -----
    #
    # With the corpus resident in HBM (data/resident.py) a whole epoch
    # executes as one lax.scan program per length bucket: the gather of
    # each batch, the PRNG fold, the loss/grad/Adam update, and the
    # stats fold are all INSIDE the program, so per-epoch tunnel
    # requests drop from O(batches x programs) to O(buckets) — the
    # measured dominator of the realistic-epoch wall clock once the
    # per-batch loop was fully asynchronous (docs/DESIGN.md §9).

    def _resident_key(self, datasplit, use_narration):
        """Cache key: datasplit identity + every arg/module attribute
        the built tensors bake in — narration penalty scaling, class
        shape bucketing, the allowed-ends mask content. A second fit
        after mutating any of these must rebuild the tensors, not
        silently reuse constraints scaled by the OLD weight (the
        streaming fallback recomputes per batch and would diverge)."""
        ends = self.module.allowed_ends
        return (
            id(datasplit),
            bool(use_narration),
            (
                float(getattr(self.args, "sm_constrain_narration_weight", 1.0))
                if use_narration
                else None
            ),
            int(getattr(self.args, "sm_class_shape_bucket", 1) or 1),
            None if ends is None else tuple(sorted(ends)),
        )

    def _get_resident(self, datasplit, use_narration, mesh=None):
        """Resident tensors for `datasplit` (cached; None when disabled
        by --sm_device_resident_mb=0, over budget, or heterogeneous
        constraints). Entries store (datasplit, resident) so the
        datasplit stays alive while its id() keys the cache (a stale
        None for a freed datasplit's reused address would silently
        disable the scan path); the cache is LRU-capped at 4 splits so
        long-lived models do not pin unbounded HBM without evicting the
        splits a fit's per-epoch eval touches every epoch.

        --sm_device_resident_mb bounds TOTAL live-entry HBM, not each
        corpus alone (a U7-style fit pins the train split twice —
        (id, True) for training, (id, False) for eval — plus
        train_subset/dev). Eviction runs BEFORE the budget is computed
        so a new entry never counts HBM the cap is about to free, and a
        build that fails only because OTHER entries hold the budget is
        NOT cached (it may succeed after they cycle out; inherent
        failures — mixed narration coverage, empty split — are cached
        to avoid re-paying the corpus read every epoch).

        `_pin_resident` marks a key un-evictable until
        `_unpin_resident`. fit pins its training corpus at epoch-loop
        entry (the loop holds the tensors for the whole fit, so
        evicting the entry would let new builds count that
        very-much-still-live HBM as free; pinning at loop entry rather
        than at build keeps an exception during scan compiles from
        leaking the pin).
        `mesh` routes the one-time upload straight to a replicated
        mesh placement (dp paths) instead of device 0 + re-place."""
        budget = getattr(self.args, "sm_device_resident_mb", 0) or 0
        if budget <= 0:
            return None
        if not hasattr(self, "_resident_cache"):
            from collections import OrderedDict

            self._resident_cache = OrderedDict()
            self._resident_pins = set()
            self._resident_failed = {}
        key = self._resident_key(datasplit, use_narration)
        if key in self._resident_cache:
            self._resident_cache.move_to_end(key)  # LRU, not FIFO: a
            # fit's per-epoch eval touches train/train_sub/dev splits
            # every epoch; evicting the hot split would re-upload the
            # corpus each epoch
        else:
            from action_segmentation_tpu.data.resident import (
                build_resident_corpus,
            )

            for old in list(self._resident_cache):
                if len(self._resident_cache) < 4:
                    break
                if old not in self._resident_pins:
                    self._resident_cache.pop(old)
            pinned = sum(
                res.nbytes
                for _, res in self._resident_cache.values()
                if res is not None
            )
            remaining_mb = budget - pinned / float(1 << 20)
            failed = self._resident_failed.get(key)
            if failed is not None:
                ref, failed_at = failed
                if ref() is not datasplit:
                    # unlike cache entries (which retain their datasplit)
                    # the watermark holds only a weakref, so a recycled
                    # id() can collide — a dead or different referent
                    # means the entry is about someone else's split
                    self._resident_failed.pop(key, None)
                elif remaining_mb <= failed_at:
                    # already failed at this (or a larger) remaining
                    # budget; skip re-paying the corpus read until
                    # entries free up
                    return None
            reason = {}
            built = build_resident_corpus(
                self, datasplit, use_narration, remaining_mb,
                reason_out=reason, mesh=mesh,
            )
            if (
                built is None
                and reason.get("why") == "budget"
                and remaining_mb < budget
            ):
                # uncached (may succeed once other entries cycle out);
                # the watermark bounds retries to budget improvements
                import weakref

                self._resident_failed[key] = (
                    weakref.ref(datasplit), remaining_mb,
                )
                return None
            self._resident_failed.pop(key, None)
            self._resident_cache[key] = (datasplit, built)
        return self._resident_cache[key][1]

    def _pin_resident(self, datasplit, use_narration):
        if hasattr(self, "_resident_pins"):
            self._resident_pins.add(
                self._resident_key(datasplit, use_narration)
            )

    def _unpin_resident(self, datasplit, use_narration):
        if hasattr(self, "_resident_pins"):
            self._resident_pins.discard(
                self._resident_key(datasplit, use_narration)
            )

    def _build_epoch_scan(self, tx, use_labels, with_cons, with_end):
        """One jitted program per plan-group width: scans the group's
        batches IN ORDER (training plans are a single exact-order group
        — make_plan global_order), gathering each batch from the
        resident corpus and applying the SAME fused loss/update/stats
        step as _build_train_step. The scan body is shared with the
        mesh program (resident.build_epoch_scan_fn); only the
        loss/grad production differs. Returns per-batch losses and
        flattened (gnorm, lr, nll, kl, log_det) log snapshots."""
        from action_segmentation_tpu.data.resident import build_epoch_scan_fn

        loss_fn = self._build_loss_fn(use_labels)
        trainable = self.module.trainable_mask

        def step_terms(params, f, l, vc, inv, g, c, e, w, rng):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, f, l, vc, inv, g, c, e, w, rng)
            grads = mask_grads(grads, trainable)
            return loss, aux, grads

        fn = build_epoch_scan_fn(step_terms, tx, with_cons, with_end)
        return jax.jit(fn, static_argnames=("t_width",))

    def _build_decode_scan(self, with_cons, with_end):
        """Scan the decode over a bucket group of resident batches
        (shared body: resident.build_decode_scan_fn); returns flattened
        int32 labels (n * Bp * t_width) so a whole predict() is a
        handful of dispatches plus ONE fetch."""
        from action_segmentation_tpu.data.resident import build_decode_scan_fn

        scan = build_decode_scan_fn(self._decode_core(), with_cons, with_end)

        def fn(params, base_rng, res, idxs, vcs, bixs, t_width):
            return jnp.reshape(
                scan(params, base_rng, res, idxs, vcs, bixs, t_width), (-1,)
            )

        return jax.jit(fn, static_argnames=("t_width",))

    # ----- public API -----

    def fit_supervised(self, train_data):
        assert not self.args.sm_component_model
        assert not self.args.sm_constrain_transitions
        features, labels = [], []
        for batch in iter_batches(
            train_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            L = int(batch["lengths"][0])
            features.append(batch["features"][0, :L])
            labels.append(batch["gt_single"][0, :L])
        self.module.fit_supervised(features, labels)

    def fit(self, train_data, use_labels, callback_fn=None):
        args = self.args
        if getattr(args, "model_parallel", 1) not in (None, 1):
            # validate here, not only in make_mesh: without
            # --data_parallel (or on a 1-device backend) the mesh is
            # never built and the retired flag would be silently dropped
            raise NotImplementedError(
                "--model_parallel > 1 was retired (round 3); use "
                "--data_parallel. Design record: docs/DESIGN.md §6."
            )
        if use_labels:
            assert not args.sm_constrain_transitions
        initialize = True
        if use_labels and args.sm_supervised_method in ("closed-form", "closed-then-gradient"):
            self.fit_supervised(train_data)
            if args.sm_supervised_method == "closed-then-gradient":
                initialize = False
                if callback_fn:
                    callback_fn(-1, {})
            else:
                return
        if getattr(args, "sm_init_non_projection_parameters_from", None):
            initialize = False
            if callback_fn:
                callback_fn(-1, {})

        # device_scheduler: the plateau controller steps on device from
        # the device-resident epoch loss, so no per-epoch loss fetch is
        # needed to produce the next epoch's lr (round-trip rule; the
        # per-epoch drain was the realistic-epoch wall clock — measured
        # in docs/DESIGN.md §9)
        tx, scheduler = make_optimizer(args, device_scheduler=True)
        # exposed for tests/observability (resume restores its
        # best/num_bad from the checkpoint sidecar)
        self._scheduler = scheduler
        # cached jitted programs ('update', 'escan_*', 'epoch_finish_*')
        # close over tx/scheduler; if the optimizer hyperparameters
        # changed since they were built (a second fit after mutating
        # args), drop them rather than silently training with stale
        # clip/plateau settings
        hp = (
            args.max_grad_norm,
            args.no_reduce_plateau,
            args.reduce_plateau_factor,
            args.reduce_plateau_patience,
            args.reduce_plateau_min_lr,
        )
        if getattr(self, "_jit_hparams", hp) != hp:
            self._jit_cache.clear()
        self._jit_hparams = hp
        lr = args.lr

        if initialize:
            # moment-match emissions on a ~100-video sample (semimarkov.py:177-186)
            feats = []
            for batch in iter_batches(
                train_data, batch_size=100, batch_by_task=False, shuffle=True,
                seed=getattr(args, "seed", 1), bucket=False,
            ):
                for i in range(len(batch["lengths"])):
                    feats.append(batch["features"][i, : batch["lengths"][i]])
                break
            self.module.initialize_gaussian(feats)

        opt_state = tx.init(self.module.params)
        use_dp = getattr(args, "data_parallel", False) and len(jax.devices()) > 1
        dp_accumulate = use_dp and args.batch_accumulation > 1
        if use_dp:
            from action_segmentation_tpu.parallel.mesh import (
                batch_sharding,
                build_sharded_epoch_scan,
                build_sharded_grad_step,
                build_sharded_train_step,
                make_mesh,
                pad_batch_for_mesh,
                replicate_resident,
                shard_shared_inputs,
                shard_train_inputs,
            )

            mesh = make_mesh(model_parallel=getattr(args, "model_parallel", 1))
            # the sharded steps are wrapped so key fold-in and the stats
            # fold trace INTO the same program (one dispatch per batch,
            # identical key derivation to the single-device paths —
            # dp==single trajectory tests depend on that)
            if dp_accumulate:
                # --batch_accumulation under dp: sharded grad-only step,
                # host-accumulated replicated grads, shared update step
                _dp_grads = build_sharded_grad_step(
                    self.module, mesh, use_labels
                )

                @jax.jit
                def sharded_grad_step(params, stats, base_rng, epoch, bix, bw,
                                      features, lengths, s_vc, s_inv,
                                      gt, cons, end_allowed, weights):
                    rng = _fold_key(base_rng, epoch, bix)
                    loss, aux, grads = _dp_grads(
                        params, features, lengths, s_vc, s_inv,
                        gt, cons, end_allowed, weights, rng,
                    )
                    return _fold_stats(stats, loss, aux, bw), loss, grads
            else:
                _dp_train = build_sharded_train_step(
                    self.module, tx, mesh, use_labels
                )

                @jax.jit
                def sharded_step(params, opt_state, stats, lr,
                                 base_rng, epoch, bix, bw,
                                 features, lengths, s_vc, s_inv,
                                 gt, cons, end_allowed, weights):
                    rng = _fold_key(base_rng, epoch, bix)
                    params, opt_state, loss, aux, gnorm = _dp_train(
                        params, opt_state, features, lengths, s_vc, s_inv,
                        gt, cons, end_allowed, weights, lr, rng,
                    )
                    return (
                        params, opt_state,
                        _fold_stats(stats, loss, aux, bw), loss, gnorm,
                    )
            self.module.params, opt_state, _ = shard_train_inputs(
                mesh, self.module.params, opt_state, []
            )
            logger.debug(
                "data-parallel training over mesh {}".format(dict(mesh.shape))
            )
        grad_step = self._get_jitted(
            f"grad_{use_labels}", lambda: self._build_grad_step(use_labels)
        )
        update = self._get_jitted("update", lambda: self._build_update_step(tx))
        # single-device no-accumulation batches take the fused
        # grad+update program: one dispatch, no grad-pytree HBM round
        # trip, and the per-leaf eager tree_map chain (one tunnel
        # dispatch PER PARAMETER LEAF per batch in rounds 2-3) vanishes
        fused_step = None
        if not use_dp and args.batch_accumulation <= 1:
            fused_step = self._get_jitted(
                f"fused_{use_labels}",
                lambda: self._build_train_step(tx, use_labels),
            )
        # jitted pytree add/scale for the accumulation window: one
        # dispatch per batch instead of one per leaf
        tree_add = self._get_jitted(
            "tree_add",
            lambda: jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)),
        )
        tree_scale = self._get_jitted(
            "tree_scale",
            lambda: jax.jit(
                lambda a, c: jax.tree_util.tree_map(lambda g: g * c, a)
            ),
        )
        log_vec = self._get_jitted(
            "log_vec",
            lambda: jax.jit(
                lambda c, gnorm, lr: jnp.stack([
                    jnp.asarray(gnorm, jnp.float32),
                    jnp.asarray(lr, jnp.float32),
                    c[2], c[3], c[4],
                ])
            ),
        )
        # ONE epoch-end program: callback stats from the stats carry AND
        # the plateau-LR controller transition (scheduler semantics:
        # models/base.py DevicePlateauLR). The host applies the new
        # scheduler state AFTER the checkpoint save so the saved lr
        # remains the pre-step rate, exactly as the split
        # epoch_summary/scheduler.step pair behaved.
        sched_step = scheduler._step if scheduler is not None else None

        def _build_epoch_finish():
            @jax.jit
            def fin(c, nf, nv, sst):
                stats = {
                    "train_loss": c[1] / jnp.maximum(c[0], 1.0),
                    "train_nll_frame_avg": c[2] / nf,
                    "train_kl_vid_avg": c[3] / nv,
                    "train_recon_bound": (c[2] + c[3]) / nf,
                }
                new_sst = (
                    sched_step(sst, stats["train_loss"])
                    if sched_step is not None
                    else sst
                )
                return stats, new_sst

            return fin

        epoch_finish = self._get_jitted(
            "epoch_finish_" + ("sched" if sched_step is not None else "plain"),
            _build_epoch_finish,
        )
        _STATS0 = tuple(jnp.zeros((), jnp.float32) for _ in range(5))

        rng = jax.random.PRNGKey(getattr(args, "seed", 1) or 1)
        params = self.module.params
        use_narration = "train" in args.sm_constrain_with_narration

        # resident-corpus epoch scan: no-accumulation fits over corpora
        # within --sm_device_resident_mb run each epoch as one lax.scan
        # program per length bucket (gather + fused step inside; see
        # _build_epoch_scan). Under --data_parallel the program is
        # shard_map'd over the mesh with the corpus replicated and each
        # device gathering its own row shard (mesh.py
        # build_sharded_epoch_scan). --batch_accumulation keeps the
        # streaming per-batch loop.
        resident = None
        epoch_scan_for = None
        scan_row_pad = 1
        if fused_step is not None or (use_dp and not dp_accumulate):
            resident = self._get_resident(
                train_data, use_narration,
                mesh=mesh if use_dp else None,
            )
            if resident is not None:
                wc, we = resident.with_cons, resident.with_end
                if use_dp:
                    replicate_resident(mesh, resident)  # no-op if built
                    # with mesh; re-places a cached device-0 build
                    scan_row_pad = mesh.shape["data"]

                    def epoch_scan_for(t_width):
                        return self._get_jitted(
                            "escan_dp_{}_{}_{}_{}".format(
                                use_labels, wc, we, t_width
                            ),
                            lambda: build_sharded_epoch_scan(
                                self.module, tx, mesh, use_labels,
                                wc, we, t_width,
                            ),
                        )
                else:
                    _escan = self._get_jitted(
                        "escan_{}_{}_{}".format(use_labels, wc, we),
                        lambda: self._build_epoch_scan(
                            tx, use_labels, wc, we
                        ),
                    )

                    def epoch_scan_for(t_width):
                        return functools.partial(_escan, t_width=t_width)
                logger.debug(
                    "resident corpus: {} videos, {:.1f} MB on device".format(
                        len(resident.row_of), resident.nbytes / 2**20
                    )
                )

        start_epoch = 0
        ckpt_dir = getattr(args, "checkpoint_dir", None)
        if ckpt_dir and getattr(args, "resume", False):
            from action_segmentation_tpu import checkpoint as ckpt

            step = ckpt.latest_step(ckpt_dir)
            if step is not None:
                # restore the full train state (params + Adam moments)
                # when the checkpoint has it; fall back to the params-only
                # layout of older checkpoints
                try:
                    state, _, step = ckpt.load_orbax(
                        ckpt_dir, target={"params": params, "opt_state": opt_state}
                    )
                    params = state["params"]
                    opt_state = jax.tree_util.tree_map(
                        jnp.asarray, state["opt_state"]
                    )
                except Exception:
                    params, _, step = ckpt.load_orbax(ckpt_dir, target=params)
                params = jax.tree_util.tree_map(jnp.asarray, params)
                meta = ckpt.load_meta(ckpt_dir, step)
                if (
                    meta
                    and meta.get("sched") is not None
                    and scheduler is not None
                ):
                    # full post-step plateau state: epoch step+1 resumes
                    # with the best/num_bad the uninterrupted run had,
                    # not a reset that would skip a pending LR cut
                    s = meta["sched"]
                    scheduler.state = {
                        "lr": jnp.float32(s["lr"]),
                        "best": jnp.float32(s["best"]),
                        "num_bad": jnp.int32(s["num_bad"]),
                    }
                    lr = float(s["lr"])
                elif meta and meta.get("lr") is not None:
                    lr = float(meta["lr"])  # older checkpoints: rate only
                    if scheduler is not None:
                        scheduler.lr = lr
                start_epoch = step + 1
                logger.debug(
                    "resumed from {} at epoch {} (lr {})".format(
                        ckpt_dir, start_epoch, lr
                    )
                )

        # lr as a strong-typed device scalar from the start: the jitted
        # update / sharded steps would otherwise retrace (minutes each
        # through the remote-compile path) when the device scheduler's
        # f32 output replaces a host float after the first epoch
        lr = jnp.float32(lr)

        profile_dir = getattr(args, "profile_dir", None)

        # ----- deferred stats/logging (round-4 epoch pipeline) -----
        # Every dispatch->fetch round trip through the remote-TPU tunnel
        # costs ~0.5 s (CLAUDE.md round-trip rule), and the round-4
        # decomposition (scripts/epoch_decompose.py, docs/DESIGN.md §9)
        # measured that the per-epoch drain + the print_every
        # float(gnorm) fetch WERE the realistic-epoch wall clock. The
        # loop therefore never forces a fetch per epoch: per-batch
        # scalars queue as device arrays, the plateau scheduler steps on
        # device (DevicePlateauLR), log lines capture their host context
        # (counts, wall-clock throughput) eagerly but fetch + print
        # lazily, and everything flushes in ONE stacked transfer at
        # backpressure points, checkpoints, and fit end. Callers that
        # force the callback stats (e.g. main.py's per-epoch CSV/decode)
        # pay their own sync, exactly as before.
        # deferred_checks entries: (epoch, batch_ix_or_list, dev) where
        # dev is a 0-d loss scalar (per-batch mode) or an (n,) loss
        # vector from an epoch-scan group (batch_ix_or_list is then the
        # list of original batch indices). deferred_logs entries:
        # (rows, dev_1d) with rows = [(i, ep, bix, nvid, nfrm, t0)]
        # and dev_1d a flattened (r, 5) snapshot block; row i reads
        # dev_1d[5*i : 5*i+5]. t0 is the row's epoch start time; the
        # throughput prints as nvid / (flush_time - t0), measured AFTER
        # the blocking fetch so it reflects completed device work (a
        # lower bound when the flush is deferred past later epochs —
        # an eager time.time() at dispatch measured ~80x inflated).
        deferred_checks = []
        deferred_logs = []
        _FLUSH_ZERO = jnp.float32(0.0)          # count-padding fillers
        _FLUSH_ZERO5 = jnp.zeros((5,), jnp.float32)

        def flush_deferred():
            if not deferred_checks and not deferred_logs:
                return
            # SHAPE-BUCKETED flush: jnp.stack/concatenate trace on the
            # number of operands, so flushing raw counts would compile a
            # fresh executable per distinct (n_checks, n_logs) — through
            # the remote-compile path that one-time cost measured ~90 s
            # at fit end (scripts/epoch_decompose.py). Padding the
            # counts to fixed multiples (32 scalars / 4 vector entries)
            # bounds the flush to a handful of compiled shapes, all paid
            # in the compile epoch.
            scalar_checks = [
                e for e in deferred_checks if getattr(e[2], "ndim", 0) == 0
            ]
            vec_checks = [
                e for e in deferred_checks if getattr(e[2], "ndim", 0) != 0
            ]
            n = len(scalar_checks)
            scalars = [l for _, _, l in scalar_checks]
            scalars += [_FLUSH_ZERO] * ((-n) % 32)
            parts = [jnp.stack(scalars)] if scalars else []
            vecs = [v for _, _, v in vec_checks]
            vecs += [vec for _, vec in deferred_logs]
            vecs += [_FLUSH_ZERO5] * ((-len(vecs)) % 4)
            if vecs:
                parts.append(jnp.concatenate(vecs))
            flat = np.asarray(
                jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            )  # the single fetch
            now = time.time()  # post-fetch: dispatched work is done
            for (ep, bix, _), loss_f in zip(scalar_checks, flat[:n]):
                if not np.isfinite(loss_f):
                    logger.debug(
                        "WARNING: non-finite loss {} at epoch {} batch {}".format(
                            float(loss_f), ep, bix
                        )
                    )
            off = len(scalars)  # vector entries start after the scalars
            for ep, bix_list, dev in vec_checks:
                seg = flat[off:off + dev.shape[0]]
                off += dev.shape[0]
                for j, loss_f in enumerate(seg):
                    if not np.isfinite(loss_f):
                        logger.debug(
                            "WARNING: non-finite loss {} at epoch {} batch {}".format(
                                float(loss_f), ep, bix_list[j]
                            )
                        )
            for rows, dev in deferred_logs:
                seg = flat[off:off + dev.shape[0]]
                off += dev.shape[0]
                for i, ep, bix, num_vid, num_frm, t0 in rows:
                    thr = num_vid / max(now - t0, 1e-9)
                    gnorm_f, lr_f, nll_c, kl_c, ld_c = seg[5 * i:5 * i + 5]
                    logger.debug(
                        "Epoch: %02d, Batch: %03d, |GParam|: %.2f, lr: %.2E, "
                        "loss: %.4f, recon: %.4f, kl: %.4f, log_det: %.4f, "
                        "Throughput: %.2f vid / sec"
                        % (
                            ep, bix, gnorm_f, lr_f,
                            (nll_c + kl_c + ld_c) / num_vid,
                            nll_c / num_frm,
                            kl_c / num_frm,
                            ld_c / num_vid,
                            thr,
                        )
                    )
            deferred_checks.clear()
            deferred_logs.clear()

        def _prepare_batch(batch):
            """Host side of one training batch: narration/constraint
            assembly, row padding, and the single device_put. Runs on
            a 2-worker prefetch pool so collation and the H2D transfer
            of batches i+1, i+2 overlap batch i's dispatch — on the TPU
            host the collate + device_put pair measured 0.45-0.58 s of
            the 0.51-0.65 s warm epoch (scripts/epoch_decompose.py),
            i.e. the critical path was host prep, not device work, and
            with one worker the serialized prep chain still bounded the
            epoch. numpy fills and the tunnel transfer release the GIL,
            so two preps genuinely overlap. Per-batch PRNG keys derive
            inside the jitted step (_fold_key), so the pool needs no
            key plumbing and worker interleaving cannot reorder the
            chain."""
            vc, inv_map, cons, end_allowed = self._batch_device_args(
                batch, train_data, use_narration
            )
            B = len(batch["lengths"])
            frames = int(batch["lengths"].sum())
            gt = batch.get(
                "gt_single", np.zeros(batch["features"].shape[:2], np.int64)
            )
            if use_dp:
                (feat_p, len_p, gt_p, cons_p, end_p), w = pad_batch_for_mesh(
                    mesh,
                    [batch["features"], batch["lengths"], gt, cons, end_allowed],
                    B,
                    pad_to=args.batch_size,
                )
                arrs = (feat_p, len_p, gt_p, cons_p, end_p, w)
                # one device_put for the whole batch (round-trip rule)
                placed = jax.device_put(
                    arrs,
                    tuple(
                        batch_sharding(mesh, np.asarray(a).ndim) for a in arrs
                    ),
                )
                s_vc, s_inv = shard_shared_inputs(mesh, vc, inv_map)
                return B, frames, (placed, s_vc, s_inv)
            feat_p, len_p, gt_p, cons_p, end_p, w = self._pad_batch_rows(
                batch["features"], batch["lengths"], gt, cons, end_allowed
            )
            # one device_put for the whole batch: each separate
            # transfer pays a tunnel round trip
            dev = jax.device_put(
                (feat_p, len_p, vc, inv_map, gt_p, cons_p, end_p, w)
            )
            return B, frames, (dev,)

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if resident is not None:
            # pin: the epoch loop holds these tensors for the whole fit,
            # so an LRU eviction would let new builds count this
            # still-live HBM as free. Pinned HERE (not at build) so the
            # scan compiles / resume restore above cannot raise between
            # pin and the finally's unpin and leak an un-evictable entry
            self._pin_resident(train_data, use_narration)
        prefetch_pool = ThreadPoolExecutor(max_workers=2)
        try:
          for epoch in range(start_epoch, args.epochs):
            if profile_dir and epoch == start_epoch:
                jax.profiler.start_trace(profile_dir)
            start_time = time.time()
            num_frames = 0
            num_videos = 0
            acc_grads = None
            acc_count = 0
            # epoch stats fold: (count, loss_sum, nll*B, kl*B, ld*B)
            stats_carry = _STATS0

            if epoch_scan_for is not None:
                # resident-corpus path: the whole epoch runs as ONE
                # scan program over all batches in the exact streaming
                # order (global_order — sequential Adam updates must
                # apply in the same shuffled order as the reference
                # loop; bucket-grouped execution would impose a
                # short-before-long curriculum every epoch). The
                # streaming loop below sees an empty iterator and is
                # skipped.
                plan = resident.make_plan(
                    args.batch_size, shuffle=True,
                    seed=(getattr(args, "seed", 1) or 1) + epoch,
                    limit=args.train_limit,
                    pad_rows_to=scan_row_pad,
                    global_order=True,
                )
                num_videos = plan.videos
                num_frames = plan.frames
                scan_pos = 0
                cum_v = 0
                cum_f = 0
                for grp in plan.groups:
                    params, opt_state, stats_carry, losses, snaps = (
                        epoch_scan_for(grp.t_width)(
                            params, opt_state, stats_carry, lr, rng, epoch,
                            resident.device_args, grp.idxs, grp.vcs,
                            grp.invs, grp.bixs, grp.bws,
                        )
                    )
                    deferred_checks.append(
                        (epoch, [int(b) for b in grp.bixs], losses)
                    )
                    rows = []
                    for i in range(grp.n):
                        cum_v += grp.batch_sizes[i]
                        cum_f += grp.batch_frames[i]
                        if args.print_every and (
                            (scan_pos + i) % args.print_every == 0
                        ):
                            # log lines read the stats fold in SCAN
                            # order (bucket-grouped), so the running
                            # numbers are self-consistent with the
                            # printed cumulative counters
                            rows.append((
                                i, epoch, int(grp.bixs[i]), cum_v, cum_f,
                                start_time,
                            ))
                    if rows:
                        deferred_logs.append((rows, snaps))
                    scan_pos += grp.n
                if len(deferred_checks) >= 32 or (
                    deferred_checks and epoch - deferred_checks[0][0] >= 8
                ):
                    # entry-count backpressure alone would defer the
                    # non-finite-loss warning ~32 epochs at one scan
                    # entry per epoch; also flush when the oldest
                    # deferred entry is 8 epochs stale (one ~0.5 s
                    # round trip per 8 epochs bounds warning latency)
                    flush_deferred()
                batch_iter = iter(())
            else:
                batch_iter = iter_batches(
                    train_data,
                    batch_size=args.batch_size,
                    batch_by_task=True,
                    shuffle=True,
                    seed=(getattr(args, "seed", 1) or 1) + epoch,
                )
                if args.train_limit:
                    import itertools

                    batch_iter = itertools.islice(batch_iter, args.train_limit)
                batch_iter = iter(batch_iter)
            pending_prep = deque()

            def _submit_next():
                b = next(batch_iter, None)
                if b is not None:
                    pending_prep.append(prefetch_pool.submit(_prepare_batch, b))

            _submit_next()
            _submit_next()  # depth-2 pipeline: two preps in flight
            batch_ix = -1
            while pending_prep:
                batch_ix += 1
                B, frames, prepped = pending_prep.popleft().result()
                _submit_next()
                num_frames += frames
                num_videos += B
                stepped = False
                gnorm = None
                if use_dp:
                    placed, s_vc, s_inv = prepped
                    if dp_accumulate:
                        stats_carry, loss, grads = sharded_grad_step(
                            params, stats_carry, rng, epoch, batch_ix, float(B),
                            placed[0], placed[1], s_vc, s_inv, placed[2],
                            placed[3], placed[4], placed[5],
                        )
                    else:
                        params, opt_state, stats_carry, loss, gnorm = sharded_step(
                            params, opt_state, stats_carry, lr,
                            rng, epoch, batch_ix, float(B),
                            placed[0], placed[1], s_vc, s_inv, placed[2],
                            placed[3], placed[4], placed[5],
                        )
                        grads = None
                        stepped = True
                elif fused_step is not None:
                    (dev,) = prepped
                    params, opt_state, stats_carry, loss, gnorm = fused_step(
                        params, opt_state, stats_carry, lr,
                        rng, epoch, batch_ix, float(B), *dev,
                    )
                    grads = None
                    stepped = True
                else:
                    (dev,) = prepped
                    stats_carry, loss, grads = grad_step(
                        params, stats_carry, rng, epoch, batch_ix, float(B), *dev
                    )
                # defer the scalar fetches: float(loss) here would force a
                # full device sync every batch, serializing the next
                # batch's 10s-of-MB host->device transfer behind the step
                # (measured: a 22 MB batch costs 3-15 ms through the
                # tunnel vs a ~3 ms step). Scalars queue as device arrays
                # and flush in one batched device_get at backpressure
                # points / fit end, so transfers overlap compute via
                # dispatch pipelining. The stats fold rode inside the
                # step program (_fold_stats) — no side program here.
                deferred_checks.append((epoch, batch_ix, loss))
                if len(deferred_checks) >= 32 or (
                    epoch - deferred_checks[0][0] >= 8
                ):
                    # bound dispatch queue AND warning latency (tiny
                    # epochs accumulate entries slowly; see scan branch)
                    flush_deferred()

                if not stepped:
                    # NOTE a partial accumulation window left at epoch end
                    # is dropped, matching the reference exactly (its
                    # multi_batch_losses are never flushed after the batch
                    # loop, semimarkov.py:284-309)
                    acc_grads = (
                        grads if acc_grads is None else tree_add(acc_grads, grads)
                    )
                    acc_count += 1
                    if acc_count >= args.batch_accumulation:
                        mean_grads = (
                            acc_grads
                            if acc_count == 1
                            else tree_scale(acc_grads, 1.0 / acc_count)
                        )
                        params, opt_state, gnorm = update(params, opt_state, mean_grads, lr)
                        acc_grads = None
                        acc_count = 0
                        stepped = True
                if stepped and args.print_every and (batch_ix % args.print_every == 0):
                    # the |GParam|/lr/loss line (reference
                    # semimarkov.py:289-304): the cumulative sums ride
                    # the stats fold; building the line's vector is one
                    # tiny dispatch whose numbers fetch at the next
                    # flush, so the hot loop never blocks
                    vec = log_vec(stats_carry, gnorm, lr)
                    deferred_logs.append((
                        [(
                            0, epoch, batch_ix, num_videos, num_frames,
                            start_time,
                        )],
                        vec,
                    ))

            self.module.params = params
            if epoch == start_epoch:
                # pay the flush's (shape-bucketed) compiles and one
                # round trip inside the compile epoch, so warm epochs
                # run flush-free until a backpressure/checkpoint point
                flush_deferred()
                if profile_dir:
                    jax.profiler.stop_trace()
            # per-epoch stats as device scalars (no fetch): consumers
            # that need floats (tests, main.py's CSV) force them and pay
            # one sync; the loop itself stays asynchronous across epochs.
            # ONE dispatch builds the callback dict AND the plateau-LR
            # transition from the fold; the new scheduler state is
            # applied after the checkpoint save so the persisted lr is
            # the pre-step rate (resume parity with the split pair).
            new_sched_state = None
            if num_videos > 0:
                cb_stats, new_sched_state = epoch_finish(
                    stats_carry,
                    float(max(num_frames, 1)),
                    float(max(num_videos, 1)),
                    scheduler.state if scheduler is not None else {},
                )
            else:
                cb_stats = {
                    "train_loss": 0.0,
                    "train_nll_frame_avg": jnp.float32(0.0),
                    "train_kl_vid_avg": jnp.float32(0.0),
                    "train_recon_bound": jnp.float32(0.0),
                }
            train_loss = cb_stats["train_loss"]
            if ckpt_dir and epoch % getattr(args, "checkpoint_every", 5) == 0:
                from action_segmentation_tpu import checkpoint as ckpt

                flush_deferred()
                # sched_state is the POST-step plateau state (it
                # governs epoch+1), so resume reproduces the
                # uninterrupted LR trajectory even mid-plateau; meta
                # "lr" stays the pre-step rate (legacy split-pair
                # semantics)
                ckpt.save_orbax(
                    {"params": params, "opt_state": opt_state},
                    args, epoch, ckpt_dir, lr=float(jnp.asarray(lr)),
                    sched_state=new_sched_state,
                )
            if scheduler is not None:
                # on-device plateau step (fused into epoch_finish): next
                # epoch's lr is a device scalar threaded straight into
                # the jitted update
                if num_videos > 0:
                    scheduler.state = new_sched_state
                    lr = new_sched_state["lr"]
                else:
                    lr = scheduler.step(train_loss)
            if callback_fn:
                callback_fn(epoch, cb_stats)
        finally:
            prefetch_pool.shutdown(wait=True)
            self._unpin_resident(train_data, use_narration)
        flush_deferred()
        self.module.params = params

    def predict(self, test_data):
        predictions = {}
        # data-parallel decode: per-epoch evaluation dominates wall clock
        # in real experiments (reference main.py:207-244 evaluates every
        # epoch), so decode shards the batch axis over the mesh when
        # --data_parallel is on and multiple devices exist
        use_dp = (
            getattr(self.args, "data_parallel", False) and len(jax.devices()) > 1
        )
        use_narration = "test" in self.args.sm_constrain_with_narration
        # resident-corpus decode: the whole predict() is one scan
        # program per length bucket plus ONE label fetch — per-epoch
        # evaluation re-decodes the same split every epoch, so the
        # corpus transfers once per fit, not once per batch per epoch
        # (docs/DESIGN.md §9); under dp the scan shards rows over the
        # mesh (mesh.py build_sharded_decode_scan). Checked FIRST so
        # the streaming decode machinery (and its mesh) is never built
        # on the resident path.
        mesh = None
        if use_dp:
            from action_segmentation_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(model_parallel=1)
        resident = self._get_resident(test_data, use_narration, mesh=mesh)
        if resident is not None:
            return self._predict_resident(test_data, resident, mesh)
        if use_dp:
            from action_segmentation_tpu.parallel.mesh import (
                build_sharded_decode_step,
                pad_batch_for_mesh,
            )

            decode = self._get_jitted(
                "decode_dp",
                lambda: build_sharded_decode_step(
                    self.module, mesh, n_classes=self.n_classes
                ),
            )
        else:
            decode = self._get_jitted("decode", self._build_decode_step)
        rng = jax.random.PRNGKey(0)
        # decode outputs stay on device until the very end: every
        # dispatch->fetch round trip through the remote-TPU tunnel costs
        # ~0.5 s regardless of size, so per-batch fetches would dominate
        # the per-epoch evaluation wall clock. All batches are decoded
        # asynchronously, padded to a common width and concatenated on
        # device, and fetched in ONE transfer (the shared
        # DeferredLabelDrain — api.segment_many uses the same one).
        from action_segmentation_tpu.utils.drain import DeferredLabelDrain

        drain = DeferredLabelDrain()
        for batch in iter_batches(
            test_data,
            batch_size=self.args.batch_size,
            batch_by_task=True,
            shuffle=False,
            sort_by_length=True,
        ):
            vc, _, cons, end_allowed = self._batch_device_args(
                batch, test_data, use_narration
            )
            rng, step_rng = jax.random.split(rng)
            features = np.asarray(batch["features"])
            lengths = np.asarray(batch["lengths"])
            B = features.shape[0]
            if use_dp:
                (features, lengths, cons, end_allowed), _ = pad_batch_for_mesh(
                    mesh, [features, lengths, cons, end_allowed], B,
                    pad_to=self.args.batch_size,
                )
            else:
                # fixed-B decode shapes: partial final batches reuse the
                # full batch's compiled program; padded rows are dropped
                features, lengths, _, cons, end_allowed, _ = self._pad_batch_rows(
                    features, lengths, np.zeros((B, 1), np.int64), cons, end_allowed
                )
            dev = jax.device_put((features, lengths, vc, cons, end_allowed))
            labels, _ = decode(self.module.params, *dev, step_rng)
            drain.add((batch["video_name"], batch["lengths"]), labels, n_rows=B)

        for (names, lengths_np), all_labels in drain.drain():
            for i, video in enumerate(names):
                L = int(lengths_np[i])
                preds = all_labels[i, :L]
                assert (preds >= 0).all() and (preds < self.n_classes).all()
                predictions[video] = preds
        return predictions

    def _predict_resident(self, test_data, resident, mesh=None):
        """Decode against the resident corpus: one scan program per
        length bucket (batches length-sorted inside each task, exactly
        like the streaming path's sort_by_length), one label fetch.
        With a mesh, rows shard over the 'data' axis (each device
        decodes its shard of every batch)."""
        wc, we = resident.with_cons, resident.with_end
        if mesh is not None:
            from action_segmentation_tpu.parallel.mesh import (
                build_sharded_decode_scan,
                replicate_resident,
            )

            replicate_resident(mesh, resident)
            row_pad = mesh.shape["data"]

            def decode_scan_for(t_width):
                jitted = self._get_jitted(
                    "dscan_dp_{}_{}_{}".format(wc, we, t_width),
                    lambda: build_sharded_decode_scan(
                        self.module, mesh, wc, we, t_width,
                        n_classes=self.n_classes,
                    ),
                )
                return jitted
        else:
            row_pad = 1
            _dscan = self._get_jitted(
                "dscan_{}_{}".format(wc, we),
                lambda: self._build_decode_scan(wc, we),
            )

            def decode_scan_for(t_width):
                return functools.partial(_dscan, t_width=t_width)

        plan = resident.make_plan(
            self.args.batch_size, shuffle=False, seed=1,
            sort_by_length=True, pad_rows_to=row_pad,
        )
        base = jax.random.PRNGKey(0)
        parts = []
        for grp in plan.groups:
            parts.append(decode_scan_for(grp.t_width)(
                self.module.params, base, resident.device_args,
                grp.idxs, grp.vcs, grp.bixs,
            ))
        if not parts:
            return {}
        all_labels = np.asarray(
            parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        )  # the single fetch
        predictions = {}
        off = 0
        for grp in plan.groups:
            Bp = grp.bp
            block = all_labels[off: off + grp.n * Bp * grp.t_width]
            block = block.reshape(grp.n, Bp, grp.t_width)
            off += grp.n * Bp * grp.t_width
            for i, keys in enumerate(grp.keys):
                for j, key in enumerate(keys):
                    L = int(resident.host_len[resident.row_of[key]])
                    preds = block[i, j, :L]
                    assert (preds >= 0).all() and (preds < self.n_classes).all()
                    predictions[key[1]] = preds
        return predictions


def _set_flow_args_from_params(args, params):
    """Derive the NICE flow flags from an imported projector pytree so
    the pickled args stay coherent with the weights."""
    flow = params.get("feature_projector")
    args.sm_feature_projection = flow is not None
    if flow is None:
        return
    args.flow_couple_layers = len(flow["cells"])
    layers = flow["cells"][0]["layers"]
    args.flow_hidden_units = int(np.asarray(layers[0]["w"]).shape[1])
    args.flow_hidden_layers = len(layers) - 2
    args.flow_scale = "scale_cells" in flow
    args.flow_scale_no_zero = getattr(args, "flow_scale_no_zero", False)


def semimarkov_from_reference_state_dict(args, state_dict, class_to_components=None):
    """Build a serving-ready SemiMarkovModel from a reference-trained
    state_dict (torch or numpy leaves) — Gaussian SemiMarkovModule or
    ComponentSemiMarkovModule (auto-detected by the embedding tables).

    Gaussian: the parameter names match one-for-one
    (semimarkov_modules.py:142-159). Compound: EmbeddingBag tables /
    transposed Linears / residual MLPs map layer-for-layer
    (checkpoint.compound_params_from_reference_state_dict); the
    components->classes structure is the identity map (the reference's
    default, semimarkov.py:85-90) — --sm_component_decompose_steps
    models carry corpus structure not present in a state_dict and must
    be imported via --reference_pickle. Transition/end constraint sets
    are corpus-derived, not weights — rebuild them through
    SemiMarkovModel.from_args when decoding with
    --sm_constrain_transitions.
    """
    from action_segmentation_tpu.checkpoint import (
        compound_params_from_reference_state_dict,
        params_from_reference_state_dict,
    )

    is_compound = any(
        (k[len("model."):] if k.startswith("model.") else k)
        == "initial_embeddings.weight"
        for k in state_dict
    )
    if is_compound:
        from action_segmentation_tpu.models.compound import ComponentHsmm

        params, meta = compound_params_from_reference_state_dict(state_dict)
        if class_to_components is not None:
            # --reference_pickle path: the pickled module carries the
            # corpus-derived decompose-steps structure
            class_to_components = {
                int(c): set(int(x) for x in comps)
                for c, comps in class_to_components.items()
            }
            n_classes = meta["n_classes"] or len(class_to_components)
        else:
            n_classes = meta["n_classes"] or meta["n_components"]
            assert meta["n_components"] == n_classes, (
                "decomposed-steps compound models need the corpus's "
                "component structure; import via --reference_pickle"
            )
            if meta["n_classes"] is None:
                # without per-class biases the state_dict carries no
                # shape that distinguishes n_classes from n_components,
                # so a decompose-steps model would import undetected
                # under this identity map — no assert can catch it
                logger.debug(
                    "WARNING: compound state_dict has no per-class biases; "
                    "assuming identity class->component structure "
                    "(n_classes = n_components = {}). If this model was "
                    "trained with --sm_component_decompose_steps, import "
                    "it via --reference_pickle, which carries the corpus's "
                    "component structure.".format(meta["n_components"])
                )
            class_to_components = {c: {c} for c in range(n_classes)}
        args.sm_component_model = True
        args.sm_component_embedding_dim = meta["embedding_dim"]
        args.sm_component_mean_layers = meta["mean_layers"]
        args.sm_component_length_layers = meta["length_layers"]
        args.sm_component_z_dim = meta["z_dim"]
        args.sm_compound_structure = meta["compound_structure"]
        if meta["z_dim"] > 0:
            args.sm_component_z_hidden_dim = meta["z_hidden_dim"]
            args.seq_num_layers_component = meta["encoder_layers"]
        _set_flow_args_from_params(args, params)
        module = ComponentHsmm(
            args,
            n_classes,
            n_components=meta["n_components"],
            class_to_components=class_to_components,
            feature_dim=meta["feature_dim"],
            allow_self_transitions=True,
            per_class_bias=meta["per_class_bias"],
        )
        module.params = jax.tree_util.tree_map(jnp.asarray, params)
        return SemiMarkovModel(args, n_classes, meta["feature_dim"], module)

    params, skipped = params_from_reference_state_dict(state_dict)
    if skipped:
        logger.debug("import: skipping non-parameter keys {}".format(skipped))
    n_classes, feature_dim = params["gaussian_means"].shape
    _set_flow_args_from_params(args, params)
    module = GaussianHsmm(
        args, n_classes, feature_dim, allow_self_transitions=True
    )
    module.params = jax.tree_util.tree_map(jnp.asarray, params)
    return SemiMarkovModel(args, n_classes, feature_dim, module)
