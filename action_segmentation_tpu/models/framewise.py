"""Framewise classifiers (port of src/models/framewise.py).

* FramewiseDiscriminative — feedforward per-frame tagger trained with
  cross-entropy over valid classes, jitted per batch shape.
* FramewiseGaussianMixture — per-class Gaussians from sufficient stats;
  prediction masks to task classes and argmaxes the posterior on device.
* FramewiseBaseline — majority class or sampled class distribution.
"""

import functools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.data.batching import iter_batches
from action_segmentation_tpu.models.base import Model, apply_lr, make_optimizer
from action_segmentation_tpu.models import nn
from action_segmentation_tpu.ops.distributions import (
    gaussian_emission_log_probs,
    gaussian_emission_log_probs_diag,
    gaussian_emission_log_probs_fullcov,
)
from action_segmentation_tpu.ops.stats import semimarkov_sufficient_stats


def feed_forward_args(parser):
    parser.add_argument("--ff_dropout_p", type=float, default=0.1)
    parser.add_argument("--ff_hidden_layers", type=int, default=0)
    parser.add_argument("--ff_hidden_dim", type=int, default=200)


def feed_forward_init(rng, args, input_dim, output_dim):
    if args.ff_hidden_layers == 0:
        dims = [input_dim, output_dim]
    else:
        dims = [input_dim] + [args.ff_hidden_dim] * args.ff_hidden_layers + [output_dim]
    return nn.mlp_init(rng, dims)


def feed_forward_apply(params, x, dropout_p=0.0, rng=None):
    if dropout_p > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_p), 0.0)
    return nn.mlp_apply(params, x)


def mask_to_valid_classes(logits, valid_mask):
    """Additive -inf mask over invalid classes (framewise.py:37-44)."""
    return jnp.where(valid_mask, logits, -jnp.inf)


# module-level jitted inference: a @jax.jit defined inside predict()
# would get a FRESH trace cache per call, re-compiling every per-epoch
# dev evaluation (minutes per shape through the remote-compile tunnel)
@jax.jit
def _ff_infer(params, feats, valid_mask):
    logits = feed_forward_apply(params, feats)
    return jnp.argmax(mask_to_valid_classes(logits, valid_mask), axis=-1)


@functools.partial(jax.jit, static_argnames=("cov_type",))
def _gm_infer(feats, means, cov, log_priors, valid_mask, cov_type):
    emit_fn = {
        "tied_diag": gaussian_emission_log_probs,
        "diag": gaussian_emission_log_probs_diag,
        "full": gaussian_emission_log_probs_fullcov,
        "tied": gaussian_emission_log_probs_fullcov,
    }[cov_type]
    logp = emit_fn(feats[None], means, cov)[0]
    logp = logp + log_priors[None, :]
    return jnp.argmax(jnp.where(valid_mask, logp, -jnp.inf), axis=-1)


class FramewiseDiscriminative(Model):
    @classmethod
    def add_args(cls, parser):
        feed_forward_args(parser)

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self.args = args
        self.n_classes = train_data._corpus.n_classes
        self.params = feed_forward_init(
            jax.random.PRNGKey(getattr(args, "seed", 0) or 0),
            args,
            train_data.feature_dim,
            self.n_classes,
        )

    def fit(self, train_data, use_labels, callback_fn=None):
        assert use_labels
        args = self.args
        tx, scheduler = make_optimizer(args)
        opt_state = tx.init(self.params)
        lr = args.lr
        dropout_p = args.ff_dropout_p
        rng = jax.random.PRNGKey(getattr(args, "seed", 1) or 1)

        @jax.jit
        def step(params, opt_state, feats, gt, valid_mask, mask, lr, rng):
            def loss_fn(p):
                logits = feed_forward_apply(p, feats, dropout_p, rng)
                logits = mask_to_valid_classes(logits, valid_mask)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
                # padded frames may carry out-of-task gt labels (logp -inf);
                # select rather than multiply so inf * 0 can't produce NaN
                nll = jnp.where(mask > 0, nll, 0.0)
                return jnp.sum(nll) / jnp.maximum(mask.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, apply_lr(updates, lr)
            )
            return params, opt_state, loss

        params = self.params
        for epoch in range(args.epochs):
            losses = []
            for batch in iter_batches(
                train_data, batch_size=1, batch_by_task=False, shuffle=True,
                seed=(getattr(args, "seed", 1) or 1) + epoch,
            ):
                B, T = batch["features"].shape[:2]
                valid_mask = np.zeros((self.n_classes,), bool)
                valid_mask[np.asarray(batch["task_indices"][0])] = True
                mask = (
                    np.arange(T)[None, :] < batch["lengths"][:, None]
                ).astype(np.float32)
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(
                    params,
                    opt_state,
                    jnp.asarray(batch["features"]),
                    jnp.asarray(batch["gt_single"]),
                    jnp.asarray(valid_mask),
                    jnp.asarray(mask),
                    lr,
                    sub,
                )
                # defer: a per-batch float() costs a ~0.5 s round trip
                # through the TPU tunnel (CLAUDE.md round-trip rule)
                losses.append(loss)
            # publish params before the callback: per-epoch evaluation and
            # dev early stopping must see the current model
            self.params = params
            train_loss = float(
                np.mean(np.asarray(jnp.stack(losses)), dtype=np.float64)
            )
            if scheduler is not None:
                lr = scheduler.step(train_loss)
            if callback_fn:
                callback_fn(epoch, {"train_loss": train_loss})
        self.params = params

    def predict(self, test_data):
        predictions = {}
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False
        ):
            valid_mask = np.zeros((self.n_classes,), bool)
            valid_mask[np.asarray(batch["task_indices"][0])] = True
            preds = np.asarray(
                _ff_infer(self.params, jnp.asarray(batch["features"]), jnp.asarray(valid_mask))
            )
            for i, video in enumerate(batch["video_name"]):
                predictions[video] = preds[i, : batch["lengths"][i]]
        return predictions

    def __getstate__(self):
        state = dict(self.__dict__)
        state["params"] = jax.tree_util.tree_map(np.asarray, state["params"])
        return state


class FramewiseGaussianMixture(Model):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--gm_covariance",
            choices=["full", "diag", "tied", "tied_diag"],
            default="tied_diag",
        )

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data._corpus.n_classes, train_data.feature_dim)

    def __init__(self, args, n_classes, feature_dim):
        self.args = args
        self.n_classes = n_classes
        self.feature_dim = feature_dim
        self.means = None
        self.cov = None
        self.log_priors = None

    def fit(self, train_data, use_labels, callback_fn=None):
        feature_list, label_list = [], []
        for batch in iter_batches(
            train_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            L = int(batch["lengths"][0])
            feature_list.append(batch["features"][0, :L])
            label_list.append(batch["gt_single"][0, :L])
        cov_type = getattr(self.args, "gm_covariance", "tied_diag")
        stats = semimarkov_sufficient_stats(
            feature_list, label_list, n_classes=self.n_classes, max_k=100,
            covariance_type=cov_type,
        )
        self.means = stats["gaussian_means"]
        # all four sklearn covariance types of the reference
        # (framewise.py:198, semimarkov_utils.py:74-80)
        self.cov = stats[{
            "tied_diag": "gaussian_cov",
            "diag": "gaussian_cov_diag",
            "full": "gaussian_cov_full",
            "tied": "gaussian_cov_tied",
        }[cov_type]]
        counts = np.zeros(self.n_classes)
        for labels in label_list:
            np.add.at(counts, labels, 1.0)
        with np.errstate(divide="ignore"):
            self.log_priors = np.log(counts / counts.sum())
        self.log_priors[~np.isfinite(self.log_priors)] = BIG_NEG

    def predict(self, test_data):
        predictions = {}
        cov_type = getattr(self.args, "gm_covariance", "tied_diag")
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False
        ):
            valid_mask = np.zeros((self.n_classes,), bool)
            valid_mask[np.asarray(batch["task_indices"][0])] = True
            L = int(batch["lengths"][0])
            preds = np.asarray(
                _gm_infer(
                    jnp.asarray(batch["features"][0]),
                    jnp.asarray(self.means),
                    jnp.asarray(self.cov),
                    jnp.asarray(self.log_priors.astype(np.float32)),
                    jnp.asarray(valid_mask),
                    cov_type=cov_type,
                )
            )
            predictions[batch["video_name"][0]] = preds[:L]
        return predictions


class FramewiseBaseline(Model):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--framewise_baseline_type",
            choices=["majority_class", "sample_class_distribution"],
        )

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self.args = args
        self.n_classes = train_data._corpus.n_classes
        self.class_histograms_by_task = {}

    def fit(self, train_data, use_labels, callback_fn=None):
        assert use_labels
        for batch in iter_batches(
            train_data, batch_size=1, batch_by_task=False, shuffle=True, bucket=False
        ):
            task = batch["task_name"][0]
            L = int(batch["lengths"][0])
            gt = batch["gt_single"][0, :L]
            self.class_histograms_by_task.setdefault(task, Counter()).update(
                gt.tolist()
            )

    def predict(self, test_data):
        predictions = {}
        probs_by_task = {}
        classes_by_task = {}
        for task, task_distr in self.class_histograms_by_task.items():
            classes, counts = zip(*task_distr.most_common())
            classes_by_task[task] = classes
            probs_by_task[task] = np.array(counts, float) / sum(counts)
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            task = batch["task_name"][0]
            video = batch["video_name"][0]
            T = int(batch["lengths"][0])
            task_distr = self.class_histograms_by_task[task]
            if self.args.framewise_baseline_type == "majority_class":
                class_pred, _ = task_distr.most_common()[0]
                preds = np.full(T, class_pred, np.int64)
            else:
                assert (
                    self.args.framewise_baseline_type == "sample_class_distribution"
                )
                probs = probs_by_task[task]
                classes = classes_by_task[task]
                pred_indices = np.random.multinomial(1, probs, size=T).argmax(axis=1)
                preds = np.array([classes[ix] for ix in pred_indices])
            predictions[video] = preds
        return predictions
