"""Sequential models (port of src/models/sequential.py).

* SequentialDiscriminative — BiLSTM frame tagger with masked
  cross-entropy (sequential.py:237-354), on the hand-rolled scan LSTM.
* SequentialCanonicalBaseline — canonical step ordering with uniform
  durations (sequential.py:147-235).
* SequentialPredictConstraints — decode the narration constraint matrix
  directly (sequential.py:32-106).
* SequentialGroundTruth — oracle (sequential.py:108-145).
"""

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu.data.batching import iter_batches
from action_segmentation_tpu.models import nn, rnn
from action_segmentation_tpu.models.base import Model, apply_lr, make_optimizer


def encoder_args(parser):
    parser.add_argument("--seq_num_layers", type=int, default=2)


def _seq_logits(params, feats, lengths, valid_mask):
    encoded = rnn.lstm_apply(params["encoder"], feats, lengths)
    logits = nn.linear(params["proj"], encoded)
    return jnp.where(valid_mask, logits, -jnp.inf)


# module-level jitted inference: a @jax.jit defined inside predict()
# would get a FRESH trace cache per call, re-compiling every per-epoch
# dev evaluation (minutes per shape through the remote-compile tunnel)
@jax.jit
def _seq_infer(params, feats, lengths, valid_mask):
    return jnp.argmax(_seq_logits(params, feats, lengths, valid_mask), axis=-1)


class SequentialDiscriminative(Model):
    @classmethod
    def add_args(cls, parser):
        encoder_args(parser)
        parser.add_argument("--seq_hidden_size", type=int, default=200)

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self.args = args
        self.n_classes = train_data._corpus.n_classes
        rng = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
        k_enc, k_proj = jax.random.split(rng)
        assert args.seq_hidden_size % 2 == 0
        self.params = {
            "encoder": rnn.lstm_init(
                k_enc,
                train_data.feature_dim,
                args.seq_hidden_size // 2,
                num_layers=args.seq_num_layers,
            ),
            "proj": nn.linear_init(k_proj, args.seq_hidden_size, self.n_classes),
        }

    def _logits(self, params, feats, lengths, valid_mask):
        return _seq_logits(params, feats, lengths, valid_mask)

    def fit(self, train_data, use_labels, callback_fn=None):
        assert use_labels
        args = self.args
        assert args.batch_accumulation <= 1
        tx, scheduler = make_optimizer(args)
        opt_state = tx.init(self.params)
        lr = args.lr

        model = self

        @jax.jit
        def step(params, opt_state, feats, lengths, gt, valid_mask, mask, lr):
            def loss_fn(p):
                logits = model._logits(p, feats, lengths, valid_mask)
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
                train_data,
                batch_size=args.batch_size,
                batch_by_task=False,
                shuffle=True,
                seed=(getattr(args, "seed", 1) or 1) + epoch,
            ):
                T = batch["features"].shape[1]
                valid_mask = np.zeros((self.n_classes,), bool)
                valid_mask[np.asarray(batch["task_indices"][0])] = True
                mask = (
                    np.arange(T)[None, :] < batch["lengths"][:, None]
                ).astype(np.float32)
                params, opt_state, loss = step(
                    params,
                    opt_state,
                    jnp.asarray(batch["features"]),
                    jnp.asarray(batch["lengths"]),
                    jnp.asarray(batch["gt_single"]),
                    jnp.asarray(valid_mask),
                    jnp.asarray(mask),
                    lr,
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
        infer = _seq_infer
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False
        ):
            valid_mask = np.zeros((self.n_classes,), bool)
            valid_mask[np.asarray(batch["task_indices"][0])] = True
            preds = np.asarray(
                infer(
                    self.params,
                    jnp.asarray(batch["features"]),
                    jnp.asarray(batch["lengths"]),
                    jnp.asarray(valid_mask),
                )
            )
            for i, video in enumerate(batch["video_name"]):
                predictions[video] = preds[i, : batch["lengths"][i]]
        return predictions

    def __getstate__(self):
        state = dict(self.__dict__)
        state["params"] = jax.tree_util.tree_map(np.asarray, state["params"])
        return state


class _CrosstaskStepMixin:
    def _init_step_indices(self, args, train_data):
        from action_segmentation_tpu.data.crosstask import CrosstaskDatasplit

        assert isinstance(train_data, CrosstaskDatasplit)
        self.args = args
        self.n_classes = train_data._corpus.n_classes
        self.remove_background = train_data.remove_background
        # resolve step labels via get_label so this also works with
        # --task_specific_steps (the reference indexes bare step names,
        # sequential.py:51, which requires task_specific_steps=False)
        self.ordered_nonbackground_indices_by_task = {
            task_id: [
                train_data.corpus.label2index[
                    train_data.corpus.get_label(task_id, step)
                ]
                for step in task.steps
            ]
            for task_id, task in train_data._tasks_by_id.items()
        }
        self.background_indices_by_task = {
            task_id: list(
                sorted(
                    ix
                    for ix in train_data.corpus.indices_by_task(task_id)
                    if ix in set(train_data.corpus._background_indices)
                )
            )
            for task_id in train_data._tasks_by_id.keys()
        }


class SequentialCanonicalBaseline(Model, _CrosstaskStepMixin):
    @classmethod
    def add_args(cls, parser):
        parser.add_argument(
            "--canonical_baseline_background_fraction", type=float, default=0.0
        )

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self._init_step_indices(args, train_data)
        assert all(len(v) == 1 for v in self.background_indices_by_task.values())

    def fit(self, train_data, use_labels, callback_fn=None):
        pass

    def predict_single(self, task_id, num_timesteps):
        """Uniform-duration canonical ordering (sequential.py:178-217)."""
        if self.remove_background:
            num_background_frames = 0
        else:
            num_background_frames = int(
                num_timesteps * self.args.canonical_baseline_background_fraction
            )
            background_index = next(iter(self.background_indices_by_task[task_id]))
        nonbackground_indices = self.ordered_nonbackground_indices_by_task[task_id]
        if not self.remove_background:
            assert num_timesteps >= len(nonbackground_indices)
        num_nonbackground_frames = max(
            num_timesteps - num_background_frames, len(nonbackground_indices)
        )
        step_duration = num_nonbackground_frames // len(nonbackground_indices)
        assert step_duration >= 1
        if self.remove_background or num_background_frames == 0:
            background_duration = 0
            pad = nonbackground_indices[-1]
        else:
            background_duration = (
                num_timesteps - step_duration * len(nonbackground_indices)
            ) // (len(nonbackground_indices) + 1)
            assert background_duration >= 0
            pad = background_index
        indices = []
        for step_ix in nonbackground_indices:
            if not self.remove_background:
                indices.extend([background_index] * background_duration)
            indices.extend([step_ix] * step_duration)
        indices.extend([pad] * (num_timesteps - len(indices)))
        return indices[:num_timesteps]

    def predict(self, test_data):
        predictions = {}
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            predictions[batch["video_name"][0]] = self.predict_single(
                batch["task_name"][0], int(batch["lengths"][0])
            )
        return predictions


class SequentialPredictConstraints(Model, _CrosstaskStepMixin):
    @classmethod
    def add_args(cls, parser):
        pass

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self._init_step_indices(args, train_data)
        assert all(len(v) == 1 for v in self.background_indices_by_task.values())
        self.canonical = (
            SequentialCanonicalBaseline(args, train_data)
            if train_data.remove_background
            else None
        )

    def fit(self, train_data, use_labels, callback_fn=None):
        pass

    def predict(self, test_data):
        predictions = {}
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            task = batch["task_name"][0]
            video = batch["video_name"][0]
            T = int(batch["lengths"][0])
            constraints = batch["constraints"][0, :T]
            step_indices = self.ordered_nonbackground_indices_by_task[task]
            background_indices = self.background_indices_by_task[task]
            active_step = constraints.argmax(axis=1)
            preds = np.array([step_indices[ix] for ix in active_step], np.int64)
            no_constraint = constraints.sum(axis=1) == 0
            if not test_data.remove_background:
                preds[no_constraint] = background_indices[0]
            else:
                baseline_preds = self.canonical.predict_single(task, T)
                for ix in np.flatnonzero(no_constraint):
                    preds[ix] = baseline_preds[ix]
            predictions[video] = preds
        return predictions


class SequentialGroundTruth(Model):
    @classmethod
    def add_args(cls, parser):
        pass

    @classmethod
    def from_args(cls, args, train_data):
        return cls(args, train_data)

    def __init__(self, args, train_data):
        self.args = args
        self.n_classes = train_data._corpus.n_classes

    def fit(self, train_data, use_labels, callback_fn=None):
        pass

    def predict(self, test_data):
        predictions = {}
        for batch in iter_batches(
            test_data, batch_size=1, batch_by_task=False, shuffle=False, bucket=False
        ):
            T = int(batch["lengths"][0])
            predictions[batch["video_name"][0]] = batch["gt_single"][0, :T].tolist()
        return predictions
