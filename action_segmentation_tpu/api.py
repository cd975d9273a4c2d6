"""High-level inference API.

A thin serving surface over trained models: load a serialized model (the
pickle-with-args format main.py writes) and segment raw feature arrays
without constructing corpora. Decoding batches videos, pads to length
buckets (bounded recompiles), and runs the fused Pallas Viterbi on TPU.

Example:
    seg = Segmenter.load("expts/run/all.pkl")
    labels = seg.segment(features)              # (T, D) -> (T,) int labels
    batches = seg.segment_many([f1, f2, ...])   # list of (T_i, D)
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu.data.batching import pad_length_to_bucket


class Segmenter:
    """Serving wrapper around a trained SemiMarkovModel."""

    def __init__(self, model, valid_classes=None):
        from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

        assert isinstance(model, SemiMarkovModel), type(model)
        self.model = model
        if valid_classes is None:
            valid_classes = np.arange(model.n_classes, dtype=np.int64)
        self.valid_classes = np.asarray(valid_classes, np.int64)
        self._decode = model._get_jitted("decode", model._build_decode_step)

    @classmethod
    def load(cls, path, valid_classes=None):
        with open(path, "rb") as f:
            model = pickle.load(f)
        return cls(model, valid_classes=valid_classes)

    def segment_many(self, feature_list, batch_size=16):
        """Segment a list of (T_i, D) float arrays -> list of (T_i,) labels."""
        out = []
        rng = jax.random.PRNGKey(0)
        order = np.argsort([f.shape[0] for f in feature_list])
        results = {}
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            lengths = np.array([feature_list[i].shape[0] for i in idxs], np.int32)
            Tpad = pad_length_to_bucket(int(lengths.max()))
            D = feature_list[idxs[0]].shape[1]
            feats = np.zeros((len(idxs), Tpad, D), np.float32)
            for row, i in enumerate(idxs):
                feats[row, : lengths[row]] = feature_list[i]
            C = len(self.valid_classes)
            cons = np.zeros((len(idxs), Tpad, C), np.float32)
            end_allowed = np.zeros((len(idxs), C), np.float32)
            rng, step_rng = jax.random.split(rng)
            labels, _ = self._decode(
                self.model.module.params,
                jnp.asarray(feats),
                jnp.asarray(lengths),
                jnp.asarray(self.valid_classes),
                jnp.asarray(cons),
                jnp.asarray(end_allowed),
                step_rng,
            )
            labels = np.asarray(labels)
            for row, i in enumerate(idxs):
                results[i] = labels[row, : lengths[row]]
        return [results[i] for i in range(len(feature_list))]

    def segment(self, features):
        """Segment one (T, D) float array -> (T,) int labels."""
        return self.segment_many([np.asarray(features)])[0]

    def segment_with_marginals(self, features):
        """Segment one (T, D) array and return posterior frame marginals.

        Returns (labels (T,), marginals (T, C)): marginals[t, c] is the
        posterior probability that frame t belongs to class c under the
        HSMM, computed as d logZ / d emit via the Pallas custom-VJP
        forward/backward pair (ops/hsmm_grad.py) — the calibrated
        confidence signal the argmax labels alone don't carry.
        """
        import jax

        from action_segmentation_tpu.ops.hsmm import hsmm_frame_marginals
        from action_segmentation_tpu.ops.hsmm_grad import hsmm_frame_marginals_fast
        from action_segmentation_tpu.ops.hsmm_pallas import pallas_supported

        features = np.asarray(features, np.float32)
        T, D = features.shape
        Tpad = pad_length_to_bucket(T)
        feats = np.zeros((1, Tpad, D), np.float32)
        feats[0, :T] = features
        lengths = np.array([T], np.int32)
        C = len(self.valid_classes)
        module = self.model.module

        def run(params, feats, lengths, vc):
            cons = jnp.zeros(feats.shape[:2] + (C,), jnp.float32)
            end_allowed = jnp.zeros((feats.shape[0], C), jnp.float32)
            pots, _, _ = module.compute_potentials(
                params, feats, lengths, vc, cons, end_allowed,
                jax.random.PRNGKey(0), use_mean_z=True,
            )
            fn = (
                hsmm_frame_marginals_fast
                if pallas_supported(C)
                else hsmm_frame_marginals
            )
            return fn(pots, lengths)

        marg_fn = self.model._get_jitted(
            "frame_marginals", lambda: jax.jit(run)
        )
        marg = np.asarray(
            marg_fn(
                module.params,
                jnp.asarray(feats),
                jnp.asarray(lengths),
                jnp.asarray(self.valid_classes),
            )
        )[0, :T]
        labels = self.segment(features)
        return labels, marg
