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
