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

    def __init__(self, model, valid_classes=None, task=None):
        from action_segmentation_tpu import BIG_NEG
        from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

        assert isinstance(model, SemiMarkovModel), type(model)
        self.model = model
        if valid_classes is None:
            valid_classes = np.arange(model.n_classes, dtype=np.int64)
        self.valid_classes = np.asarray(valid_classes, np.int64)
        # honor the model's end-class constraints exactly like predict():
        # canonical-ordering training needs the SHORT-VIDEO exception
        # (a video shorter than the step sequence may end mid-order,
        # _make_additional_allowed_ends / semimarkov.py:135-147), which
        # is per-task and per-length — so a constrained model requires
        # `task` here, or every end column on a short video would be
        # BIG_NEG and Viterbi would return garbage with no error.
        self._task = task
        self._per_video_ends = (
            model.module.allowed_ends is not None
            and model.ordered_indices_by_task is not None
        )
        if self._per_video_ends and task is None:
            raise ValueError(
                "this model was trained with canonical-ordering "
                "constraints; Segmenter needs task=<task name> to build "
                "the per-video end masks predict() uses"
            )
        if model.module.allowed_ends is not None:
            allowed = set(model.module.allowed_ends)
            mask = np.array([ix in allowed for ix in self.valid_classes])
            if not self._per_video_ends and not mask.any():
                raise ValueError(
                    "no allowed end classes within valid_classes — every "
                    "decode would argmax over BIG_NEG-saturated scores"
                )
            self._end_row = np.where(mask, 0.0, BIG_NEG).astype(np.float32)
        else:
            self._end_row = np.zeros(len(self.valid_classes), np.float32)
        self._decode = model._get_jitted("decode", model._build_decode_step)

    def _end_rows(self, lengths):
        """(B, C) end mask — the same rows predict() builds."""
        if self._per_video_ends:
            return np.stack(
                [
                    self.model._end_mask_row(self.valid_classes, self._task, L)
                    for L in lengths
                ]
            )
        C = len(self.valid_classes)
        return np.broadcast_to(self._end_row, (len(lengths), C)).copy()

    @classmethod
    def load(cls, path, valid_classes=None):
        with open(path, "rb") as f:
            model = pickle.load(f)
        return cls(model, valid_classes=valid_classes)

    def segment_many(self, feature_list, batch_size=16):
        """Segment a list of (T_i, D) float arrays -> list of (T_i,) labels.

        Batch for throughput: the packed Viterbi's group-step cost is
        near-flat in B, measured on chip (scripts/serving_batch_scan.py,
        docs/DESIGN.md §7): device decode runs 2.5M frames/s at B=1 but
        15.6-16.3M from B=12 (36x the frames for 5.5x the time), so
        callers with many videos should keep batch_size >= 12.

        Pipelined like Model.predict (the deferred-drain discipline from
        CLAUDE.md's round-trip rule): every batch is packed on the host
        first, inputs ride ONE stacked `jax.device_put` per drain window
        (16 batches) instead of four per-batch transfers — each separate
        transfer through the remote tunnel pays its own round trip,
        measured as a residual ~0.2 s/batch serialization in the round-5
        scan's e2e_multi rows even after dispatch went asynchronous —
        every batch is then DISPATCHED asynchronously with its labels
        left on device, and all labels come back in ONE stacked fetch at
        the end, plus a tiny backpressure scalar every window to bound
        queued input buffers. Round-4 measured the per-batch-fetch
        version at 19-29k frames/s end-to-end vs ~16M on device
        (docs/serving_batch_scan_r4.json); the per-CALL round trip and
        one put per window are now the only constants left.
        """
        from action_segmentation_tpu.utils.drain import DeferredLabelDrain

        UPLOAD_WINDOW = 16
        rng = jax.random.PRNGKey(0)
        order = np.argsort([f.shape[0] for f in feature_list])
        results = {}
        C = len(self.valid_classes)
        vc_dev = jnp.asarray(self.valid_classes)

        metas, host_batches = [], []
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            lengths = np.array([feature_list[i].shape[0] for i in idxs], np.int32)
            Tpad = pad_length_to_bucket(int(lengths.max()))
            D = feature_list[idxs[0]].shape[1]
            feats = np.zeros((len(idxs), Tpad, D), np.float32)
            for row, i in enumerate(idxs):
                feats[row, : lengths[row]] = feature_list[i]
            cons = np.zeros((len(idxs), Tpad, C), np.float32)
            metas.append((idxs, lengths))
            host_batches.append((feats, lengths, cons, self._end_rows(lengths)))

        drain = DeferredLabelDrain(backpressure_every=UPLOAD_WINDOW)
        keys = jax.random.split(rng, max(len(host_batches), 1))
        for w0 in range(0, len(host_batches), UPLOAD_WINDOW):
            # one put per window also bounds device-resident undecoded
            # inputs to the same window the backpressure scalar enforces
            dev_chunk = jax.device_put(host_batches[w0 : w0 + UPLOAD_WINDOW])
            for off, (feats_d, lengths_d, cons_d, ends_d) in enumerate(dev_chunk):
                labels, _ = self._decode(
                    self.model.module.params,
                    feats_d,
                    lengths_d,
                    vc_dev,
                    cons_d,
                    ends_d,
                    keys[w0 + off],
                )
                drain.add(metas[w0 + off], labels)

        for (idxs, lengths), labels in drain.drain():
            for r, i in enumerate(idxs):
                results[i] = labels[r, : lengths[r]]
        return [results[i] for i in range(len(feature_list))]

    def segment(self, features):
        """Segment one (T, D) float array -> (T,) int labels."""
        return self.segment_many([np.asarray(features)])[0]

    def segment_with_marginals(self, features):
        """Segment one (T, D) array and return posterior frame marginals.

        Returns (labels (T,), marginals (T, n_classes)): marginals[t, c]
        is the posterior probability that frame t belongs to GLOBAL
        class c under the HSMM (zero for classes outside this
        segmenter's valid set), computed as d logZ / d emit via the
        Pallas custom-VJP forward/backward pair (ops/hsmm_grad.py) — the
        calibrated confidence signal the argmax labels alone don't
        carry. Labels and marginals come from ONE jitted pass (shared
        potentials; decode is the extra max-semiring scan).
        """
        import jax

        from action_segmentation_tpu.ops.hsmm import (
            hsmm_frame_marginals,
            hsmm_viterbi,
        )
        from action_segmentation_tpu.ops.hsmm_grad import hsmm_frame_marginals_fast
        from action_segmentation_tpu.ops.hsmm_pallas import (
            hsmm_viterbi_labels_pallas,
            pallas_supported,
        )
        from action_segmentation_tpu.ops.span_codec import spans_to_labels

        features = np.asarray(features, np.float32)
        T, D = features.shape
        Tpad = pad_length_to_bucket(T)
        feats = np.zeros((1, Tpad, D), np.float32)
        feats[0, :T] = features
        lengths = np.array([T], np.int32)
        C = len(self.valid_classes)
        module = self.model.module
        use_pallas = pallas_supported(C)

        def run(params, feats, lengths, vc, end_row):
            cons = jnp.zeros(feats.shape[:2] + (C,), jnp.float32)
            end_allowed = jnp.broadcast_to(end_row, (feats.shape[0], C))
            pots, _, _ = module.compute_potentials(
                params, feats, lengths, vc, cons, end_allowed,
                jax.random.PRNGKey(0), use_mean_z=True,
            )
            marg_fn = (
                hsmm_frame_marginals_fast if use_pallas else hsmm_frame_marginals
            )
            marg = marg_fn(pots, lengths)
            if use_pallas:
                labels_sub, _ = hsmm_viterbi_labels_pallas(pots, lengths)
            else:
                spans_sub, _ = hsmm_viterbi(pots, lengths)
                labels_sub = jnp.where(
                    jnp.arange(feats.shape[1])[None, :] < lengths[:, None],
                    spans_to_labels(spans_sub),
                    -1,
                )
            labels = jnp.where(labels_sub >= 0, vc[jnp.clip(labels_sub, 0)], -1)
            return labels, marg

        # cache key includes the subset size: two Segmenters over the
        # same model may use different valid-class sets
        fn = self.model._get_jitted(
            "frame_marginals_{}".format(C), lambda: jax.jit(run)
        )
        labels_d, marg_d = fn(
            module.params,
            jnp.asarray(feats),
            jnp.asarray(lengths),
            jnp.asarray(self.valid_classes),
            jnp.asarray(self._end_rows([T])[0]),
        )
        labels = np.asarray(labels_d)[0, :T]
        marg_sub = np.asarray(marg_d)[0, :T]
        # scatter subset columns into global class ids to match labels
        marg = np.zeros((T, self.model.n_classes), np.float32)
        marg[:, self.valid_classes] = marg_sub
        return labels, marg
