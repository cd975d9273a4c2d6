"""Measure the two compiled decode constructions at the bench shape:

(a) hsmm_viterbi_labels_pallas — fused DUAL-direction max scan (fwd +
    time-reversed stacked on the group axis, 2x group-steps) + band
    combine; traceback-free, throughput independent of segment count;
(b) hsmm_viterbi_pallas + spans_to_labels — SINGLE-direction scan with
    packed backpointers + on-device vmapped while_loop traceback whose
    length is the max segment count.

(b) halves the scan work but serializes over segments; which wins
depends on the segment count (bench potentials give ~T/K-ish spans).
Records the decision for docs/DESIGN.md.

Run: python scripts/decode_path_probe.py  (real TPU)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from bench import B, C, D, K, T, N_BIG, N_SMALL, build_inputs, measure_pair


def main():
    from action_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.ops.distributions import (
        gaussian_emission_log_probs,
        initial_log_probs,
        poisson_length_log_probs,
        transition_log_probs,
    )
    from action_segmentation_tpu.ops.hsmm import HsmmPotentials
    from action_segmentation_tpu.ops.hsmm_pallas import (
        hsmm_viterbi_labels_pallas,
        hsmm_viterbi_pallas,
    )
    from action_segmentation_tpu.ops.span_codec import spans_to_labels

    rng = np.random.RandomState(0)
    feats, lengths, means, cov, tl, il, lr = build_inputs(rng, B, T)
    emit = gaussian_emission_log_probs(
        jnp.asarray(feats), jnp.asarray(means), jnp.asarray(cov)
    )
    pots = HsmmPotentials(
        trans=jnp.broadcast_to(transition_log_probs(jnp.asarray(tl)), (B, C, C)),
        init=jnp.broadcast_to(initial_log_probs(jnp.asarray(il)), (B, C)),
        lens=jnp.broadcast_to(
            poisson_length_log_probs(jnp.asarray(lr), K), (B, K, C)
        ),
        emit=emit,
        end_mask=jnp.zeros((B, C), jnp.float32),
    )
    lengths_j = jnp.asarray(lengths)

    # agreement + segment count context
    la, sa = hsmm_viterbi_labels_pallas(pots, lengths_j)
    spans, sb = hsmm_viterbi_pallas(pots, lengths_j)
    lb = jnp.where(
        jnp.arange(T)[None, :] < lengths_j[:, None], spans_to_labels(spans), -1
    )
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-5, atol=1e-3)
    agree = float((np.asarray(la) == np.asarray(lb)).mean())
    n_seg = int((np.asarray(spans) >= 0).sum(axis=1).max())
    print(f"label agreement {agree:.4f}, max segments/video {n_seg}")

    def chain(fn, n):
        @jax.jit
        def run(emit_in):
            def body(carry, _):
                p = pots._replace(emit=emit_in + carry.sum() * 0.0)
                labels, scores = fn(p, lengths_j)
                return scores, labels[0, 0]

            _, ys = jax.lax.scan(
                body, jnp.zeros((B,), jnp.float32), None, length=n
            )
            return ys

        return run

    def labels_path(p, l):
        return hsmm_viterbi_labels_pallas(p, l)

    def bp_path(p, l):
        spans, scores = hsmm_viterbi_pallas(p, l)
        labels = jnp.where(
            jnp.arange(T)[None, :] < l[:, None], spans_to_labels(spans), -1
        )
        return labels, scores

    for name, fn in (("dual-scan labels", labels_path),
                     ("backpointer+traceback", bp_path)):
        per_iter = measure_pair(
            chain(fn, N_SMALL), chain(fn, N_BIG),
            lambda out: np.asarray(out), pots.emit,
        )
        print(
            f"{name}: {per_iter * 1e3:.3f} ms/decode "
            f"({B * T / per_iter / 1e6:.1f}M frames/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
