"""TPU-native action segmentation framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
dpfried/action-segmentation (Fried et al., ACL 2020): hidden semi-Markov
models over pre-extracted video frame features, trained supervised
(closed-form or gradient) or unsupervised (marginal likelihood), with
weak supervision from narration constraints and canonical step orderings.

Layout:
  ops/         jittable compute: span codec, semi-Markov DP (jnp + Pallas),
               emission/duration/transition distributions, sufficient stats, PCA
  models/      model classes (semimarkov, framewise, sequential baselines, flow)
  data/        host-side corpora (CrossTask, Breakfast, synthetic) and batching
  evaluation/  Hungarian-matched accuracy metrics and segment F1
  parallel/    device mesh + sharded train/decode steps
  utils/       logging and small helpers
"""

__version__ = "0.1.0"

BIG_NEG = -1e9
