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

# Reference parity is defined in fp32: the reference's CUDA stack runs
# exact float32 matmuls, but JAX's DEFAULT matmul precision on TPU
# rounds inputs to bf16 — measured 0.23-nat emission log-prob errors at
# the production shape (D=300), enough to flip near-boundary frame
# decodes (found by scripts/dp_parity_fuzz.py on-chip; CPU tests are
# exact either way). Full-fp32 emission costs +0.035 ms of a ~0.96 ms
# decode (~4%); the numerically-sensitive emission contractions also
# pin Precision.HIGHEST explicitly in ops/distributions.py.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")
