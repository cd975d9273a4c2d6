"""Emission / duration / transition factor computations.

Replaces the reference's per-class ``MultivariateNormal`` loop
(semimarkov_modules.py:353-362) with one batched matmul that XLA places on
the MXU, the ``torch.distributions.Poisson`` duration table
(semimarkov_modules.py:383-398), and the masked log-softmax
transition/initial factors (semimarkov_modules.py:284-322). All functions
are pure and jittable.
"""

import jax
import jax.numpy as jnp

from action_segmentation_tpu import BIG_NEG

LOG_2PI = 1.8378770664093453


def gaussian_emission_log_probs(features, means, cov_diag):
    """Tied diagonal-covariance Gaussian log-likelihoods.

    features: (..., T, D); means: (C, D) or (..., C, D) for per-instance
    means (compound model); cov_diag: (D,). Returns (..., T, C).

    log N(x; mu_c, diag(v)) = -0.5 * [ D log 2pi + sum log v
                                       + sum (x - mu_c)^2 / v ]
    expanded so the cross term is a single (T, D) x (D, C) matmul.
    """
    inv_v = 1.0 / cov_diag
    const = -0.5 * (features.shape[-1] * LOG_2PI + jnp.sum(jnp.log(cov_diag)))
    x_sq = jnp.einsum(
        "...td,d->...t", features**2, inv_v,
        precision=jax.lax.Precision.HIGHEST,
    )
    cross = jnp.einsum(
        "...td,...cd->...tc",
        features,
        means * inv_v,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    mu_sq = jnp.sum(means**2 * inv_v, axis=-1)  # (..., C)
    mu_sq = jnp.expand_dims(mu_sq, axis=-2)  # broadcasts over T (and B)
    return const - 0.5 * (x_sq[..., None] - 2.0 * cross + mu_sq)


def gaussian_emission_log_probs_diag(features, means, cov_diag):
    """Per-class diagonal-covariance Gaussian log-likelihoods.

    features: (..., T, D); means (C, D); cov_diag (C, D). Returns
    (..., T, C). Same expansion as the tied case but with per-class
    inverse variances, so the cross term stays one matmul.
    """
    inv_v = 1.0 / cov_diag  # (C, D)
    D = features.shape[-1]
    const = -0.5 * (D * LOG_2PI + jnp.sum(jnp.log(cov_diag), axis=-1))  # (C,)
    x_sq = jnp.einsum(
        "...td,cd->...tc", features**2, inv_v,
        precision=jax.lax.Precision.HIGHEST,
    )
    cross = jnp.einsum(
        "...td,cd->...tc", features, means * inv_v,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    mu_sq = jnp.sum(means**2 * inv_v, axis=-1)  # (C,)
    return const - 0.5 * (x_sq - 2.0 * cross + mu_sq)


def gaussian_emission_log_probs_fullcov(features, means, cov):
    """Full-covariance Gaussian log-likelihoods (sklearn 'full' / 'tied').

    features: (..., T, D); means: (C, D); cov: (C, D, D) per-class
    ('full') or (D, D) shared ('tied'). Returns (..., T, C).

    Mahalanobis terms through the covariance Cholesky L: with
    y = L^{-1} x, logp_c = -0.5 (D log 2pi + ||y - L^{-1} mu_c||^2)
    - log|diag L|. The shared-covariance case whitens once and expands
    the square so the cross term is a single (T, D) x (D, C) matmul; the
    per-class case runs one batched (T, D) x (D, D) einsum per class —
    both MXU shapes.
    """
    D = features.shape[-1]
    if cov.ndim == 2:  # tied: one shared full covariance
        chol = jnp.linalg.cholesky(cov)
        inv_chol = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(D, dtype=cov.dtype), lower=True
        )
        logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
        hi = jax.lax.Precision.HIGHEST
        y = jnp.einsum("...td,ed->...te", features, inv_chol, precision=hi)
        m = jnp.einsum("cd,ed->ce", means, inv_chol, precision=hi)
        y_sq = jnp.sum(y**2, axis=-1)
        cross = jnp.einsum(
            "...te,ce->...tc", y, m, precision=hi,
            preferred_element_type=jnp.float32,
        )
        m_sq = jnp.sum(m**2, axis=-1)
        quad = y_sq[..., None] - 2.0 * cross + m_sq
        return -0.5 * (D * LOG_2PI + quad) - logdet

    chol = jnp.linalg.cholesky(cov)  # (C, D, D)
    inv_chol = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(jnp.eye(D, dtype=cov.dtype), chol.shape),
        lower=True,
    )
    logdet = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    hi = jax.lax.Precision.HIGHEST
    ys = jnp.einsum("cij,...tj->...tci", inv_chol, features, precision=hi)
    mu_y = jnp.einsum("cij,cj->ci", inv_chol, means, precision=hi)
    quad = jnp.sum((ys - mu_y) ** 2, axis=-1)  # (..., T, C)
    return -0.5 * (D * LOG_2PI + quad) - logdet


def poisson_length_log_probs(log_rates, max_k):
    """Duration table: row d = Poisson(exp(log_rate)) log-pmf at d.

    log_rates: (..., C). Returns (..., K, C) with K = max_k (row 0 is a
    valid Poisson value but unreachable in the DP since durations start
    at 1). Mirrors the reference's K == 1 special case
    (semimarkov_modules.py:389-391): a 2-row [[0], [-1000]] table.
    """
    C = log_rates.shape[-1]
    if max_k == 1:
        shape = log_rates.shape[:-1] + (2, C)
        table = jnp.zeros(shape, jnp.float32)
        return table.at[..., 1, :].set(-1000.0)
    d = jnp.arange(max_k, dtype=jnp.float32)  # (K,)
    log_rates = jnp.expand_dims(log_rates, -2)  # (..., 1, C)
    d = d[:, None]  # (K, 1)
    return d * log_rates - jnp.exp(log_rates) - jax.lax.lgamma(d + 1.0)


def masked_log_softmax(logits, disallowed_mask=None, axis=-1):
    """Fill disallowed entries with BIG_NEG, then log-softmax over `axis`.

    Keeps the reference's saturation semantics (BIG_NEG = -1e9 rather than
    -inf) so fully-masked slices stay finite.
    """
    if disallowed_mask is not None:
        logits = jnp.where(disallowed_mask, BIG_NEG, logits)
    return jax.nn.log_softmax(logits, axis=axis)


def transition_log_probs(logits, disallowed_mask=None, allow_self_transitions=True):
    """Column-normalized transition factors, indexed [to, from].

    logits: (C, C) or (B, C, C). Optional boolean mask of disallowed
    transitions (same indexing) and a self-transition ban; normalization is
    a log-softmax over the `to` axis (axis -2), matching
    semimarkov_modules.py:298-322.
    """
    if not allow_self_transitions:
        eye = jnp.eye(logits.shape[-1], dtype=bool)
        disallowed_mask = (
            eye if disallowed_mask is None else disallowed_mask | eye
        )
    return masked_log_softmax(logits, disallowed_mask, axis=-2)


def initial_log_probs(logits, disallowed_mask=None):
    """Normalized initial factors (semimarkov_modules.py:284-296)."""
    return masked_log_softmax(logits, disallowed_mask, axis=-1)
