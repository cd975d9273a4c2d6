"""Sufficient statistics for the closed-form supervised HSMM fit.

Host-side numpy (init-time only), matching the semantics of the
reference's ``semimarkov_sufficient_stats`` (semimarkov_utils.py:74-126),
which routes through sklearn's GaussianMixture._initialize with one-hot
responsibilities: per-class feature means, a tied diagonal covariance
equal to the biased per-dimension variance of all frames (+ reg), and
span start / transition / count / length tallies.
"""

import numpy as np

from action_segmentation_tpu.ops.span_codec import labels_to_spans_np, rle_spans

REG_COVAR = 1e-6


def semimarkov_sufficient_stats(
    feature_list, label_list, n_classes, max_k=None,
    covariance_type="tied_diag",
):
    """Tally span statistics and Gaussian moments over a labeled corpus.

    feature_list: list of (T_i, D) float arrays
    label_list:   list of (T_i,) int arrays
    Returns a dict with keys:
      span_counts (C,), span_lengths (C,), span_start_counts (C,),
      span_transition_counts (C, C) [to, from], instance_count,
      gaussian_means (C, D), gaussian_cov (D,) tied diagonal,
      gaussian_cov_diag (C, D) per-class diagonal (sklearn
      GaussianMixture covariance_type='diag' moments + REG_COVAR);
      with covariance_type='full': gaussian_cov_full (C, D, D);
      with covariance_type='tied': gaussian_cov_tied (D, D).
    The full-matrix moments (sklearn _estimate_gaussian_covariances_full
    / _tied semantics, reference semimarkov_utils.py:74-80) cost
    O(T * D^2) host flops, so they are only accumulated when requested.
    """
    assert len(feature_list) == len(label_list)
    D = feature_list[0].shape[1]
    want_full = covariance_type == "full"
    want_tied = covariance_type == "tied"
    outer_sums = np.zeros((n_classes, D, D), np.float64) if want_full else None
    all_outer = np.zeros((D, D), np.float64) if want_tied else None
    span_counts = np.zeros(n_classes, np.float32)
    span_lengths = np.zeros(n_classes, np.float32)
    span_start_counts = np.zeros(n_classes, np.float32)
    span_transition_counts = np.zeros((n_classes, n_classes), np.float32)

    feat_sums = np.zeros((n_classes, D), np.float64)
    feat_sq_sums = np.zeros((n_classes, D), np.float64)
    frame_counts = np.zeros(n_classes, np.float64)

    all_sum = np.zeros(D, np.float64)
    all_sq_sum = np.zeros(D, np.float64)
    n_frames = 0

    for X, labels in zip(feature_list, label_list):
        X = np.asarray(X)
        labels = np.asarray(labels)
        np.add.at(feat_sums, labels, X)
        np.add.at(feat_sq_sums, labels, X**2)
        np.add.at(frame_counts, labels, 1.0)
        all_sum += X.sum(axis=0)
        all_sq_sum += (X**2).sum(axis=0)
        n_frames += X.shape[0]
        if want_full:
            for c in np.unique(labels):
                Xc = X[labels == c]
                outer_sums[c] += Xc.T @ Xc
        if want_tied:
            all_outer += X.T @ X

        spans = labels_to_spans_np(labels[None, :], max_k)
        rle = rle_spans(spans, np.array([spans.shape[1]]))[0]
        last_symbol = None
        for index, (symbol, length) in enumerate(rle):
            if index == 0:
                span_start_counts[symbol] += 1
            span_counts[symbol] += 1
            span_lengths[symbol] += length
            if last_symbol is not None:
                span_transition_counts[symbol, last_symbol] += 1
            last_symbol = symbol

    # class-conditional means (sklearn's nk includes a 10*eps guard so
    # empty classes yield ~0 means rather than NaN)
    nk = frame_counts + 10 * np.finfo(np.float64).eps
    means = (feat_sums / nk[:, None]).astype(np.float32)
    # tied diagonal covariance: biased variance of ALL frames + reg
    mean_all = all_sum / n_frames
    var_all = all_sq_sum / n_frames - mean_all**2
    cov = (var_all + REG_COVAR).astype(np.float32)
    cov_diag = (
        feat_sq_sums / nk[:, None] - (feat_sums / nk[:, None]) ** 2 + REG_COVAR
    ).astype(np.float32)

    extra = {}
    if want_full:
        # sklearn _estimate_gaussian_covariances_full with one-hot resp:
        # cov_k = sum_i r_ik (x_i - mu_k)(x_i - mu_k)^T / nk + reg * I
        mu = feat_sums / nk[:, None]
        cov_full = (
            outer_sums / nk[:, None, None]
            - mu[:, :, None] * mu[:, None, :]
            + REG_COVAR * np.eye(D)
        )
        extra["gaussian_cov_full"] = cov_full.astype(np.float32)
    if want_tied:
        # sklearn _estimate_gaussian_covariances_tied:
        # (X^T X - sum_k nk mu_k mu_k^T) / n + reg * I
        mu = feat_sums / nk[:, None]
        avg_means2 = (nk[:, None] * mu).T @ mu
        cov_tied = (all_outer - avg_means2) / nk.sum() + REG_COVAR * np.eye(D)
        extra["gaussian_cov_tied"] = cov_tied.astype(np.float32)

    return {
        **extra,
        "span_counts": span_counts,
        "span_lengths": span_lengths,
        "span_start_counts": span_start_counts,
        "span_transition_counts": span_transition_counts,
        "instance_count": len(feature_list),
        "gaussian_means": means,
        "gaussian_cov": cov,
        "gaussian_cov_diag": cov_diag,
    }
