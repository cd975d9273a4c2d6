"""Grouped PCA feature preprocessing, jitted on device.

Replaces the reference's sklearn PCA pipeline (src/data/features.py:18-43)
with a jax SVD: for each feature group the centered data matrix of all
videos is decomposed on the accelerator and the top-`n_components`
right singular vectors project each video. Components are sign-fixed the
same way sklearn >= 1.5 does (svd_flip with u_based_decision=False:
flip each component so its largest-|entry| coefficient in Vt is
positive) so results match sklearn up to numerical precision; sklearn
< 1.5 used the u-based convention and can differ in sign on data where
the two criteria disagree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu.utils import all_equal, logger


class PCAModel:
    """Fitted PCA projection: x -> (x - mean) @ components.T."""

    def __init__(self, mean, components, explained_variance_ratio):
        self.mean_ = np.asarray(mean)
        self.components_ = np.asarray(components)
        self.explained_variance_ratio_ = np.asarray(explained_variance_ratio)

    def transform(self, x):
        return np.asarray(_pca_transform(jnp.asarray(x), jnp.asarray(self.mean_), jnp.asarray(self.components_)))


@jax.jit
def _pca_transform(x, mean, components):
    return (x - mean) @ components.T


def fit_pca(X, n_components):
    """Fit PCA on (N, D) data; returns PCAModel. SVD runs on device in
    float32 (adequate for feature preprocessing; parity tests compare
    against sklearn with loose tolerance)."""
    X = np.asarray(X, np.float32)
    n_components = min(n_components, X.shape[1], X.shape[0])
    mean = X.mean(axis=0)

    def _svd(xc):
        u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
        # sklearn svd_flip (u_based_decision=False): flip each component so
        # its largest-|entry| coefficient in Vt is positive
        max_cols = jnp.argmax(jnp.abs(vt), axis=1)
        signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_cols])
        return s, vt * signs[:, None]

    s, vt = jax.jit(_svd)(jnp.asarray(X - mean))
    s = np.asarray(s)
    vt = np.asarray(vt)
    explained = (s**2) / (X.shape[0] - 1)
    ratio = explained / explained.sum()
    return PCAModel(mean, vt[:n_components], ratio[:n_components])


def merge_grouped(grouped_features):
    """Concatenate per-group features per video (features.py:7-15)."""
    merged = {}
    assert all_equal(gd.keys() for gd in grouped_features.values())
    for vid_name in next(iter(grouped_features.values())):
        values = [
            t[1][vid_name]
            for t in sorted(grouped_features.items(), key=lambda t: t[0])
        ]
        merged[vid_name] = np.hstack(values)
    return merged


def grouped_pca(grouped_features, n_components, pca_models_by_group=None):
    """Fit per-group PCA over all videos and transform each video
    (features.py:18-43)."""
    if pca_models_by_group is not None:
        assert set(grouped_features.keys()) == set(pca_models_by_group.keys())
    else:
        pca_models_by_group = {}
        for group_name, vid_dict in grouped_features.items():
            assert all_equal(v.shape[1] for v in vid_dict.values())
            X = np.vstack(list(vid_dict.values()))
            pca = fit_pca(X, min(n_components, X.shape[1]))
            logger.debug("group {}: {} instances".format(group_name, len(vid_dict)))
            logger.debug(
                "group {}: pca explained {} of the variance".format(
                    group_name, pca.explained_variance_ratio_.sum()
                )
            )
            pca_models_by_group[group_name] = pca
    # project all videos of a group in ONE stacked matmul, then split by
    # row counts: a per-video transform would pay one jit retrace per
    # distinct (T, D) shape (minutes each through the remote-compile
    # tunnel) and one ~0.5 s dispatch->fetch round trip per video
    # (CLAUDE.md round-trip rule) — hours over a real corpus
    transformed = {}
    for group_name, vid_dict in grouped_features.items():
        names = list(vid_dict.keys())
        rows = np.cumsum([vid_dict[n].shape[0] for n in names])[:-1]
        stacked = pca_models_by_group[group_name].transform(
            np.vstack([vid_dict[n] for n in names])
        )
        transformed[group_name] = dict(zip(names, np.split(stacked, rows)))
    return transformed, pca_models_by_group
