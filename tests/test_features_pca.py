"""PCA preprocessing parity with sklearn (the reference's features.py)."""

import numpy as np

from action_segmentation_tpu.data.features import fit_pca, grouped_pca, merge_grouped


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA

    rng = np.random.RandomState(0)
    X = rng.randn(500, 20).astype(np.float32) @ rng.randn(20, 20).astype(np.float32)
    ours = fit_pca(X, 5)
    ref = PCA(n_components=5).fit(X)
    got = ours.transform(X[:50])
    want = ref.transform(X[:50])
    # svd_flip makes signs match; float32 SVD vs sklearn float64: loose tol
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        ours.explained_variance_ratio_, ref.explained_variance_ratio_, atol=1e-4
    )


def test_grouped_pca_and_merge():
    rng = np.random.RandomState(1)
    grouped = {
        "a": {"v1": rng.randn(30, 8).astype(np.float32), "v2": rng.randn(20, 8).astype(np.float32)},
        "b": {"v1": rng.randn(30, 6).astype(np.float32), "v2": rng.randn(20, 6).astype(np.float32)},
    }
    transformed, models = grouped_pca(grouped, 4)
    assert transformed["a"]["v1"].shape == (30, 4)
    assert transformed["b"]["v2"].shape == (20, 4)
    merged = merge_grouped(transformed)
    assert merged["v1"].shape == (30, 8)
    # transform with pre-fit models reproduces
    again, _ = grouped_pca(grouped, 4, pca_models_by_group=models)
    np.testing.assert_allclose(again["a"]["v1"], transformed["a"]["v1"], atol=1e-5)
