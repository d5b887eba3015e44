"""Streaming PCA (kgray/ops/similarity.py pca_project): recovers the
dominant eigvectors of the sample covariance and is partition-invariant."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import pca_project


def _toy(n=300, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic Gaussian: variance 9 along u1, 1 along u2, 0.01 elsewhere
    d = 8
    basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
    scales = np.array([3.0, 1.0] + [0.1] * (d - 2))
    x = rng.normal(size=(n, d)) * scales
    return (x @ basis.T).astype(np.float32), basis


def _rows(mat):
    return [{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(mat)]


def test_pca_matches_numpy_eigh(ray_session):
    mat, _ = _toy()
    out = (
        pca_project(ray.data.from_items(_rows(mat)))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = mat.astype(np.float64)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    for k, col in ((1, "pc1"), (2, "pc2")):
        expect = (x - mu) @ vecs[:, -k]
        got = out[col].to_numpy()
        # power iteration converges up to sign; compare |correlation|
        corr = np.abs(np.corrcoef(expect, got)[0, 1])
        assert corr > 0.999, (col, corr)
    # pc1 captures more variance than pc2
    assert out["pc1"].var() > out["pc2"].var()


def test_pca_partition_invariant(ray_session):
    mat, _ = _toy(n=120, seed=11)
    a = (
        pca_project(ray.data.from_items(_rows(mat)))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        pca_project(ray.data.from_items(_rows(mat)).repartition(7))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # moment partials sum in a different order -> identical to 6 dp after
    # the op's own rounding except at most a 1-ulp rounding-boundary flip
    pd.testing.assert_frame_equal(a, b, atol=1e-6, rtol=0)


def test_standardize_embeddings_moments(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.similarity import standardize_embeddings

    # dim 1: values 0, 2, 4 -> mu 2, sigma sqrt(8/3); dim 2 constant -> z=0
    df = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[0.0, 7.0], [2.0, 7.0], [4.0, 7.0]],
        }
    )
    out = (
        standardize_embeddings(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values(["vec_id", "i"])
        .reset_index(drop=True)
    )
    sd = np.sqrt((0 + 4 + 16) / 3.0 - 4.0)
    exp = np.floor(np.array([-2.0, 0.0, 2.0]) / sd * 1e6 + 0.5) / 1e6
    assert out[out["i"] == 1]["z"].tolist() == exp.tolist()
    assert out[out["i"] == 2]["z"].tolist() == [0.0, 0.0, 0.0]
    assert len(out) == 6
