"""Pins for per-label embedding outlier z-scores."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import label_outlier_z


def _ds(vecs, labels):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64),
                "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
                "label": np.asarray(labels, dtype=np.int32),
            }
        )
    )


def test_outlier_is_tail_z(ray_session):
    # 7 tight vectors + 1 far outlier in label 0
    base = [[1.0, 0.0, 0.0, 0.0]] * 7
    vecs = base + [[0.0, 5.0, 0.0, 0.0]]
    out = label_outlier_z(_ds(vecs, [0] * 8)).to_pandas().sort_values("vec_id")
    zs = out["z"].to_numpy()
    assert zs[-1] > 2.0  # the planted outlier
    assert (zs[:-1] < 0).all()  # the tight cluster sits below the mean


def test_singleton_label_z_zero(ray_session):
    out = label_outlier_z(_ds([[1.0, 2.0]], [5])).to_pandas()
    assert out["z"].iloc[0] == 0.0


def test_identical_vectors_z_zero(ray_session):
    out = label_outlier_z(_ds([[1.0, 1.0]] * 4, [2] * 4)).to_pandas()
    assert (out["z"] == 0.0).all()


def test_label_centroid_cosine(ray_session):
    from kgray.ops.similarity import label_centroid_cosine

    # label 0 along x, label 1 along y (orthogonal), label 2 along x too
    vecs = [[1.0, 0.0], [2.0, 0.0], [0.0, 1.0], [0.0, 3.0], [4.0, 0.0]]
    labels = [0, 0, 1, 1, 2]
    ds = _ds(vecs, labels)
    out = label_centroid_cosine(ds)
    m = {(a, b): c for a, b, c in zip(out["label_a"], out["label_b"], out["cosine"])}
    assert abs(m[(0, 1)]) < 1e-6  # orthogonal
    assert abs(m[(0, 2)] - 1.0) < 1e-6  # parallel
    assert abs(m[(1, 2)]) < 1e-6
