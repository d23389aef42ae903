"""Value contract for the rows-only ``embedding_pca_project`` query
(operators/projection.py): no SQL oracle can run an eigendecomposition, so
the math is pinned here instead — fit invariants (orthonormality,
variance ordering, eigenvalue/variance agreement, numpy cross-check) and
the partitioning-determinism guarantee the integer moment accumulation
buys (the 32-vs-7 harness also covers it, this is the unit-level pin).
"""

from __future__ import annotations

import numpy as np
import pytest

from my_favorite_etl_pipeline_spark.operators.projection import (
    covariance_int_exact,
    pca_components,
    project,
)
from my_favorite_etl_pipeline_spark.sources.tables import load

DIM = 64


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def local(embs):
    pdf = embs.orderBy("vec_id").toPandas()  # sf0.001 fixture: tiny, test-only
    return np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


def test_components_orthonormal_and_variance_descending(embs):
    comps, lams = pca_components(embs, dim=DIM, n_components=4)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    assert all(lams[i] >= lams[i + 1] - 1e-12 for i in range(len(lams) - 1))
    assert lams[-1] > 0


def test_matches_local_numpy_pca(embs, local):
    """The distributed integer-moment covariance must agree with plain
    numpy covariance to quantization precision (scale 1e4 → cov entries
    good to ~1e-4), and the top eigenvalues must match."""
    n, s, m = covariance_int_exact(embs, dim=DIM, scale=10_000)
    assert n == len(local)
    mu = s / (n * 10_000.0)
    cov = m / (n * 1e8) - np.outer(mu, mu)
    ref_cov = np.cov(local, rowvar=False, bias=True)
    assert np.abs(cov - ref_cov).max() < 1e-4
    lams = pca_components(embs, dim=DIM, n_components=4)[1]
    ref = np.sort(np.linalg.eigvalsh(ref_cov))[::-1][:4]
    assert np.allclose(lams, ref, atol=1e-3)


def test_projection_variance_matches_eigenvalues(embs, local):
    comps, lams = pca_components(embs, dim=DIM, n_components=4)
    rows = project(embs, comps).select("pc1", "pc2", "pc3", "pc4").collect()
    p = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in rows])
    # projections were rounded to 4 decimals; variance agrees to ~1e-3
    assert np.allclose(p.var(axis=0, ddof=0), lams, atol=2e-3)


def test_deterministic_under_repartitioning(embs):
    """Integer moments are order/partitioning-invariant: identical results
    bit-for-bit whether accumulated over 1 or 13 partitions."""
    a = covariance_int_exact(embs.coalesce(1), dim=DIM)
    b = covariance_int_exact(embs.repartition(13), dim=DIM)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])
