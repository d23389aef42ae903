"""Distributed PCA for embedding columns (SURVEY.md §2.9 X3/X4 support:
dimensionality reduction ahead of clustering / dedup / ANN — the "train a
tiny linear model on an aggregate, apply it map-side" pattern, same shape
as the k-means and PQ codebook training in operators.similarity).

No reference citation exists — the reference has no embedding surface; the
citation is BASELINE.json's LLM-data mandate. Method: plain covariance PCA
(Pearson 1901; the standard preprocessing step in SemDeDup/D4-style
curation pipelines, e.g. Abbas et al. 2023 reduce OPT embeddings with PCA
before clustering).

Scale shape at 100 TB:

- The ONLY full-data pass is one partial-aggregate job: each Arrow batch
  contributes integer-quantized sums (n, Σx, Σx·xᵀ) via ``mapInPandas``;
  partials are summed element-wise by position (a dim²-row hash agg, i.e.
  model-sized, NOT data-sized) and only the final dim² scalars reach the
  driver — the treeAggregate shape MLlib's RowMatrix uses, with a bounded
  O(d²) collect (same contract as the k-means centroid collect in
  similarity.py).
- The eigendecomposition runs on the driver on a d×d matrix — d is the
  embedding width (64 here), so this is microseconds and independent of
  corpus size.
- Projection is MAP-ONLY: components are broadcast as literal arrays and
  each score is a zip_with/aggregate dot product inside whole-stage
  codegen. No shuffle, no Python in the apply path.

Determinism contract (the shuffle-partitions 32-vs-7 harness): float
partial sums would change with partition boundaries, so quantities are
quantized to integers (``scale`` = 1e4) BEFORE accumulation — int64 sums
are bit-identical under any grouping/order, so the covariance, the
eigenvectors, and every projected value are reproducible to the last bit
regardless of partitioning. Overflow envelope: |x| ≤ 1 ⇒ each product
≤ scale² = 1e8; int64 holds ≥ 9e18, so ~9e10 rows per (i,j) cell before
overflow — at larger corpora raise to a two-level (per-shard, then
merged) accumulation or decimal(38,0) sums.

Eigenvector sign is fixed by making the largest-|coordinate| entry
positive (the conventional tie-break), so re-runs can't flip a column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_int_exact(
    embs: DataFrame, dim: int, vec_col: str = "embedding", scale: int = 10_000
) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → exact integer moment sums ``(n, Σq, Σq·qᵀ)``
    where ``q = round(x·scale)``. Partials per Arrow batch, element-wise
    summed by position JVM-side; only d+d²+1 scalars are collected."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.rint(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "pos": np.arange(1 + dim + dim * dim, dtype=np.int64),
                    "v": np.concatenate(
                        [[len(x)], x.sum(axis=0), (x.T @ x).ravel()]
                    ),
                }
            )

    sums = (
        embs.select(vec_col)
        .mapInPandas(partial, schema="pos long, v long")
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .orderBy("pos")
        .collect()  # O(d²) model-sized rows (4161 for d=64), never data-sized
    )
    flat = np.zeros(1 + dim + dim * dim, dtype=np.int64)
    for r in sums:
        flat[r["pos"]] = r["v"]
    n = int(flat[0])
    return n, flat[1 : 1 + dim], flat[1 + dim :].reshape(dim, dim)


def pca_components(
    embs: DataFrame, dim: int, n_components: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA: returns ``(components [q×d], eigenvalues [q])``, variance-
    descending, sign-fixed. Driver work is a d×d eigh — corpus-independent."""
    scale = 10_000
    n, s, m = covariance_int_exact(embs, dim, vec_col, scale)
    mu = s.astype(np.float64) / (n * scale)
    cov = m.astype(np.float64) / (n * scale * scale) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps, lams = evecs[:, order].T, evals[order]
    for c in comps:  # sign convention: largest-|coord| entry positive
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, lams


def project(
    embs: DataFrame, components: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Map-only projection: one codegen dot product per component against a
    broadcast literal array; emits ``pc1..pcq`` rounded to 4 decimals."""
    cols = []
    for k, comp in enumerate(components, start=1):
        lit = F.array(*[F.lit(float(v)) for v in comp])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cols.append(F.round(dot, 4).alias(f"pc{k}"))
    return embs.select("*", *cols)
