"""Embedding-matrix operators: per-dimension statistics and PCA
projection/whitening — the dimensionality-reduction step a large-scale
embedding pipeline runs before ANN indexing (smaller vectors, decorrelated
dimensions; OPQ/IVF preprocessing in every production vector store). No
reference counterpart (/root/reference has no vector data).

Scale shape (100 TB of vectors):

- `dim_stats` is ONE aggregate pass: posexplode to (dim, value) and a
  64-group integer-snapped sum — map-side combined, exact in any engine.
- `covariance_stats` is the treeAggregate shape on Arrow: each partition's
  batches fold into ONE (count, sum-vector, X^T X) partial via numpy GEMM
  (mapInPandas — never per-row Python), the ≤#partitions partial rows
  posexplode to (index, value) and sum per index. Driver sees only the
  d×d matrix (64×64 doubles), never data.
- `pca_project` broadcasts the d×k component matrix inside the closure and
  projects each Arrow batch with one GEMM — no shuffle of the corpus; the
  eigendecomposition itself is driver-side numpy on the d×d covariance
  (d = 64: trivially driver-sized, the same boundary the IVF k-means
  trainer uses for its centroid stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dim_stats", "covariance_stats", "pca_components", "pca_project"]


def dim_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(dim, n, sum_micros, sumsq_micros2, min_v, max_v) per vector
    dimension — the health profile of an embedding column (dead dims, scale
    drift, clipped values). Sums are integer-snapped per VALUE (micros)
    before aggregation, so the result is exact and order-independent —
    replayable bit-for-bit by a SQL oracle. One posexplode + one 64-group
    aggregate with map-side combine; no shuffle of whole vectors."""
    v_micros = F.floor(F.col("v").cast("double") * 1e6 + F.lit(0.5)).cast("long")
    return (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .select("dim", "v", v_micros.alias("vu"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vu").alias("sum_micros"),
            F.sum(F.col("vu") * F.col("vu")).alias("sumsq_micros2"),
            # cast: array<float> elements min/max as double, matching the
            # oracle's float64 frame (float32→double is exact)
            F.min(F.col("v").cast("double")).alias("min_v"),
            F.max(F.col("v").cast("double")).alias("max_v"),
        )
    )


def covariance_stats(df: DataFrame, vec_col: str = "embedding", dim: int = 64):
    """(n, mean, cov) of the embedding matrix as driver-side numpy arrays,
    computed distributed: per-partition (count, Σx, ΣxᵀX) partials via one
    numpy GEMM per Arrow batch, reduced by an index-keyed sum — the
    treeAggregate shape; the driver materializes only d + d² doubles."""
    import numpy as np
    import pandas as pd

    part_schema = "idx int, val double"

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        xtx = np.zeros((dim, dim))
        for pdf in batches:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(X) == 0:
                continue
            n += X.shape[0]
            s += X.sum(axis=0)
            xtx += X.T @ X
        flat = np.concatenate(([float(n)], s, xtx.ravel()))
        yield pd.DataFrame({"idx": np.arange(flat.shape[0]), "val": flat})

    summed = (
        df.select(vec_col)
        .mapInPandas(partials, part_schema)
        .groupBy("idx")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    flat = np.zeros(1 + dim + dim * dim)
    for r in summed:
        flat[r.idx] = r.val
    n = int(flat[0])
    if n < 2:
        raise ValueError(f"covariance needs >= 2 vectors, got {n}")
    s = flat[1 : 1 + dim]
    xtx = flat[1 + dim :].reshape(dim, dim)
    mean = s / n
    cov = (xtx - np.outer(mean, s)) / (n - 1)
    return n, mean, cov


def pca_components(
    df: DataFrame, k: int, vec_col: str = "embedding", dim: int = 64, whiten: bool = False
):
    """(mean, components) for a k-dim PCA of the embedding column: top-k
    eigenvectors of the distributed covariance, scaled to unit variance
    when ``whiten``. Sign convention: each component's largest-|coeff|
    entry is made positive, so results are deterministic across BLAS
    builds."""
    import numpy as np

    _n, mean, cov = covariance_stats(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]  # d × k
    eigs = np.maximum(vals[order], 0.0)
    for j in range(comps.shape[1]):
        pivot = np.argmax(np.abs(comps[:, j]))
        if comps[pivot, j] < 0:
            comps[:, j] = -comps[:, j]
    if whiten:
        comps = comps / np.sqrt(np.maximum(eigs, 1e-12))
    return mean, comps


def pca_project(
    df: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """(id, out_col) with each vector centered and projected onto the
    component matrix — one numpy GEMM per Arrow batch, components riding in
    the closure (d×k doubles, broadcast-sized by construction); the corpus
    is never shuffled and never leaves its partitions."""
    import numpy as np
    import pandas as pd

    mean = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)
    out_schema = f"{id_col} long, {out_col} array<double>"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            P = (X - mean) @ comps
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: list(P)})

    return df.select(id_col, vec_col).mapInPandas(run, out_schema)
