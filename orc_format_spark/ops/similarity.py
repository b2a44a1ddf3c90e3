"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — JVM-side only (``zip_with`` +
``aggregate``), no Python in the hot path, so Catalyst/Tungsten codegen the
whole scan. Scale path: LSH-bucketed (random hyperplanes) probing that
touches only matching buckets — at 100 TB the bucket join replaces the full
scan, trading recall for a ~2^planes fan-in reduction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_expr(vec_col: str, query: list[float]):
    """cosine(vec, query) as a pure Column expression (double math)."""
    q = [float(x) for x in query]
    qnorm = float(np.linalg.norm(q)) or 1.0
    qarr = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qarr, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    vnorm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return dot / (vnorm * F.lit(qnorm))


def brute_force_topk(emb: DataFrame, query: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: one scan, a partial top-k per partition, then a
    single-reducer merge of k*partitions candidates (orderBy+limit lets
    Spark's TakeOrderedAndProject do exactly that)."""
    return (emb.select(id_col, _cosine_expr(vec_col, query).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def lsh_topk(emb: DataFrame, query: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_probes: int = 3, seed: int = 42) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket the corpus once, probe the
    query's bucket plus its ``n_probes`` nearest sign-flips, exact-rank the
    survivors. Recall grows with n_probes; cost stays ~(probes/2^planes)."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    q = np.asarray(query, dtype=np.float64)
    margins = planes @ q
    qbucket = int(((margins > 0).astype(np.uint64)
                   << np.arange(n_planes, dtype=np.uint64)).sum())
    # probe buckets: flip the lowest-|margin| planes (most uncertain signs)
    flip_order = np.argsort(np.abs(margins))
    probe = [qbucket] + [qbucket ^ (1 << int(i)) for i in flip_order[:n_probes]]

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy())
            signs = (m @ planes.T) > 0
            bucket = (signs.astype(np.uint64)
                      << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["bucket"] = bucket.astype(np.int64)
            yield out

    schema = f"{id_col} long, {vec_col} array<float>, bucket long"
    bucketed = emb.select(id_col, vec_col).mapInPandas(bucketize, schema=schema)
    cand = bucketed.where(F.col("bucket").isin(probe))
    return (cand.select(id_col, _cosine_expr(vec_col, query).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))
