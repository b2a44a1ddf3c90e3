"""Deduplication operators over a documents table.

Scale notes (100 TB design point):
  - exact dedup is a hash groupBy — one shuffle on the hash, map-side
    partial aggregation free via Catalyst;
  - MinHash-LSH: per-doc signatures are computed in a vectorized pandas UDF
    (no shuffle), then band buckets explode and the candidate join shuffles
    ONLY on (band, bucket-hash) — pairs never materialize globally;
  - verification (exact Jaccard / cosine) runs only on candidate pairs, a
    tiny fraction of the corpus;
  - SimHash is signature-only (64-bit), dedup via self-join on the
    signature (or banded Hamming buckets).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic minhash parameters
_MERSENNE = (1 << 61) - 1


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full-avalanche 64-bit mixing, vectorized."""
    z = h.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per distinct text (hash groupBy; one shuffle)."""
    return (df.groupBy(text_col)
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies")))


def _shingle_hashes(texts: pd.Series, k: int) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit k-shingle hashes (vectorized per doc)."""
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        # polynomial rolling hash mod 2^61-1 over byte windows
        pows = np.array([pow(1_000_003, k - 1 - i, _MERSENNE) for i in range(k)],
                        dtype=np.uint64)
        h = (win * pows).sum(axis=1) % np.uint64(_MERSENNE)
        out.append(np.unique(h))
    return out


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 64,
                       shingle_k: int = 5, seed: int = 42) -> DataFrame:
    """doc -> array<long> of n_hashes minhash values (vectorized UDF)."""
    a, b = _minhash_params(n_hashes, seed)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for hashes in _shingle_hashes(pdf[text_col], shingle_k):
                # (a*x + b) mod p, min over shingles, per hash function
                hx = (hashes[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append(hx.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(
        compute, schema=f"{id_col} long, signature array<long>")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      seed: int = 42) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH (shuffle on band buckets
    only). Returns (id_a, id_b, n_shared_bands), id_a < id_b."""
    rows = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = (sigs.select(id_col, "signature", band_idx)
              .select(id_col, "band",
                      F.xxhash64(F.slice("signature",
                                         F.col("band") * rows + 1, rows),
                                 F.col("band")).alias("bucket")))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right, ["band", "bucket"])
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("n_shared_bands")))


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_k: int = 5,
                   threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (broadcast-friendly)."""
    docs = df.select(F.col(id_col), F.col(text_col))
    joined = (pairs
              .join(docs.withColumnsRenamed({id_col: "id_a", text_col: "text_a"}), "id_a")
              .join(docs.withColumnsRenamed({id_col: "id_b", text_col: "text_b"}), "id_b"))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ja = []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                ha = _shingle_hashes(pd.Series([ta]), shingle_k)[0]
                hb = _shingle_hashes(pd.Series([tb]), shingle_k)[0]
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                union = len(ha) + len(hb) - inter
                ja.append(inter / union if union else 1.0)
            yield pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"],
                                "jaccard": ja})

    out = joined.mapInPandas(verify, schema="id_a long, id_b long, jaccard double")
    return out.where(F.col("jaccard") >= threshold)


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", shingle_k: int = 4,
                       seed: int = 42) -> DataFrame:
    """64-bit SimHash per doc (vectorized: popcount-weighted bit voting)."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for hashes in _shingle_hashes(pdf[text_col], shingle_k):
                # spread the 61-bit rolling hashes over 64 bits (full avalanche)
                h64 = _mix64(hashes)
                bits = (h64[:, None] >> bit_idx) & np.uint64(1)
                votes = bits.sum(axis=0) * 2 - len(h64)  # +1/-1 voting
                sig = int(((votes > 0).astype(np.uint64) << bit_idx).sum())
                out.append(sig - (1 << 63))  # store as signed long
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return df.select(id_col, text_col).mapInPandas(
        compute, schema=f"{id_col} long, simhash long")


def embedding_cosine_dups(emb: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.95,
                          n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-bucketed by random
    hyperplane signs so the self-join shuffles per bucket, not all-pairs."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy())
            norm = np.linalg.norm(m, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            m = m / norm
            signs = (m @ planes.T) > 0
            bucket = (signs.astype(np.uint64)
                      << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "bucket": bucket.astype(np.int64),
                                "unit": list(m.astype(np.float64))})

    b = emb.select(id_col, vec_col).mapInPandas(
        bucketize, schema=f"{id_col} long, bucket long, unit array<double>")
    left, right = b.alias("l"), b.alias("r")
    pairs = (left.join(right, "bucket")
             .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"),
                     F.aggregate(F.zip_with("l.unit", "r.unit",
                                            lambda x, y: x * y),
                                 F.lit(0.0), lambda acc, x: acc + x)
                     .alias("cosine")))
    return pairs.where(F.col("cosine") >= threshold).dropDuplicates(["id_a", "id_b"])
