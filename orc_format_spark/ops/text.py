"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting. Quality/token metrics are pure built-in-function
column expressions (JVM, whole-stage codegen — SQL-oracle-checkable);
language-ID and fingerprints are vectorized pandas UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")


def quality_metrics(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic integer quality metrics, SQL-expressible for the oracle:
    chars, non-whitespace chars, whitespace-token count, digit count,
    punctuation count, ascii-letter count."""
    t = F.col(text_col)
    non_ws = F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        non_ws.alias("n_non_ws"),
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
         .otherwise(F.size(F.split(F.trim(t), r"\s+"))).alias("n_tokens"),
        F.length(F.regexp_replace(t, r"[^0-9]", "")).alias("n_digits"),
        F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).alias("n_punct"),
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).alias("n_ascii_alpha"),
    )


def stopword_ratio(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Stopword token count (quality heuristic), built-ins only."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    return df.select(F.col(id_col),
                     F.size(toks).alias("n_tokens"),
                     n_stop.alias("n_distinct_stopwords"))


# character n-gram profiles for a tiny deterministic language-ID heuristic
_LANG_PROFILES = {
    "en": (" th", "the", " an", "and", "ing", " of", "ion", "ed "),
    "de": ("der", "ein", "ich", "sch", " de", "und", "die", "en "),
    "fr": (" de", "es ", "le ", "ent", " le", "la ", "que", "ait"),
    "es": (" de", "os ", " la", "que", "el ", "ión", "ado", "as "),
}


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """n-gram-overlap language ID ('und' when nothing matches). Vectorized
    pandas UDF (per-batch numpy substring counting)."""
    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            langs = []
            for t in pdf[text_col]:
                s = f" {t.lower()} "
                scores = {lang: sum(s.count(g) for g in grams)
                          for lang, grams in _LANG_PROFILES.items()}
                best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
                langs.append(best[0] if best[1] > 0 else "und")
            yield pd.DataFrame({id_col: pdf[id_col], "lang_pred": langs})

    return df.select(id_col, text_col).mapInPandas(
        infer, schema=f"{id_col} long, lang_pred string")


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash per
    window (robust to small edits), as one int64 per doc. Vectorized numpy."""
    mod = np.uint64((1 << 61) - 1)

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                if len(b) < window:
                    h = int((b.astype(np.uint64)
                             * np.uint64(1_000_003) ** np.arange(len(b), dtype=np.uint64)
                             % mod).sum() % mod) if len(b) else 0
                    out.append(h - (1 << 62))
                    continue
                win = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
                pows = np.array([pow(1_000_003, window - 1 - i, int(mod))
                                 for i in range(window)], dtype=np.uint64)
                hashes = (win * pows).sum(axis=1) % mod
                out.append(int(hashes.min()) - (1 << 62))
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprint": out})

    return df.select(id_col, text_col).mapInPandas(
        fp, schema=f"{id_col} long, fingerprint long")
