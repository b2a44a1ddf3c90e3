"""Stripe-level encode/decode over pandas DataFrames (one stripe = one
``applyInPandas`` group; the Spark glue lives in :mod:`.pipeline`).

A stripe is the engine's unit of parallelism — the analog of the reference's
ORC stripe (StripeInformation, /root/reference/src/proto.rs:206-217), stored
as ROWS of a stripes table: one row per (stripe, column) with the column's
streams as binary fields (SURVEY.md §1.5). Nullability is structural, like
the reference's Present stream (boolean RLE over the validity bitmap; Data
holds only non-null values — tests/it/deserialize.rs:13-25).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from . import selector
from .codecs import boolean_rle, deflate, floats

# stripe-column row fields (keep in sync with pipeline.STRIPE_SCHEMA)
STRIPE_COLUMNS = [
    "stripe_id", "bucket", "n_rows", "col_name", "col_kind", "codec",
    "compression", "present", "data", "length", "dict_data", "extra",
    "n_nulls", "raw_bytes", "enc_bytes", "min_val", "max_val", "ndv",
    "checksum",
]

INT_KINDS = {"int8": np.int64, "int16": np.int64, "int32": np.int64, "int64": np.int64}


def spark_kind(dtype_str: str) -> str:
    """Map a Spark simpleString dtype to our column kind."""
    m = {
        "tinyint": "int8", "smallint": "int16", "int": "int32", "bigint": "int64",
        "float": "float32", "double": "float64", "boolean": "bool",
        "string": "string", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
        "date": "date",
    }
    if dtype_str not in m:
        raise ValueError(f"unsupported column type: {dtype_str}")
    return m[dtype_str]


def _values_and_mask(series: pd.Series, kind: str):
    """Split a column into (non-null values, validity bool array)."""
    isna = series.isna().to_numpy()
    valid = ~isna
    nn = series[valid] if isna.any() else series
    if kind in INT_KINDS:
        vals = nn.to_numpy(dtype=np.int64, na_value=0) if len(nn) else np.zeros(0, np.int64)
    elif kind == "timestamp":
        v = pd.to_datetime(nn)
        vals = v.to_numpy(dtype="datetime64[us]").astype(np.int64)
    elif kind == "date":
        vals = pd.to_datetime(nn).to_numpy(dtype="datetime64[D]").astype(np.int64)
    elif kind in ("float32", "float64"):
        vals = nn.to_numpy(dtype=np.float32 if kind == "float32" else np.float64)
    elif kind == "bool":
        vals = nn.to_numpy(dtype=bool)
    elif kind == "string":
        vals = nn.astype(object).to_numpy()
    else:
        raise ValueError(kind)
    return vals, valid


def _raw_nbytes(vals, kind: str) -> int:
    if kind == "string":
        return int(pa.array(vals, type=pa.large_utf8()).nbytes) if len(vals) else 0
    return int(np.asarray(vals).nbytes)


def _checksum(vals, valid: np.ndarray, kind: str) -> str:
    """crc32 over canonical value bytes + validity bitmap (lineage integrity)."""
    crc = zlib.crc32(np.packbits(valid).tobytes())
    if kind == "string":
        for s in vals:
            crc = zlib.crc32(s.encode("utf-8"), crc)
            crc = zlib.crc32(b"\x00", crc)
    else:
        crc = zlib.crc32(np.ascontiguousarray(vals).tobytes(), crc)
    return f"{crc:08x}"


def encode_column(series: pd.Series, kind: str,
                  force_codec: str | None = None) -> dict:
    """Encode one column of one stripe; returns a stripe-column row dict."""
    n = len(series)
    vals, valid = _values_and_mask(series, kind)
    n_nulls = int(n - valid.sum())
    row = {
        "col_kind": kind, "n_rows": n, "n_nulls": n_nulls,
        "present": boolean_rle.encode_bools(valid) if n_nulls else b"",
        "length": b"", "dict_data": b"", "extra": b"", "ndv": None,
        "min_val": None, "max_val": None,
    }
    if kind in INT_KINDS or kind in ("timestamp", "date"):
        codec, data, extra = selector.encode_ints(vals)
        row.update(codec=codec, data=data, extra=extra)
        if len(vals):
            row.update(min_val=str(int(vals.min())), max_val=str(int(vals.max())))
        raw = len(vals) * 8
    elif kind in ("float32", "float64"):
        data = floats.encode(vals, kind)
        row.update(codec="float_raw", data=data)
        if len(vals):
            finite = vals[np.isfinite(vals)]
            if len(finite):
                row.update(min_val=repr(float(finite.min())), max_val=repr(float(finite.max())))
        raw = len(data)
    elif kind == "bool":
        row.update(codec="bool_rle", data=boolean_rle.encode_bools(vals))
        raw = len(vals)
    elif kind == "string":
        enc = selector.encode_strings(vals, force_codec=force_codec)
        row.update(codec=enc["codec"], data=enc["data"], length=enc["length"],
                   dict_data=enc["dict_data"], extra=enc["extra"], ndv=enc["ndv"])
        raw = _raw_nbytes(vals, kind)
        if len(vals):
            row.update(min_val=str(min(vals))[:64], max_val=str(max(vals))[:64])
    else:
        raise ValueError(kind)
    # generic block-compression layer on the big streams (is-original escape
    # framing, reference decompress/mod.rs:9-17); selector keeps it only if
    # it shrinks
    comp, cdata = selector.maybe_zlib(row["data"])
    comp2, cdict = selector.maybe_zlib(row["dict_data"])
    row["compression"] = f"{comp}|{comp2}"
    row["data"], row["dict_data"] = cdata, cdict
    row["raw_bytes"] = raw
    row["enc_bytes"] = sum(len(row[k]) for k in ("present", "data", "length", "dict_data", "extra"))
    row["checksum"] = _checksum(vals, valid, kind)
    return row


def decode_column(row: dict) -> pa.Array | np.ndarray:
    """Decode one stripe-column row back to a full-length array with nulls."""
    n = int(row["n_rows"])
    n_nulls = int(row["n_nulls"])
    kind = row["col_kind"]
    comp, comp2 = (row["compression"] or "none|none").split("|")
    data = deflate.decompress(row["data"]) if comp == "zlib" else row["data"]
    dict_data = deflate.decompress(row["dict_data"]) if comp2 == "zlib" else row["dict_data"]
    valid = (boolean_rle.decode_bools(row["present"], n) if n_nulls
             else np.ones(n, dtype=bool))
    n_valid = n - n_nulls
    codec = row["codec"]

    if kind in INT_KINDS or kind in ("timestamp", "date"):
        vals = selector.decode_ints(codec, data, row["extra"], n_valid)
    elif kind in ("float32", "float64"):
        vals = floats.decode(data, n_valid, kind)
    elif kind == "bool":
        vals = boolean_rle.decode_bools(data, n_valid)
    elif kind == "string":
        arr = selector.decode_strings(codec, data, row["length"], dict_data,
                                      row["extra"], n_valid, row["ndv"])
        if n_nulls:
            idx = np.full(n, 0, dtype=np.int64)
            idx[valid] = np.arange(n_valid)
            return arr.take(pa.array(idx, mask=~valid))
        return arr
    else:
        raise ValueError(kind)

    if not n_nulls:
        return _typed(vals, kind)
    full = np.zeros(n, dtype=vals.dtype if kind not in INT_KINDS else np.int64)
    full[valid] = vals
    return _typed_nullable(full, valid, kind)


def _typed(vals: np.ndarray, kind: str):
    if kind == "timestamp":
        return vals.astype("datetime64[us]")
    if kind == "date":
        return vals.astype("datetime64[D]").astype("datetime64[s]")
    if kind in INT_KINDS:
        return vals.astype(kind)
    return vals


def _typed_nullable(full: np.ndarray, valid: np.ndarray, kind: str):
    """Full-length array + validity -> pandas-compatible nullable column."""
    if kind == "timestamp":
        out = full.astype("datetime64[us]")
        s = pd.Series(out)
        s[~valid] = pd.NaT
        return s
    if kind == "date":
        out = full.astype("datetime64[D]").astype("datetime64[s]")
        s = pd.Series(out)
        s[~valid] = pd.NaT
        return s
    if kind in INT_KINDS:
        return pd.arrays.IntegerArray(full.astype(kind), mask=~valid)
    if kind in ("float32", "float64"):
        out = full.astype(kind)
        out[~valid] = np.nan
        return out
    if kind == "bool":
        return pd.arrays.BooleanArray(full.astype(bool), mask=~valid)
    raise ValueError(kind)


def encode_stripe(pdf: pd.DataFrame, kinds: dict[str, str], stripe_id: str,
                  bucket: int, sort_keys: list[str] | None = None,
                  force_codecs: dict[str, str] | None = None) -> pd.DataFrame:
    """Encode one stripe (one group) -> stripe-column rows DataFrame."""
    if sort_keys:
        pdf = pdf.sort_values(sort_keys, kind="mergesort", ignore_index=True)
    force_codecs = force_codecs or {}
    rows = []
    for col, kind in kinds.items():
        row = encode_column(pdf[col], kind, force_codec=force_codecs.get(col))
        row.update(stripe_id=stripe_id, bucket=bucket, col_name=col)
        rows.append(row)
    out = pd.DataFrame(rows, columns=STRIPE_COLUMNS)
    out["ndv"] = out["ndv"].astype("Int64")  # Arrow-safe nullable long
    return out


def decode_stripe(stripe_rows: pd.DataFrame, columns: list[str] | None = None) -> pd.DataFrame:
    """Decode one stripe's rows back into the original row layout."""
    by_col = {r["col_name"]: r for r in stripe_rows.to_dict("records")}
    cols = columns or list(by_col)
    out = {}
    for c in cols:
        arr = decode_column(by_col[c])
        out[c] = arr.to_pandas() if isinstance(arr, pa.Array) else arr
    return pd.DataFrame(out)
