"""Pandas-level stripe encode/decode over the reference's golden column
families (FIXTURES.md §B mirrors /root/reference/write.py:5-23,83-116 and
tests/it/main.rs:26-316). Nulls exercise the Present stream exactly like the
reference's validity model (tests/it/deserialize.rs:13-25).
"""

import numpy as np
import pandas as pd
import pytest

from orc_format_spark import stripe

rng = np.random.default_rng(42)


def roundtrip(series: pd.Series, kind: str):
    row = stripe.encode_column(series, kind)
    out = stripe.decode_column(row)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    return row, pd.Series(out)


def assert_same(expected: pd.Series, got: pd.Series):
    e, g = expected.reset_index(drop=True), got.reset_index(drop=True)
    assert len(e) == len(g)
    na = e.isna()
    assert (na == g.isna()).all(), "null positions differ"
    if na.any():
        e, g = e[~na], g[~na.to_numpy()]
    if e.dtype.kind == "f":
        assert (e.to_numpy() == g.to_numpy(dtype=e.dtype)).all()
    else:
        assert (e.to_numpy() == g.to_numpy()).all()


# --- reference write.py golden families (exact literals) --------------------

FAMILIES = [
    # (name, values, kind, expected codec predicate)
    ("float_nullable", [1.0, 2.0, None, 4.0, 5.0], "float32", {"float_raw"}),
    ("bool_nullable", [True, False, None, True, False], "bool", {"bool_rle"}),
    ("str_direct", ["a", "cccccc", None, "ddd", "ee"], "string", None),
    ("str_delta_plus", ["a", "bb", None, "ccc", "ddd"], "string", None),
    ("str_delta_minus", ["ddd", "cc", None, "bb", "a"], "string", None),
    ("str_short_repeat", ["aaaaa", "bbbbb", None, "ccccc", "ddddd"], "string", None),
    ("int_short_repeated", [5, 5, None, 5, 5], "int32", {"rle_v2", "for", "for_scale"}),
    ("int_neg_short_repeated", [-5, -5, None, -5, -5], "int32", {"rle_v2", "for", "for_scale"}),
    ("int_delta", [1, 2, None, 4, 5], "int32", {"rle_v2", "for", "for_scale"}),
    ("int_neg_delta", [5, 4, None, 2, 1], "int32", {"rle_v2", "for", "for_scale"}),
    ("int_direct", [1, 6, None, 3, 2], "int32", {"rle_v2", "for", "for_scale"}),
    ("int_neg_direct", [-1, -6, None, -3, -2], "int32", {"rle_v2", "for", "for_scale"}),
    ("bigint_direct", [1, 6, None, 3, 2], "int64", {"rle_v2", "for", "for_scale"}),
    ("bigint_neg_direct", [-1, -6, None, -3, -2], "int64", {"rle_v2", "for", "for_scale"}),
    ("bigint_other", [5, -5, 1, 5, 5], "int64", {"rle_v2"}),
    ("utf8_increase", ["a", "bb", "ccc", "dddd", "eeeee"], "string", None),
    ("utf8_decrease", ["eeeee", "dddd", "ccc", "bb", "a"], "string", None),
    ("long_bool", [True] * 32, "bool", {"bool_rle"}),
    ("string_long", ["abcd", "efgh"] * 32, "string", {"str_dict", "str_direct"}),
    ("string_dict", ["abc", "efgh"] * 32, "string", {"str_dict"}),
    ("string_long_long", ["abcd", "efgh"] * 5000, "string", {"str_dict"}),
]


@pytest.mark.parametrize("name,values,kind,codecs", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_reference_golden_family(name, values, kind, codecs):
    s = pd.Series(values, dtype="object" if None in values or kind == "string" else None)
    row, got = roundtrip(s, kind)
    assert_same(pd.Series(values), got)
    if codecs:
        assert row["codec"] in codecs, f"{name}: {row['codec']} not in {codecs}"
    if None in values:
        assert row["n_nulls"] == sum(v is None for v in values)
        assert len(row["present"]) > 0, "Present stream required with nulls"


def test_f32_long_long():
    # write.py:112-116 — 10^6 random f32 values
    vals = rng.random(1_000_000).astype(np.float32)
    row, got = roundtrip(pd.Series(vals), "float32")
    assert (got.to_numpy(dtype=np.float32) == vals).all()


def test_timestamp_roundtrip_microsecond_precision():
    us = 1_735_689_600_000_000 + np.cumsum(rng.integers(1, 300, 5000)) * 1_000_000
    us[::577] += 7  # sub-second offsets must survive exactly
    s = pd.Series(us.astype("datetime64[us]"))
    row, got = roundtrip(s, "timestamp")
    assert (got.to_numpy().astype("datetime64[us]") == s.to_numpy()).all()
    assert row["codec"] in ("rle_v2", "for", "for_scale")


def test_timestamp_with_nulls():
    us = (1_735_689_600_000_000 + np.arange(100) * 1_000_000).astype("datetime64[us]")
    s = pd.Series(us)
    s[s.index % 7 == 0] = pd.NaT
    row, got = roundtrip(s, "timestamp")
    assert (got.isna() == s.isna()).all()
    assert (got.dropna().to_numpy().astype("datetime64[us]")
            == s.dropna().to_numpy()).all()


def test_all_null_column():
    s = pd.Series([None] * 100, dtype="object")
    row, got = roundtrip(s, "string")
    assert row["n_nulls"] == 100
    assert got.isna().all()


def test_empty_stripe():
    pdf = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                        "b": pd.Series([], dtype="object")})
    enc = stripe.encode_stripe(pdf, {"a": "int64", "b": "string"}, "s", 0)
    dec = stripe.decode_stripe(enc)
    assert len(dec) == 0 and list(dec.columns) == ["a", "b"]


def test_checksum_changes_with_data():
    r1 = stripe.encode_column(pd.Series([1, 2, 3]), "int64")
    r2 = stripe.encode_column(pd.Series([1, 2, 4]), "int64")
    assert r1["checksum"] != r2["checksum"]


def test_deterministic_encode():
    vals = pd.Series(rng.integers(0, 100, 10_000))
    a = stripe.encode_column(vals, "int64")
    b = stripe.encode_column(vals.copy(), "int64")
    assert a["data"] == b["data"] and a["checksum"] == b["checksum"]


def test_compression_beats_zlib_of_raw_baseline():
    """Compressed-size bar (BASELINE.md): encoded bytes ≤ zlib(raw columns)."""
    import zlib
    n = 50_000
    pdf = pd.DataFrame({
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": rng.choice(["user", "assistant", "system", "tool"], n),
        "ts": (1_735_689_600_000_000 + np.cumsum(rng.integers(1, 300, n))
               * 1_000_000).astype("datetime64[us]"),
    })
    kinds = {"turn_idx": "int32", "role": "string", "ts": "timestamp"}
    enc = stripe.encode_stripe(pdf, kinds, "s", 0)
    ours = int(enc["enc_bytes"].sum())
    baseline = (len(zlib.compress(pdf["turn_idx"].to_numpy().tobytes(), 6))
                + len(zlib.compress("\x00".join(pdf["role"]).encode(), 6))
                + len(zlib.compress(pdf["ts"].to_numpy().tobytes(), 6)))
    assert ours <= baseline, f"ours {ours} > zlib baseline {baseline}"
