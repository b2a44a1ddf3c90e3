"""Byte-exactness pins for the round-6 FSST kernel vectorizations.

``build_table`` replaced a per-token Python dict-of-slices gains pass with a
(key, len) numpy grouping, and ``_token_starts`` replaced the one-append-per-
token greedy walk with a block-parallel two-phase walk. Both must reproduce
the reference (loop) implementations EXACTLY — the table defines the encoded
bytes, and re-encoding a stripe must keep producing identical bytes for the
lineage checksum/resume contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from orc_format_spark.codecs import fsst


def _reference_build_table(data: np.ndarray,
                           sample: int = fsst._SAMPLE) -> fsst.SymbolTable:
    """The pre-round-6 dict-of-slices implementation, verbatim."""
    if len(data) > sample:
        n_chunks = 8
        chunk = sample // n_chunks
        stride = len(data) // n_chunks
        data = np.concatenate(
            [data[i * stride:i * stride + chunk] for i in range(n_chunks)])
    blob = data.tobytes()
    table = fsst.SymbolTable([])
    for _ in range(fsst._ITERATIONS):
        starts, lens = fsst._emitted_tokens(data, table)
        st = starts.tolist()
        ln = lens.tolist()
        ends = (starts + lens).tolist()
        cat_ok = (np.concatenate([lens[:-1] + lens[1:], [99]])
                  <= fsst.MAX_LEN).tolist()
        gains: dict[bytes, int] = {}
        get = gains.get
        for j in range(len(st)):
            s, e = st[j], ends[j]
            sym = blob[s:e]
            gains[sym] = get(sym, 0) + ln[j]
            if cat_ok[j]:
                e2 = ends[j + 1]
                cat = blob[s:e2]
                gains[cat] = get(cat, 0) + (e2 - s)
        scored = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        table = fsst.SymbolTable([s for s, _ in scored[:fsst.MAX_SYMBOLS]])
    return table


def _reference_token_starts(best_len: np.ndarray) -> np.ndarray:
    n = len(best_len)
    steps = np.maximum(best_len, 1).tolist()
    starts = []
    append = starts.append
    i = 0
    while i < n:
        append(i)
        i += steps[i]
    return np.array(starts, dtype=np.int64)


def _corpora():
    rng = np.random.default_rng(7)
    texts = [
        b"",
        b"a",
        b"the quick brown fox jumps over the lazy dog " * 400,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),  # high entropy
        b"\x00\x01\x00the\x00 and\x00" * 900,               # embedded NULs
        b"aaaaaaa" * 3000,                                  # degenerate runs
        ("tok001 tok002 the and model agent tool call data spark "
         "stripe codec ol\xc3\xa9 m\xc3\xbcller \xe6\x95\xb0"
         .encode("latin-1") * 500),
    ]
    # random word soup close to the bench shape, > 2 blocks long
    words = [f"tok{i:03d}".encode() for i in range(50)] + [b"the", b"and"]
    soup = b" ".join(words[int(i)] for i in
                     rng.integers(0, len(words), 6000))
    texts.append(soup)
    return texts


@pytest.mark.parametrize("idx", range(8))
def test_build_table_matches_reference(idx):
    blob = _corpora()[idx]
    data = np.frombuffer(blob, dtype=np.uint8)
    got = fsst.build_table(data)
    want = _reference_build_table(data)
    assert got.symbols == want.symbols


@pytest.mark.parametrize("idx", range(8))
def test_token_starts_matches_reference(idx):
    blob = _corpora()[idx]
    data = np.frombuffer(blob, dtype=np.uint8)
    table = fsst.build_table(data)
    best_len, _ = table.match_all(data)
    got = fsst._token_starts(best_len)
    want = _reference_token_starts(best_len)
    np.testing.assert_array_equal(got, want)


def test_token_starts_synthetic_step_patterns():
    """Walks crossing many 4096-byte block boundaries at every offset."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(3 * 4096, 6 * 4096))
        best_len = rng.integers(0, 9, n).astype(np.int8)
        got = fsst._token_starts(best_len)
        want = _reference_token_starts(best_len)
        np.testing.assert_array_equal(got, want)


def test_encode_decode_roundtrip_after_vectorization():
    blob = (b"the quick brown fox jumps over the lazy dog " * 300
            + bytes(np.random.default_rng(3).integers(0, 256, 2000,
                                                      dtype=np.uint8)))
    enc = fsst.encode(blob)
    assert fsst.decode(np.frombuffer(enc, dtype=np.uint8), len(blob)) == blob


def _reference_match_all(data: np.ndarray, table: fsst.SymbolTable):
    """Brute-force longest-match reference (no prescreens, no hashing)."""
    n = len(data)
    blob = data.tobytes()
    by_len = {}
    for code, s in enumerate(table.symbols):
        by_len.setdefault(len(s), {})[s] = code
    best_len = np.zeros(n, dtype=np.int8)
    best_code = np.zeros(n, dtype=np.uint8)
    for i in range(n):
        for L in range(min(fsst.MAX_LEN, n - i), 0, -1):
            code = by_len.get(L, {}).get(blob[i:i + L])
            if code is not None:
                best_len[i] = L
                best_code[i] = code
                break
    return best_len, best_code


@pytest.mark.parametrize("idx", range(8))
def test_match_all_matches_bruteforce(idx):
    blob = _corpora()[idx]
    data = np.frombuffer(blob, dtype=np.uint8)[:4000]  # brute force is O(n*8)
    table = fsst.build_table(data)
    got_len, got_code = table.match_all(data)
    want_len, want_code = _reference_match_all(data, table)
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(got_code, want_code)


def test_match_all_bruteforce_random_tables():
    """Random symbol tables (incl. shared prefixes and NULs) over random
    data — exercises both prescreen LUT stages and every lookup kind."""
    rng = np.random.default_rng(5)
    for trial in range(5):
        n_sym = int(rng.integers(1, 200))
        syms, seen = [], set()
        for _ in range(n_sym):
            L = int(rng.integers(1, 9))
            s = bytes(rng.integers(0, 8, L).astype(np.uint8))  # tiny alphabet
            if s not in seen:
                seen.add(s)
                syms.append(s)
        table = fsst.SymbolTable(syms[:fsst.MAX_SYMBOLS])
        data = rng.integers(0, 8, 3000).astype(np.uint8)
        got_len, got_code = table.match_all(data)
        want_len, want_code = _reference_match_all(data, table)
        np.testing.assert_array_equal(got_len, want_len)
        np.testing.assert_array_equal(got_code, want_code)


def test_build_table_fuzz_nul_heavy_tie_breaks():
    """Adversarial fuzz for the (key, len) ordering equivalence: tiny
    alphabets INCLUDING NUL create symbols that are zero-padded prefixes of
    one another (e.g. b'a' vs b'a\\x00'), where equal padded keys make the
    length tie-break load-bearing, and small vocabularies create exact gain
    ties at the 255-symbol cut. 20 seeds, full build parity."""
    rng = np.random.default_rng(99)
    alphabets = [
        np.array([0, 1], dtype=np.uint8),
        np.array([0, 97], dtype=np.uint8),
        np.array([0, 1, 2, 32, 97], dtype=np.uint8),
    ]
    for trial in range(20):
        alpha = alphabets[trial % len(alphabets)]
        n = int(rng.integers(64, 3000))
        data = alpha[rng.integers(0, len(alpha), n)]
        got = fsst.build_table(data)
        want = _reference_build_table(data)
        assert got.symbols == want.symbols, f"trial {trial}"
