"""LIVE cross-oracle vs the reference implementation: byte streams produced
by THIS ENGINE's encoders are decoded by the REFERENCE's OWN Rust decoder
(scripts/rust_cross_oracle include!s /root/reference/src/read/decode/*.rs
verbatim into a no-dependency binary — the sandbox has no crates.io access,
and the decoder modules only need std). Stronger than the ported golden
vectors in test_golden_vectors.py: every byte our RLEv2/boolean encoders
emit round-trips through the reference code itself.

Scope notes (reference limitations, not ours):
- PatchedBase and non-aligned direct widths are `todo!()` in the reference
  (rle_v2.rs:34,56,459) — the vectors here avoid outlier bait, and our
  encoder only emits aligned widths by design (SURVEY §1.4 quirk list).
- The reference's BooleanIter mis-decodes MULTI-GROUP literal streams: its
  literals buffer is a fixed [u8; 255] whose byte_position is never reset
  between runs (boolean_rle.rs:117-137 — `bytes.len() == 1` is always
  false), so a literals->literals or run->literals boundary reads stale /
  out-of-range bytes (observed: index panic). The boolean vectors here stay
  within what the reference CAN decode (pure runs; one literal group); our
  own decoder handles arbitrary mixes (tests/test_codecs_roundtrip.py).
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from orc_format_spark.codecs import boolean_rle, rle_v2

HARNESS = os.path.join(os.path.dirname(__file__), "..",
                       "scripts", "rust_cross_oracle")
BIN = os.path.join(HARNESS, "target", "release", "rust-cross-oracle")


@pytest.fixture(scope="module")
def harness():
    if shutil.which("cargo") is None:
        pytest.skip("cargo not available")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference source not present")
    if not os.path.exists(BIN):
        r = subprocess.run(["cargo", "build", "--release", "--offline"],
                           cwd=HARNESS, capture_output=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"harness build failed: {r.stderr.decode()[-200:]}")
    return BIN


def ref_decode(binpath, mode: str, n: int, payload: bytes) -> list[int]:
    inp = bytes([ord(mode)]) + struct.pack("<Q", n) + payload
    r = subprocess.run([binpath], input=inp, capture_output=True, timeout=120)
    out = r.stdout.decode()
    assert r.returncode == 0 and not out.startswith("ERR"), (
        out[:200], r.stderr.decode()[-300:])
    return [int(x) for x in out.split()]


def test_reference_decodes_our_rle_v2(harness):
    rng = np.random.default_rng(0)
    cases = {
        "runs": np.repeat(rng.integers(-50, 50, 300),
                          rng.integers(1, 40, 300)).astype(np.int64),
        "monotonic_ts": (np.cumsum(rng.integers(1, 300, 5000))
                         * 1_000_000).astype(np.int64),
        "direct_small": rng.integers(-1000, 1000, 4000).astype(np.int64),
        "direct_wide": rng.integers(-2**60, 2**60, 2000).astype(np.int64),
        "short_repeat": np.array([7] * 7, dtype=np.int64),
        "descending": np.arange(3000, 0, -1).astype(np.int64),
        "extremes": np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max,
                              0, -1, 1] * 100, dtype=np.int64),
        "single": np.array([-42], dtype=np.int64),
        "frame_boundary": np.arange(513, dtype=np.int64),
    }
    for name, v in cases.items():
        enc = rle_v2.encode(v, signed=True)
        assert ref_decode(harness, "s", len(v), enc) == v.tolist(), name
        u = np.abs(v).astype(np.uint64) * np.uint64(3)
        encu = rle_v2.encode(u, signed=False)
        got = [x % 2**64 for x in ref_decode(harness, "u", len(u), encu)]
        assert got == u.tolist(), name + "_unsigned"


def test_reference_decodes_our_boolean_rle(harness):
    rng = np.random.default_rng(1)
    cases = {
        "all_true": np.ones(20_000, dtype=bool),
        "all_false": np.zeros(8_191, dtype=bool),
        "alternating": np.tile([True, False], 5_000),   # 0xAA run bytes
        "one_literal_group": rng.random(1_000) < 0.5,   # <=128 packed bytes
    }
    for name, bits in cases.items():
        enc = boolean_rle.encode_bools(bits)
        got = ref_decode(harness, "b", len(bits), enc)
        assert got == bits.astype(int).tolist(), name
