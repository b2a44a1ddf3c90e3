"""Integer RLE v2 — encode + decode, numpy-vectorized.

Decode parity with the reference decoder (/root/reference/src/read/decode/rle_v2.rs):
  - header dispatch on top 2 bits: 00 ShortRepeat, 01 Direct, 10 PatchedBase,
    11 Delta (rle_v2.rs:417-477)
  - ShortRepeat: width = 1 + bits[5:3] bytes, count = 3 + bits[2:0],
    value big-endian (rle_v2.rs:13-19, 275-301)
  - Direct: 5-bit width code (aligned table), 9-bit length-1 (1..512),
    big-endian bit-packed payload (rle_v2.rs:126-157)
  - Delta: same header layout, width table with 0->0; base varint
    (zigzag for signed), delta_base signed varint; value[1] adds
    delta_base, values[2:] add unpacked unsigned deltas with the SIGN of
    delta_base (rle_v2.rs:184-272) — so delta runs are monotone.
  - Signed variants zigzag per-value (direct/short-repeat) or the base
    (delta) (rle_v2.rs:331-415, 564-625).

PatchedBase is ``todo!()`` in the reference (rle_v2.rs:459,656); implemented
here from the public ORC v1 spec: patch-list entries are packed at
``closestFixedBits(patch_gap_width + patch_width)`` — the width is derived,
not coded, so it must follow the spec's table for real-ORC interop.

ENCODER DETERMINISM (pinned by tests): input is split into fixed frames of
≤512 values; per frame, in order:
  1. all-equal  -> ShortRepeat (3..10 values) else fixed Delta (width 0)
  2. monotone (all diffs ≥0 or ≤0, first diff nonzero) -> Delta
  3. otherwise  -> Direct vs PatchedBase, whichever encodes fewer bytes
This trades a little compression for a fully vectorized, deterministic
encoder (the frame loop is O(n/512) Python iterations).
"""

from __future__ import annotations

import numpy as np

from . import bitpack, varint

FRAME = 512

# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    """Encode int64 (signed) / uint64 (unsigned) values to RLE v2 bytes."""
    if signed:
        v = np.asarray(values, dtype=np.int64)
    else:
        v = np.asarray(values, dtype=np.uint64)
    out = bytearray()
    n = len(v)
    for start in range(0, n, FRAME):
        _encode_frame(v[start:start + FRAME], signed, out)
    return bytes(out)


def _enc_domain(v: np.ndarray, signed: bool) -> np.ndarray:
    """Values as stored in direct/short-repeat payloads (zigzag if signed)."""
    return varint.zigzag_encode(v) if signed else v.astype(np.uint64, copy=False)


def _encode_frame(v: np.ndarray, signed: bool, out: bytearray) -> None:
    L = len(v)
    if L == 0:
        return
    if L == 1:
        _emit_direct(v, signed, out)
        return
    # diffs in wrap-safe int64 space
    diffs = np.diff(v.view(np.int64) if not signed else v)
    if not diffs.any():  # all equal
        if 3 <= L <= 10:
            _emit_short_repeat(v, signed, out)
        else:
            _emit_delta(v, diffs, signed, out)
        return
    nonneg = bool((diffs >= 0).all())
    nonpos = bool((diffs <= 0).all())
    if (nonneg or nonpos) and int(diffs[0]) != 0:
        _emit_delta(v, diffs, signed, out)
        return
    _emit_direct_or_patched(v, signed, out)


def _emit_short_repeat(v: np.ndarray, signed: bool, out: bytearray) -> None:
    count = len(v)  # 3..10
    value = int(_enc_domain(v[:1], signed)[0])
    nbytes = max((value.bit_length() + 7) // 8, 1)
    out.append((0b00 << 6) | ((nbytes - 1) << 3) | (count - 3))
    out += value.to_bytes(nbytes, "big")


def _emit_direct(v: np.ndarray, signed: bool, out: bytearray) -> None:
    enc = _enc_domain(v, signed)
    width = bitpack.round_width(bitpack.bits_needed(int(enc.max())))
    _emit_direct_header(len(v), width, out)
    out += bitpack.pack(enc, width)


def _emit_direct_header(length: int, width: int, out: bytearray) -> None:
    code = bitpack.WIDTH_TO_CODE[width]
    l9 = length - 1  # 9-bit length-1 (rle_v2.rs:65-69)
    out.append((0b01 << 6) | (code << 1) | (l9 >> 8))
    out.append(l9 & 0xFF)


def _emit_delta(v: np.ndarray, diffs: np.ndarray, signed: bool, out: bytearray) -> None:
    L = len(v)
    delta_base = int(diffs[0])
    mags = np.abs(diffs[1:]).astype(np.uint64)  # magnitudes, sign from delta_base
    if L > 2 and not (diffs[1:] == diffs[0]).all():
        width = bitpack.round_width(bitpack.bits_needed(int(mags.max())), delta=True)
    else:
        width = 0  # every delta equals delta_base (incl. all-equal runs)
    code = 0 if width == 0 else bitpack.WIDTH_TO_CODE[width]
    l9 = L - 1
    out.append((0b11 << 6) | (code << 1) | (l9 >> 8))
    out.append(l9 & 0xFF)
    base = int(v[0])
    out += varint.encode_signed(base) if signed else varint.encode_unsigned(base)
    out += varint.encode_signed(delta_base)
    if width > 0:
        out += bitpack.pack(mags, width)


def _emit_direct_or_patched(v: np.ndarray, signed: bool, out: bytearray) -> None:
    enc = _enc_domain(v, signed)
    L = len(v)
    w_max = bitpack.round_width(bitpack.bits_needed(int(enc.max())))
    direct_size = 2 + bitpack.packed_size(L, w_max)

    patched = _plan_patched(v, signed)
    if patched is not None and patched["size"] < direct_size:
        _emit_patched(v, patched, out)
    else:
        _emit_direct_header(L, w_max, out)
        out += bitpack.pack(enc, w_max)


def _plan_patched(v: np.ndarray, signed: bool):
    """Plan a PatchedBase run; return None when inapplicable/not smaller.

    Spec shape: base = min(v) (sign-magnitude, 1-8 bytes); reduced = v - base
    packed at width W covering ~90% of values; outliers keep their low W bits
    in the data and ship their high bits in a ≤31-entry patch list.
    """
    L = len(v)
    if L < 3:
        return None
    vi = v.astype(np.int64, copy=False) if signed else v.view(np.int64)
    base = int(vi.min())
    if not signed and base < 0:  # unsigned values ≥ 2^63: skip patched
        return None
    if abs(base) > (1 << 63) - 1 or (base < 0 and -base >= (1 << 63)):
        return None
    reduced = (vi.astype(np.int64) - base).astype(np.uint64)
    widths = bitpack.element_widths(reduced)
    w_max = int(widths.max())
    # candidate W = 90th-percentile aligned width. np.partition selects the
    # same element np.percentile(..., method="lower") would: sorted[k] with
    # k = floor(0.90 * (L-1)) — O(L) instead of a full sort + float path
    k = int(0.90 * (L - 1))
    w90 = int(np.partition(widths, k)[k])
    w90 = bitpack.round_width(w90)
    if w90 >= w_max:
        return None
    patch_mask = widths > w90
    n_patch = int(patch_mask.sum())
    if n_patch == 0 or n_patch > 31:
        return None
    positions = np.flatnonzero(patch_mask)
    raw_gaps = np.diff(positions, prepend=0)
    real_patch_vals = reduced[positions] >> np.uint64(w90)
    # gaps > 255 are split with (gap=255, patch=0) continuation entries
    gaps_list: list[int] = []
    patch_list: list[int] = []
    for g, pv in zip(raw_gaps.tolist(), real_patch_vals.tolist()):
        while g > 255:
            gaps_list.append(255)
            patch_list.append(0)
            g -= 255
        gaps_list.append(g)
        patch_list.append(pv)
    if len(gaps_list) > 31:
        return None
    gaps = np.array(gaps_list, dtype=np.uint64)
    patch_vals = np.array(patch_list, dtype=np.uint64)
    pw = bitpack.round_width(bitpack.bits_needed(int(patch_vals.max())))
    pgw = max(int(gaps.max()).bit_length(), 1)
    if pgw > 8 or pgw + pw > 64:  # combined gap+patch must fit one unit
        return None
    # spec: readers DERIVE the patch-entry width as closestFixedBits(gap+patch)
    entry_width = bitpack.closest_fixed_bits(pgw + pw)
    mag = abs(base)
    bw = max((mag.bit_length() + 1 + 7) // 8, 1)  # +1 sign bit
    if bw > 8:
        return None
    size = (4 + bw + bitpack.packed_size(L, w90)
            + bitpack.packed_size(len(gaps), entry_width))
    return {
        "size": size, "W": w90, "bw": bw, "base": base, "reduced": reduced,
        "gaps": gaps.astype(np.uint64), "patch_vals": patch_vals,
        "pw": pw, "pgw": pgw, "entry_width": entry_width,
    }


def _emit_patched(v: np.ndarray, p: dict, out: bytearray) -> None:
    L = len(v)
    W, bw, pgw, pw = p["W"], p["bw"], p["pgw"], p["pw"]
    l9 = L - 1
    out.append((0b10 << 6) | (bitpack.WIDTH_TO_CODE[W] << 1) | (l9 >> 8))
    out.append(l9 & 0xFF)
    out.append(((bw - 1) << 5) | bitpack.WIDTH_TO_CODE[pw])
    out.append(((pgw - 1) << 5) | len(p["gaps"]))
    mag = abs(p["base"])
    base_bytes = bytearray(mag.to_bytes(bw, "big"))
    if p["base"] < 0:
        base_bytes[0] |= 0x80
    out += base_bytes
    # data: low W bits of reduced values
    low = p["reduced"] & ((np.uint64(1) << np.uint64(W)) - np.uint64(1)) if W < 64 else p["reduced"]
    out += bitpack.pack(low, W)
    entries = (p["gaps"] << np.uint64(pw)) | p["patch_vals"]
    out += bitpack.pack(entries, p["entry_width"])


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(buf, n: int, signed: bool = True) -> np.ndarray:
    """Decode ``n`` values; returns int64 (signed) or uint64 (unsigned)."""
    if n == 0:
        return np.zeros(0, dtype=np.int64 if signed else np.uint64)
    parts = []
    total = 0
    pos = 0
    while total < n:
        if pos >= len(buf):
            raise ValueError(f"RLEv2 stream exhausted at {total}/{n} values")
        header = buf[pos]
        kind = header >> 6
        try:
            if kind == 0b00:
                arr, pos = _dec_short_repeat(buf, pos, signed)
            elif kind == 0b01:
                arr, pos = _dec_direct(buf, pos, signed)
            elif kind == 0b10:
                arr, pos = _dec_patched(buf, pos, signed)
            else:
                arr, pos = _dec_delta(buf, pos, signed)
        except IndexError as exc:  # clean error, never a panic (SURVEY.md §4)
            raise ValueError("truncated RLEv2 run") from exc
        parts.append(arr)
        total += len(arr)
    if total != n:
        raise ValueError(f"RLEv2 run overshoot: {total} != {n}")
    out = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return out if signed else out.astype(np.uint64, copy=False)


def _dec_short_repeat(buf, pos, signed):
    header = buf[pos]
    width = 1 + ((header & 0b00111000) >> 3)
    count = 3 + (header & 0b00000111)
    value = int.from_bytes(bytes(buf[pos + 1:pos + 1 + width]), "big")
    if signed:
        value = varint.zigzag_decode_int(value)
        return np.full(count, value, dtype=np.int64), pos + 1 + width
    return np.full(count, value, dtype=np.uint64), pos + 1 + width


def _read_len_width(buf, pos, delta):
    header = buf[pos]
    code = (header & 0b00111110) >> 1
    if delta:
        width = 0 if code == 0 else bitpack.CODE_TO_WIDTH[code]
    else:
        width = bitpack.CODE_TO_WIDTH[code]
    length = (((header & 1) << 8) | buf[pos + 1]) + 1
    return width, length, pos + 2


def _dec_direct(buf, pos, signed):
    width, length, pos = _read_len_width(buf, pos, delta=False)
    vals = bitpack.unpack(buf, width, length, offset=pos)
    pos += bitpack.packed_size(length, width)
    if signed:
        return varint.zigzag_decode(vals), pos
    return vals, pos


def _dec_delta(buf, pos, signed):
    width, length, pos = _read_len_width(buf, pos, delta=True)
    if signed:
        base, pos = varint.decode_signed(buf, pos)
    else:
        base, pos = varint.decode_unsigned(buf, pos)
    delta_base, pos = varint.decode_signed(buf, pos)
    if width > 0 and length > 2:
        mags = bitpack.unpack(buf, width, length - 2, offset=pos)
        pos += bitpack.packed_size(length - 2, width)
    else:
        mags = np.full(max(length - 2, 0), abs(delta_base), dtype=np.uint64)
    incs = np.empty(length, dtype=np.uint64)
    incs[0] = 0
    if length > 1:
        incs[1] = abs(delta_base)
        incs[2:] = mags[:length - 2]
    steps = np.cumsum(incs, dtype=np.uint64)
    b = np.uint64(base & ((1 << 64) - 1))
    vals = b + steps if delta_base >= 0 else b - steps
    if signed:
        return vals.view(np.int64).copy(), pos
    return vals, pos


def _dec_patched(buf, pos, signed):
    header = buf[pos]
    W = bitpack.CODE_TO_WIDTH[(header & 0b00111110) >> 1]
    length = (((header & 1) << 8) | buf[pos + 1]) + 1
    b2, b3 = buf[pos + 2], buf[pos + 3]
    bw = ((b2 >> 5) & 0b111) + 1
    pw = bitpack.CODE_TO_WIDTH[b2 & 0b11111]
    pgw = ((b3 >> 5) & 0b111) + 1
    pl = b3 & 0b11111
    pos += 4
    base_raw = bytes(buf[pos:pos + bw])
    neg = bool(base_raw[0] & 0x80)
    mag = int.from_bytes(bytes([base_raw[0] & 0x7F]) + base_raw[1:], "big")
    base = -mag if neg else mag
    pos += bw
    vals = bitpack.unpack(buf, W, length, offset=pos)
    pos += bitpack.packed_size(length, W)
    if pl:
        entry_width = bitpack.closest_fixed_bits(pgw + pw)
        entries = bitpack.unpack(buf, entry_width, pl, offset=pos)
        pos += bitpack.packed_size(pl, entry_width)
        gaps = (entries >> np.uint64(pw)).astype(np.int64)
        patches = entries & ((np.uint64(1) << np.uint64(pw)) - np.uint64(1)) if pw < 64 else entries
        positions = np.cumsum(gaps)
        vals[positions] |= patches << np.uint64(W)
    out = (vals.view(np.int64) + np.int64(base))
    if signed:
        return out, pos
    return out.view(np.uint64).copy(), pos
