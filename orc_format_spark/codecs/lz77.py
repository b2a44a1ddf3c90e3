"""Pure-Python Snappy and LZ4 BLOCK decompression (read-only interop).

The two LZ77-family block codecs ORC names in CompressionKind (SNAPPY=2,
LZ4=4) that the reference leaves as `todo!()` (decompress/mod.rs:80-88).
No snappy/lz4 libraries exist in this environment, so both block formats
are implemented from their public specifications:

  Snappy: https://github.com/google/snappy/blob/main/format_description.txt
  LZ4:    https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md

These sit behind the same 3-byte is-original chunk framing as ZLIB
(deflate.py), so chunks that did not shrink never reach them. Interop-only
decode paths (our writer emits ZLIB); overlapping copies use the
repeat-pattern slice trick so runs decode as slice ops, not byte loops.
"""

from __future__ import annotations


def _copy_match(out: bytearray, offset: int, length: int) -> None:
    """Append ``length`` bytes starting ``offset`` back (overlap allowed:
    LZ77 semantics — the pattern of the last ``offset`` bytes repeats)."""
    if offset <= 0 or offset > len(out):
        raise ValueError("corrupt LZ77 stream: bad match offset")
    start = len(out) - offset
    if offset >= length:
        out += out[start:start + length]
    else:
        pattern = bytes(out[start:])
        reps = -(-length // offset)
        out += (pattern * reps)[:length]


def snappy_decompress(buf: bytes) -> bytes:
    """Decompress one raw Snappy block."""
    # preamble: varint uncompressed length
    ulen = 0
    shift = 0
    pos = 0
    while True:
        b = buf[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if b < 0x80:
            break
        shift += 7
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            l = tag >> 2
            if l < 60:
                length = l + 1
            else:
                n_extra = l - 59
                length = int.from_bytes(buf[pos:pos + n_extra], "little") + 1
                pos += n_extra
            out += buf[pos:pos + length]
            pos += length
        else:
            if kind == 1:  # copy, 1-byte offset
                length = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | buf[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(buf[pos:pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                length = (tag >> 2) + 1
                offset = int.from_bytes(buf[pos:pos + 4], "little")
                pos += 4
            _copy_match(out, offset, length)
    if len(out) != ulen:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {ulen}")
    return bytes(out)


def lz4_decompress(buf: bytes) -> bytes:
    """Decompress one raw LZ4 block."""
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = buf[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        out += buf[pos:pos + lit_len]
        pos += lit_len
        if pos >= n:  # last sequence has no match part
            break
        offset = int.from_bytes(buf[pos:pos + 2], "little")
        pos += 2
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = buf[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        _copy_match(out, offset, match_len)
    return bytes(out)
