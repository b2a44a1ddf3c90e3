"""Real ORC file writer (pure Python): bidirectional interop.

The reverse of orc_reader.py — encodes a pyarrow Table into a real ORC v1
file whose streams are produced by THIS ENGINE'S codecs and whose tail
(PostScript/Footer/StripeFooter protobufs) is hand-assembled from the
public orc_proto field numbers (mirrored from the reference's proto.rs).
tests/test_orc_interop.py proves the round: files written here are read
back bit-identically by the APACHE ORC reader (pyarrow.orc == ORC C++).

Writer codec choices are the spec-conformant subset of the engine's
codecs: signed/unsigned RLEv2 (aligned widths — valid ORC, the width is
coded per run), boolean/byte RLE, raw LE floats, string DirectV2 /
sorted DictionaryV2, and the ZLIB chunk framing. Engine-private codecs
(FSST, for/for_scale) never appear in ORC output.

Scope: kinds boolean/byte/short/int/long/float/double/string/binary/date/
timestamp/decimal, plus NESTED list / struct / map at any depth (the ORC
compound-type model: pre-order type tree, per-column PRESENT + LENGTH
streams, children record only slots whose parent is present). Union raises.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import boolean_rle, deflate, rle_v2, strings, varint
from .orc_reader import (DATA, DICTIONARY_DATA, LENGTH, PRESENT, SECONDARY,
                         _TS_EPOCH_S, MAGIC, _POS_SUFFIX, _pos_category)

# Type.kind enums (public orc_proto)
_KIND_OF_ARROW = {
    "bool": 0, "int8": 1, "int16": 2, "int32": 3, "int64": 4,
    "float": 5, "double": 6, "string": 7, "large_string": 7,
    "binary": 8, "large_binary": 8, "timestamp[us]": 9,
    "timestamp[us, tz=UTC]": 9, "date32[day]": 15,
}
_LIST_KIND, _MAP_KIND, _STRUCT_KIND, _UNION_KIND, _DECIMAL_KIND = (
    10, 11, 12, 13, 14)

DIRECT_V2, DICTIONARY_V2 = 2, 3
# dictionary wins when ndv/n is below this (pyorc's dict_key_size_threshold
# analog — reference write.py:55)
DICT_THRESHOLD = 0.5


# ---------------------------------------------------------------------------
# minimal protobuf wire-format ENCODER
# ---------------------------------------------------------------------------


def _pb_varint(field: int, value: int) -> bytes:
    return varint.encode_unsigned((field << 3) | 0) + varint.encode_unsigned(value)


def _pb_bytes(field: int, payload: bytes) -> bytes:
    return (varint.encode_unsigned((field << 3) | 2)
            + varint.encode_unsigned(len(payload)) + payload)


def _pb_packed(field: int, values: list[int]) -> bytes:
    body = b"".join(varint.encode_unsigned(v) for v in values)
    return _pb_bytes(field, body)


def _pb_zigzag(field: int, value: int) -> bytes:
    """sint64/sint32 field (zigzag varint)."""
    return varint.encode_unsigned((field << 3) | 0) + varint.encode_unsigned(
        (value << 1) ^ (value >> 63) if value >= 0 else ((-value) << 1) - 1)


def _pb_fixed64(field: int, raw8: bytes) -> bytes:
    return varint.encode_unsigned((field << 3) | 1) + raw8


# ---------------------------------------------------------------------------
# ColumnStatistics (public orc_proto): numberOfValues=1, intStatistics=2
# (sint64 min=1/max=2), doubleStatistics=3 (double min=1/max=2),
# stringStatistics=4 (bytes min=1/max=2), dateStatistics=7 (sint32
# min=1/max=2), timestampStatistics=9 (ms; minimumUtc=3/maximumUtc=4),
# hasNull=10 — the row-group/stripe stats model the reference declares in
# src/proto.rs:88-99.
# ---------------------------------------------------------------------------


def _column_stats(arr: pa.Array, kind: int) -> dict:
    """Writer-side stats for one column slice (stride group or stripe)."""
    import pyarrow.compute as pc
    st = {"n": len(arr) - arr.null_count, "has_null": arr.null_count > 0,
          "kind": None, "min": None, "max": None}
    if st["n"] == 0:
        return st
    try:
        if kind in (1, 2, 3, 4):          # byte/short/int/long
            mm = pc.min_max(arr).as_py()
            st.update(kind="int", min=int(mm["min"]), max=int(mm["max"]))
        elif kind in (5, 6):              # float/double
            # Apache ORC semantics: NaN is unorderable -> omit bounds for
            # the slice; +/-inf are valid orderable min/max and MUST be
            # kept, or a stats-pruning reader would silently drop inf rows.
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            if not np.isnan(vals).any():
                st.update(kind="double", min=float(vals.min()),
                          max=float(vals.max()))
        elif kind in (7, 16, 17):         # string/varchar/char
            mm = pc.min_max(arr).as_py()
            st.update(kind="string", min=str(mm["min"]), max=str(mm["max"]))
        elif kind == 15:                  # date (days)
            mm = pc.min_max(arr.cast(pa.int32())).as_py()
            st.update(kind="date", min=int(mm["min"]), max=int(mm["max"]))
        elif kind == 9:                   # timestamp -> UTC millis
            mm = pc.min_max(arr.cast(pa.int64())).as_py()
            # floor the min / ceil the max so the bounds stay valid for
            # pruning despite the us -> ms truncation
            st.update(kind="timestamp_ms_utc", min=int(mm["min"]) // 1000,
                      max=-(-int(mm["max"]) // 1000))
    except pa.ArrowNotImplementedError:
        pass
    return st


def _merge_stats(a: dict, b: dict) -> dict:
    out = {"n": a["n"] + b["n"], "has_null": a["has_null"] or b["has_null"],
           "kind": a["kind"] or b["kind"], "min": None, "max": None}
    # A side with rows but no bounds has UNKNOWN bounds (NaN in a double
    # slice, or a stats-less kind): merging must yield unknown, never the
    # other side's bounds — else stripe/file stats claim a range that
    # excludes real rows and stats-aware readers misprune.
    a_unknown = a["n"] > 0 and a["min"] is None
    b_unknown = b["n"] > 0 and b["min"] is None
    if not (a_unknown or b_unknown):
        if a["min"] is not None and b["min"] is not None:
            out["min"] = min(a["min"], b["min"])
            out["max"] = max(a["max"], b["max"])
        elif a["min"] is not None:
            out["min"], out["max"] = a["min"], a["max"]
        elif b["min"] is not None:
            out["min"], out["max"] = b["min"], b["max"]
    return out


def _pb_stats(st: dict) -> bytes:
    body = _pb_varint(1, int(st["n"]))
    if st.get("min") is not None and st.get("kind"):
        k = st["kind"]
        if k == "int":
            body += _pb_bytes(2, _pb_zigzag(1, st["min"])
                              + _pb_zigzag(2, st["max"]))
        elif k == "double":
            body += _pb_bytes(3, _pb_fixed64(
                1, np.float64(st["min"]).tobytes())
                + _pb_fixed64(2, np.float64(st["max"]).tobytes()))
        elif k == "string":
            body += _pb_bytes(4, _pb_bytes(1, st["min"].encode("utf-8"))
                              + _pb_bytes(2, st["max"].encode("utf-8")))
        elif k == "date":
            body += _pb_bytes(7, _pb_zigzag(1, st["min"])
                              + _pb_zigzag(2, st["max"]))
        elif k == "timestamp_ms_utc":
            # writerTimezone is UTC, so writer-tz (1,2) == UTC (3,4)
            body += _pb_bytes(9, _pb_zigzag(1, st["min"])
                              + _pb_zigzag(2, st["max"])
                              + _pb_zigzag(3, st["min"])
                              + _pb_zigzag(4, st["max"]))
    body += _pb_varint(10, 1 if st["has_null"] else 0)
    return body


# row-index position shapes (_pos_category/_POS_SUFFIX) are imported from
# orc_reader — writer and reader MUST agree on them byte-for-byte, so there
# is exactly one copy (drift = shifted row-group slices)


# ---------------------------------------------------------------------------
# column stream encoders (reuse the engine codecs)
# ---------------------------------------------------------------------------


def _present_stream(arr: pa.Array) -> bytes:
    if arr.null_count == 0:
        return b""
    valid = np.asarray(arr.is_valid())
    return boolean_rle.encode_bools(valid)


def _encode_timestamp(nn: pa.Array) -> tuple[bytes, bytes]:
    us = nn.cast(pa.int64()).to_numpy(zero_copy_only=False)
    sec = us // 1_000_000
    sub_us = us - sec * 1_000_000          # always in [0, 1e6)
    nanos = sub_us * 1000
    # nanos carry a 3-bit trailing-zero scale (low bits c != 0 means the
    # value was divided by 10^(c+1)). Emitting scale 0 for everything is
    # spec-valid; our µs-resolution nanos always end in 000, so scale 2
    # (÷1000) is the vectorized sweet spot — same bytes semantics, 10 bits
    # smaller per value.
    enc = np.where(nanos == 0, np.uint64(0),
                   ((nanos // 1000) << np.uint64(3)) | np.uint64(2)).astype(np.uint64)
    data = rle_v2.encode((sec - _TS_EPOCH_S).astype(np.int64), signed=True)
    secondary = rle_v2.encode(enc, signed=False)
    return data, secondary


def _encode_column(arr: pa.Array,
                   no_dict: bool = False) -> tuple[dict[int, bytes], dict]:
    """-> ({stream kind: raw bytes}, column encoding dict). ``no_dict``
    forces direct string encoding (row-index files: one dictionary per
    stripe cannot be assembled from per-stride encodes)."""
    t = str(arr.type)
    enc = {"kind": DIRECT_V2, "dictionarySize": 0}
    streams: dict[int, bytes] = {}
    p = _present_stream(arr)
    if p:
        streams[PRESENT] = p
    nn = arr.drop_null() if arr.null_count else arr

    if t == "bool":
        streams[DATA] = boolean_rle.encode_bools(
            nn.to_numpy(zero_copy_only=False))
        enc["kind"] = 0  # DIRECT (bool has no V2 form)
    elif t == "int8":
        streams[DATA] = boolean_rle.encode_bytes(
            nn.to_numpy(zero_copy_only=False).astype(np.uint8))
        enc["kind"] = 0
    elif t in ("int16", "int32", "int64"):
        v = nn.to_numpy(zero_copy_only=False).astype(np.int64)
        streams[DATA] = rle_v2.encode(v, signed=True)
    elif t == "date32[day]":
        v = nn.cast(pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
        streams[DATA] = rle_v2.encode(v, signed=True)
    elif t in ("float", "double"):
        streams[DATA] = nn.to_numpy(zero_copy_only=False).astype(
            "<f4" if t == "float" else "<f8").tobytes()
        enc["kind"] = 0
    elif t.startswith("timestamp"):
        streams[DATA], streams[SECONDARY] = _encode_timestamp(nn)
    elif t.startswith("decimal128("):
        # ORC decimal: DATA = zigzag varint mantissas, SECONDARY = per-value
        # scale (signed RLEv2). Mantissas come straight from the arrow
        # decimal128 buffer and encode in one vectorized varint pass.
        scale = arr.type.scale
        if isinstance(nn, pa.ChunkedArray):
            nn = nn.combine_chunks()
        raw = np.frombuffer(nn.buffers()[1], dtype=np.int64,
                            count=2 * (len(nn) + nn.offset))
        words = raw.reshape(-1, 2)[nn.offset:]
        lo, hi = words[:, 0], words[:, 1]
        if not (hi == (lo >> 63)).all():
            raise NotImplementedError(
                "ORC writer: decimal mantissa beyond int64")
        streams[DATA] = varint.encode_signed_array(lo)
        streams[SECONDARY] = rle_v2.encode(
            np.full(len(nn), scale, dtype=np.int64), signed=True)
    elif t in ("string", "large_string", "binary", "large_binary"):
        binary = "binary" in t
        n = len(nn)
        if n and not binary and not no_dict:
            dblob, dlens, codes, ndv = strings.encode_dict(nn)
            use_dict = ndv <= max(n * DICT_THRESHOLD, 1)
        else:
            use_dict = False
        if use_dict:
            streams[DICTIONARY_DATA] = dblob
            streams[LENGTH] = rle_v2.encode(dlens, signed=False)
            streams[DATA] = rle_v2.encode(codes, signed=False)
            enc.update(kind=DICTIONARY_V2, dictionarySize=ndv)
        else:
            blob, lengths = strings.encode_direct(nn, binary=binary)
            streams[DATA] = blob
            streams[LENGTH] = rle_v2.encode(lengths, signed=False)
    else:
        raise NotImplementedError(f"ORC writer: unsupported type {t}")
    return streams, enc


# ---------------------------------------------------------------------------
# file assembly
# ---------------------------------------------------------------------------


def _add_type(nodes: list, typ: pa.DataType) -> int:
    """Append ``typ``'s subtree to the pre-order type-node list; return its
    column id. Node ids follow the ORC rule: a node's children occupy the
    ids immediately after it, depth-first (reference src/proto.rs:184-203)."""
    nid = len(nodes)
    node = {"type": typ, "subtypes": [], "fieldNames": []}
    nodes.append(node)
    t = str(typ)
    if pa.types.is_struct(typ):
        node["kind"] = _STRUCT_KIND
        for f in typ:
            node["fieldNames"].append(f.name)
        for f in typ:
            node["subtypes"].append(_add_type(nodes, f.type))
    elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
        node["kind"] = _LIST_KIND
        node["subtypes"].append(_add_type(nodes, typ.value_type))
    elif pa.types.is_map(typ):
        node["kind"] = _MAP_KIND
        node["subtypes"].append(_add_type(nodes, typ.key_type))
        node["subtypes"].append(_add_type(nodes, typ.item_type))
    elif pa.types.is_union(typ):
        node["kind"] = _UNION_KIND
        for f in typ:
            node["subtypes"].append(_add_type(nodes, f.type))
    elif t.startswith("decimal128("):
        node["kind"] = _DECIMAL_KIND
    elif t in _KIND_OF_ARROW:
        node["kind"] = _KIND_OF_ARROW[t]
    else:
        raise NotImplementedError(f"ORC writer: unsupported type {t}")
    return nid


def _build_type_nodes(schema: pa.Schema) -> list:
    """Pre-order type-node list for the whole file (root struct = id 0)."""
    nodes = [{"type": None, "kind": _STRUCT_KIND, "subtypes": [],
              "fieldNames": [f.name for f in schema]}]
    for f in schema:
        nodes[0]["subtypes"].append(_add_type(nodes, f.type))
    return nodes


def _footer_type_tree(nodes: list) -> bytes:
    out = b""
    for node in nodes:
        body = _pb_varint(1, node["kind"])
        if node["subtypes"]:
            body += _pb_packed(2, node["subtypes"])
        for name in node["fieldNames"]:
            body += _pb_bytes(3, name.encode("utf-8"))
        if node["kind"] == _DECIMAL_KIND:
            body += _pb_varint(5, node["type"].precision)
            body += _pb_varint(6, node["type"].scale)
        out += _pb_bytes(4, body)
    return out


def _encode_tree(nodes: list, nid: int, arr: pa.Array,
                 col_streams: dict, encodings: dict,
                 nvals: dict | None = None, stats: dict | None = None,
                 no_dict: bool = False) -> None:
    """Encode ``arr`` as column id ``nid`` (and its children, recursively).
    Compound kinds get PRESENT (+LENGTH) here; children record only the
    slots whose parent value is present — the ORC compound model.
    ``nvals``/``stats`` (when given) collect per-column slot counts and
    ColumnStatistics for the row-index / Metadata sections."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    node = nodes[nid]
    kind = node["kind"]
    if nvals is not None:
        nvals[nid] = len(arr)
    if stats is not None:
        stats[nid] = _column_stats(arr, kind)
    if kind == _STRUCT_KIND:
        streams = {}
        p = _present_stream(arr)
        if p:
            streams[PRESENT] = p
        nn = arr.drop_null() if arr.null_count else arr
        col_streams[nid] = streams
        encodings[nid] = {"kind": 0, "dictionarySize": 0}
        for k, cid in enumerate(node["subtypes"]):
            _encode_tree(nodes, cid, nn.field(k), col_streams, encodings,
                         nvals, stats, no_dict)
    elif kind in (_LIST_KIND, _MAP_KIND):
        streams = {}
        p = _present_stream(arr)
        if p:
            streams[PRESENT] = p
        nn = arr.drop_null() if arr.null_count else arr
        offsets = np.asarray(nn.offsets, dtype=np.int64)
        lengths = np.diff(offsets).astype(np.uint64)
        streams[LENGTH] = rle_v2.encode(lengths, signed=False)
        col_streams[nid] = streams
        encodings[nid] = {"kind": DIRECT_V2, "dictionarySize": 0}
        if kind == _LIST_KIND:
            _encode_tree(nodes, node["subtypes"][0], nn.flatten(),
                         col_streams, encodings, nvals, stats, no_dict)
        else:
            _encode_tree(nodes, node["subtypes"][0], nn.keys,
                         col_streams, encodings, nvals, stats, no_dict)
            _encode_tree(nodes, node["subtypes"][1], nn.items,
                         col_streams, encodings, nvals, stats, no_dict)
    elif kind == _UNION_KIND:
        # ORC union: DATA = tag bytes (byte RLE); child i records values in
        # row order for the slots whose tag is i. Arrow dense unions carry
        # (type_codes, value_offsets); sparse unions have no offsets.
        from .codecs import boolean_rle
        streams = {}
        if arr.null_count:
            raise NotImplementedError(
                "ORC writer: nullable union slots not supported "
                "(see README 'Unsupported features')")
        codes = np.asarray(arr.type_codes)
        code_list = list(arr.type.type_codes)  # child index -> raw code
        code_to_idx = np.zeros(max(code_list) + 1, dtype=np.uint8)
        for i, c in enumerate(code_list):
            code_to_idx[c] = i
        tags = code_to_idx[codes]
        streams[DATA] = boolean_rle.encode_bytes(tags)
        col_streams[nid] = streams
        encodings[nid] = {"kind": 0, "dictionarySize": 0}
        dense = arr.type.mode == "dense"
        offsets = np.asarray(arr.offsets) if dense else None
        for i, cid in enumerate(node["subtypes"]):
            sel = np.flatnonzero(tags == i)
            child = arr.field(i)
            if dense:
                take = offsets[sel]
            else:
                take = sel
            vals = child.take(pa.array(take, type=pa.int64()))
            _encode_tree(nodes, cid, vals, col_streams, encodings,
                         nvals, stats, no_dict)
    else:
        streams, enc = _encode_column(arr, no_dict=no_dict)
        col_streams[nid] = streams
        encodings[nid] = enc


_STREAM_ORDER = (PRESENT, DATA, LENGTH, DICTIONARY_DATA, SECONDARY)
ROW_INDEX_KIND = 6


def _section_compressor(comp_kind: int):
    """Per-kind ORC section compressor under the shared chunk framing.
    ZLIB stays on the pinned-deterministic pure-Python deflate; SNAPPY(2),
    LZ4(4, raw block format) and ZSTD(5) use pyarrow's bundled codecs —
    the same codecs the Apache C++ reader links, so write-side output is
    validated by the same pyarrow.orc interop tests as the zlib path.
    LZO(3) uses our pure-Python LZO1X block codec (no library provides it),
    cross-validated against Spark's own aircompressor Java codec."""
    if comp_kind == 0:
        return lambda raw: raw
    if comp_kind == 1:
        return deflate.compress
    if comp_kind == 3:
        from .codecs import lz77
        return lambda raw: deflate.frame(raw, lz77.lzo1x_compress)
    codec = pa.Codec({2: "snappy", 4: "lz4_raw"}.get(comp_kind, "zstd"),
                     compression_level=3 if comp_kind == 5 else None)
    return lambda raw: deflate.frame(
        raw, lambda chunk: codec.compress(chunk, asbytes=True))


def write_orc_bytes(tbl: pa.Table, compression: str = "zlib",
                    stripe_rows: int = 65_536,
                    row_index_stride: int = 0) -> bytes:
    """Encode a pyarrow Table to ORC file bytes.

    ``row_index_stride`` > 0 additionally emits per-stripe ROW_INDEX
    streams (RowIndexEntry positions + per-stride ColumnStatistics, the
    RowIndex model the reference declares in src/proto.rs:88-99) so OTHER
    readers can skip row groups inside our files. Implementation: each
    column's streams are encoded per stride group and concatenated, with
    each group compressed as its own chunk run — so every group starts at
    a compressed-chunk boundary and positions are exact
    (block_offset, 0[, run 0[, bit 0]]). Low-NDV string columns still get
    DictionaryV2 via a stripe-global post-pass: per-group direct encodes
    are rebuilt against ONE sorted stripe dictionary (codes re-encoded per
    group with fresh codec state), DICTIONARY_DATA/LENGTH become single
    stripe-level chunks, and positions cover PRESENT + DATA only (spec).

    The Metadata section (per-stripe StripeStatistics) and the Footer's
    file-level statistics are always written, so stripe pruning works on
    our files through any stats-aware reader (including
    orc_reader.spark_read_orc's predicate hint)."""
    comp_kind = {"none": 0, "uncompressed": 0, "zlib": 1, "snappy": 2,
                 "lzo": 3, "lz4": 4, "zstd": 5}[compression]
    section = _section_compressor(comp_kind)

    nodes = _build_type_nodes(tbl.schema)
    out = bytearray(MAGIC)
    stripe_infos = []
    all_stripe_stats = []     # per stripe: {cid: merged stats}
    for lo in range(0, max(tbl.num_rows, 1), stripe_rows):
        chunk = tbl.slice(lo, min(stripe_rows, tbl.num_rows - lo))
        if chunk.num_rows == 0 and tbl.num_rows > 0:
            break
        offset = len(out)
        stride = row_index_stride or max(chunk.num_rows, 1)
        n_groups = max((chunk.num_rows + stride - 1) // stride, 1)

        # encode each stride group independently (one group == old behavior)
        group_streams: list[dict] = []   # [ {cid: {kind: raw bytes}} ]
        group_stats: list[dict] = []     # [ {cid: stats} ]
        group_nvals: list[dict] = []     # [ {cid: slot count} ]
        enc_by_id: dict[int, dict] = {}
        for g in range(n_groups):
            gs = chunk.slice(g * stride, min(stride, chunk.num_rows - g * stride))
            cs: dict[int, dict[int, bytes]] = {0: {}}
            eb: dict[int, dict] = {0: {"kind": 0, "dictionarySize": 0}}
            nv: dict[int, int] = {0: gs.num_rows}
            st: dict[int, dict] = {0: {"n": gs.num_rows, "has_null": False,
                                       "kind": None, "min": None, "max": None}}
            for ci, name in enumerate(gs.column_names):
                _encode_tree(nodes, nodes[0]["subtypes"][ci], gs.column(name),
                             cs, eb, nv, st,
                             no_dict=bool(row_index_stride))
            group_streams.append(cs)
            group_stats.append(st)
            group_nvals.append(nv)
            enc_by_id = eb               # identical across groups by design
        # PRESENT must cover every group once any group needs it — a group
        # with no nulls still contributes its all-true bits
        present_cids = {cid for cs in group_streams
                        for cid in cs if PRESENT in cs[cid]}
        for cs, nv in zip(group_streams, group_nvals):
            for cid in present_cids:
                if PRESENT not in cs.get(cid, {}):
                    cs.setdefault(cid, {})[PRESENT] = boolean_rle.encode_bools(
                        np.ones(nv.get(cid, 0), dtype=bool))

        # DICTIONARY post-pass for row-index stripes: the per-group encode
        # wrote strings DIRECT (a dictionary cannot be assembled per stride
        # group — ORC has ONE dictionary per stripe), but low-NDV string
        # columns still deserve one. Rebuild each candidate's values from
        # its per-group direct streams, build the STRIPE-global sorted
        # dictionary, swap every group's DATA to its rle code slice (fresh
        # codec state per group keeps the slices independently seekable),
        # and emit DICTIONARY_DATA + LENGTH once, stripe-level. Positions
        # stay valid: dict columns index PRESENT + DATA only (spec).
        stripe_level: dict[tuple[int, int], bytes] = {}
        if row_index_stride:
            for cid in sorted({c for cs in group_streams for c in cs}):
                if nodes[cid]["kind"] not in (7, 16, 17):
                    continue              # strings only; binary stays direct
                counts = [int(group_stats[g].get(cid, {"n": 0})["n"])
                          for g in range(n_groups)]
                vals = [strings.decode_direct(
                            group_streams[g][cid].get(DATA, b""),
                            rle_v2.decode(
                                group_streams[g][cid].get(LENGTH, b""),
                                counts[g], signed=False))
                        for g in range(n_groups) if counts[g]]
                n_vals = sum(counts)
                if n_vals == 0:
                    continue
                allv = pa.concat_arrays([v.combine_chunks()
                                         if isinstance(v, pa.ChunkedArray)
                                         else v for v in vals])
                dblob, dlens, codes, ndv = strings.encode_dict(allv)
                if ndv > max(n_vals * DICT_THRESHOLD, 1):
                    continue
                off = 0
                for g, cs in enumerate(group_streams):
                    if counts[g]:
                        cs[cid][DATA] = rle_v2.encode(
                            codes[off:off + counts[g]], signed=False)
                        off += counts[g]
                    else:
                        cs.get(cid, {}).pop(DATA, None)
                    cs.get(cid, {}).pop(LENGTH, None)
                stripe_level[(cid, DICTIONARY_DATA)] = dblob
                stripe_level[(cid, LENGTH)] = rle_v2.encode(dlens,
                                                            signed=False)
                enc_by_id[cid] = {"kind": DICTIONARY_V2,
                                  "dictionarySize": int(ndv)}

        cids = sorted({c for cs in group_streams for c in cs})
        # Bit-packed boolean streams (PRESENT everywhere, DATA of boolean
        # columns) cannot simply restart per group: a group whose bit count
        # is not a multiple of 8 would leave padding bits that shift every
        # later value for a sequential reader. Re-pack them as ONE
        # whole-stripe bit sequence, chunk the byte-RLE at each group's
        # BYTE boundary (the boundary byte belongs to the later chunk), and
        # record each group's bit offset — the reason ORC row-index
        # positions carry a bit offset at all.
        pos_bits: dict[tuple[int, int], list[int]] = {}
        if n_groups > 1:
            for cid in cids:
                for kind in (PRESENT, DATA):
                    if kind == DATA and nodes[cid]["kind"] != 0:
                        continue
                    if not any(kind in cs.get(cid, {}) for cs in group_streams):
                        continue
                    bit_counts, all_bits = [], []
                    for g, cs in enumerate(group_streams):
                        if kind == PRESENT:
                            nb = group_nvals[g].get(cid, 0)
                        else:
                            nb = int(group_stats[g][cid]["n"])
                        bit_counts.append(nb)
                        if nb:
                            all_bits.append(boolean_rle.decode_bools(
                                cs.get(cid, {}).get(kind, b""), nb))
                    bits = (np.concatenate(all_bits) if all_bits
                            else np.zeros(0, dtype=bool))
                    packed = np.packbits(bits.astype(np.uint8))
                    S = np.zeros(n_groups + 1, dtype=np.int64)
                    np.cumsum(np.array(bit_counts, dtype=np.int64), out=S[1:])
                    byte_starts = (S // 8).tolist()
                    pos_bits[(cid, kind)] = (S[:-1] % 8).tolist()
                    for g, cs in enumerate(group_streams):
                        lo = byte_starts[g]
                        hi = (byte_starts[g + 1] if g + 1 < n_groups
                              else len(packed))
                        cs.setdefault(cid, {})[kind] = \
                            boolean_rle.encode_bytes(packed[lo:hi])
        # concatenate per (cid, kind); each group section()ed independently
        # so groups start at compressed-chunk boundaries
        parts: dict[tuple[int, int], list[bytes]] = {}
        for cid in cids:
            for kind in _STREAM_ORDER:
                if (cid, kind) in stripe_level:
                    # stripe-global dictionary streams: ONE chunk, no
                    # per-group sections (and no row-index positions)
                    parts[(cid, kind)] = [section(stripe_level[(cid, kind)])]
                elif any(kind in cs.get(cid, {}) for cs in group_streams):
                    parts[(cid, kind)] = [
                        section(cs.get(cid, {}).get(kind, b""))
                        for cs in group_streams]

        stream_meta = []          # (kind, column_id, length)
        index_bytes = bytearray()
        if row_index_stride:
            for cid in cids:
                entries = b""
                for g in range(n_groups):
                    positions: list[int] = []
                    for kind in _STREAM_ORDER:
                        if (kind == DICTIONARY_DATA
                                or (cid, kind) in stripe_level
                                or (cid, kind) not in parts):
                            continue      # dict streams carry no positions
                        comp_off = sum(len(p) for p in parts[(cid, kind)][:g])
                        positions.append(comp_off)
                        if comp_kind:
                            positions.append(0)   # offset in decompressed chunk
                        suffix = [0] * _POS_SUFFIX[
                            _pos_category(nodes[cid], kind,
                                          enc_by_id[cid]["kind"])]
                        if suffix and (cid, kind) in pos_bits:
                            suffix[-1] = pos_bits[(cid, kind)][g]
                        positions.extend(suffix)
                    entry = _pb_packed(1, positions)
                    entry += _pb_bytes(2, _pb_stats(
                        group_stats[g].get(cid, {"n": 0, "has_null": False,
                                                 "kind": None, "min": None,
                                                 "max": None})))
                    entries += _pb_bytes(1, entry)
                ri = section(entries)
                stream_meta.append((ROW_INDEX_KIND, cid, len(ri)))
                index_bytes += ri

        data = bytearray()
        for cid in cids:
            for kind in _STREAM_ORDER:
                if (cid, kind) in parts:
                    payload = b"".join(parts[(cid, kind)])
                    stream_meta.append((kind, cid, len(payload)))
                    data += payload
        out += index_bytes
        out += data
        sf = b""
        for kind, col_id, length in stream_meta:
            sf += _pb_bytes(1, _pb_varint(1, kind) + _pb_varint(2, col_id)
                            + _pb_varint(3, length))
        for cid in range(len(nodes)):
            enc = enc_by_id[cid]
            body = _pb_varint(1, enc["kind"])
            if enc["dictionarySize"]:
                body += _pb_varint(2, enc["dictionarySize"])
            sf += _pb_bytes(2, body)
        sf += _pb_bytes(3, b"UTC")  # writerTimezone
        sf_bytes = section(sf)
        out += sf_bytes
        stripe_infos.append({
            "offset": offset, "indexLength": len(index_bytes),
            "dataLength": len(data), "footerLength": len(sf_bytes),
            "numberOfRows": chunk.num_rows,
        })
        merged: dict[int, dict] = {}
        for st in group_stats:
            for cid, s in st.items():
                merged[cid] = _merge_stats(merged[cid], s) if cid in merged else s
        all_stripe_stats.append(merged)

    content_len = len(out)

    # Metadata section: per-stripe StripeStatistics (field 1), each a
    # repeated ColumnStatistics in column-id order
    metadata = b""
    for merged in all_stripe_stats:
        body = b"".join(_pb_bytes(1, _pb_stats(
            merged.get(cid, {"n": 0, "has_null": False, "kind": None,
                             "min": None, "max": None})))
            for cid in range(len(nodes)))
        metadata += _pb_bytes(1, body)
    metadata_bytes = section(metadata) if all_stripe_stats else b""
    out += metadata_bytes

    footer = _pb_varint(1, 3)  # headerLength = len(MAGIC)
    footer += _pb_varint(2, content_len)  # contentLength
    for si in stripe_infos:
        body = (_pb_varint(1, si["offset"]) + _pb_varint(2, si["indexLength"])
                + _pb_varint(3, si["dataLength"])
                + _pb_varint(4, si["footerLength"])
                + _pb_varint(5, si["numberOfRows"]))
        footer += _pb_bytes(3, body)
    footer += _footer_type_tree(nodes)
    footer += _pb_varint(6, tbl.num_rows)
    # file-level statistics (field 7), merged across stripes
    file_stats: dict[int, dict] = {}
    for merged in all_stripe_stats:
        for cid, s in merged.items():
            file_stats[cid] = (_merge_stats(file_stats[cid], s)
                               if cid in file_stats else s)
    for cid in range(len(nodes)):
        footer += _pb_bytes(7, _pb_stats(
            file_stats.get(cid, {"n": 0, "has_null": False, "kind": None,
                                 "min": None, "max": None})))
    footer += _pb_varint(8, row_index_stride)
    footer_bytes = section(footer)
    out += footer_bytes

    ps = _pb_varint(1, len(footer_bytes))
    ps += _pb_varint(2, comp_kind)
    if comp_kind:
        ps += _pb_varint(3, deflate.DEFAULT_BLOCK_SIZE)
    ps += _pb_packed(4, [0, 12])  # version 0.12
    ps += _pb_varint(5, len(metadata_bytes))  # metadataLength
    ps += _pb_varint(6, 1)  # writerVersion >= HIVE-8732 (RLEv2 fixed)
    ps += _pb_bytes(8000, MAGIC)
    out += ps
    out.append(len(ps))
    return bytes(out)


def write_orc(tbl: pa.Table, path: str, compression: str = "zlib",
              stripe_rows: int = 65_536, row_index_stride: int = 0) -> None:
    with open(path, "wb") as f:
        f.write(write_orc_bytes(tbl, compression, stripe_rows,
                                row_index_stride))


def spark_write_orc(df, out_dir: str, compression: str = "zlib",
                    stripe_rows: int = 65_536,
                    row_index_stride: int = 0) -> int:
    """Distributed ORC write: each task writes one .orc file via THIS
    writer (real ORC output consumable by any Apache reader). Returns the
    number of files written."""
    import os
    os.makedirs(out_dir, exist_ok=True)

    def runner(batches):
        import pyarrow as _pa
        import uuid as _uuid
        rows = list(batches)
        n = 0
        if rows:
            t = _pa.Table.from_batches(rows)
            if t.num_rows:
                write_orc(t, os.path.join(
                    out_dir, f"part-{_uuid.uuid4().hex[:12]}.orc"),
                    compression, stripe_rows, row_index_stride)
                n = 1
        yield _pa.RecordBatch.from_arrays(
            [_pa.array([n], type=_pa.int64())], names=["files"])

    from pyspark.sql import functions as F
    return int(df.mapInArrow(runner, "files long")
               .agg(F.sum("files")).collect()[0][0] or 0)
