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
                         _TS_EPOCH_S, MAGIC)

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


def _encode_column(arr: pa.Array) -> tuple[dict[int, bytes], dict]:
    """-> ({stream kind: raw bytes}, column encoding dict)."""
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
        if n and not binary:
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
                 col_streams: dict, encodings: dict) -> None:
    """Encode ``arr`` as column id ``nid`` (and its children, recursively).
    Compound kinds get PRESENT (+LENGTH) here; children record only the
    slots whose parent value is present — the ORC compound model."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    node = nodes[nid]
    kind = node["kind"]
    if kind == _STRUCT_KIND:
        streams = {}
        p = _present_stream(arr)
        if p:
            streams[PRESENT] = p
        nn = arr.drop_null() if arr.null_count else arr
        col_streams[nid] = streams
        encodings[nid] = {"kind": 0, "dictionarySize": 0}
        for k, cid in enumerate(node["subtypes"]):
            _encode_tree(nodes, cid, nn.field(k), col_streams, encodings)
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
                         col_streams, encodings)
        else:
            _encode_tree(nodes, node["subtypes"][0], nn.keys,
                         col_streams, encodings)
            _encode_tree(nodes, node["subtypes"][1], nn.items,
                         col_streams, encodings)
    elif kind == _UNION_KIND:
        # ORC union: DATA = tag bytes (byte RLE); child i records values in
        # row order for the slots whose tag is i. Arrow dense unions carry
        # (type_codes, value_offsets); sparse unions have no offsets.
        from .codecs import boolean_rle
        streams = {}
        if arr.null_count:
            raise NotImplementedError(
                "ORC writer: nullable union slots not supported")
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
            _encode_tree(nodes, cid, vals, col_streams, encodings)
    else:
        streams, enc = _encode_column(arr)
        col_streams[nid] = streams
        encodings[nid] = enc


def write_orc_bytes(tbl: pa.Table, compression: str = "zlib",
                    stripe_rows: int = 65_536) -> bytes:
    """Encode a pyarrow Table to ORC file bytes."""
    comp_kind = {"none": 0, "uncompressed": 0, "zlib": 1}[compression]

    def section(raw: bytes) -> bytes:
        return deflate.compress(raw) if comp_kind == 1 else raw

    nodes = _build_type_nodes(tbl.schema)
    out = bytearray(MAGIC)
    stripe_infos = []
    for lo in range(0, max(tbl.num_rows, 1), stripe_rows):
        chunk = tbl.slice(lo, min(stripe_rows, tbl.num_rows - lo))
        if chunk.num_rows == 0 and tbl.num_rows > 0:
            break
        offset = len(out)
        col_streams: dict[int, dict[int, bytes]] = {0: {}}
        enc_by_id: dict[int, dict] = {0: {"kind": 0, "dictionarySize": 0}}
        for ci, name in enumerate(chunk.column_names):
            _encode_tree(nodes, nodes[0]["subtypes"][ci],
                         chunk.column(name), col_streams, enc_by_id)
        stream_meta = []          # (kind, column_id, length)
        data = bytearray()
        for cid in sorted(col_streams):
            for kind in (PRESENT, DATA, LENGTH, DICTIONARY_DATA, SECONDARY):
                if kind in col_streams[cid]:
                    payload = section(col_streams[cid][kind])
                    stream_meta.append((kind, cid, len(payload)))
                    data += payload
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
            "offset": offset, "indexLength": 0,
            "dataLength": len(data), "footerLength": len(sf_bytes),
            "numberOfRows": chunk.num_rows,
        })

    footer = _pb_varint(1, 3)  # headerLength = len(MAGIC)
    footer += _pb_varint(2, len(out))  # contentLength
    for si in stripe_infos:
        body = (_pb_varint(1, si["offset"]) + _pb_varint(2, si["indexLength"])
                + _pb_varint(3, si["dataLength"])
                + _pb_varint(4, si["footerLength"])
                + _pb_varint(5, si["numberOfRows"]))
        footer += _pb_bytes(3, body)
    footer += _footer_type_tree(nodes)
    footer += _pb_varint(6, tbl.num_rows)
    footer += _pb_varint(8, 0)  # rowIndexStride = 0 (no row index written)
    footer_bytes = section(footer)
    out += footer_bytes

    ps = _pb_varint(1, len(footer_bytes))
    ps += _pb_varint(2, comp_kind)
    if comp_kind:
        ps += _pb_varint(3, deflate.DEFAULT_BLOCK_SIZE)
    ps += _pb_packed(4, [0, 12])  # version 0.12
    ps += _pb_varint(5, 0)  # metadataLength
    ps += _pb_varint(6, 1)  # writerVersion >= HIVE-8732 (RLEv2 fixed)
    ps += _pb_bytes(8000, MAGIC)
    out += ps
    out.append(len(ps))
    return bytes(out)


def write_orc(tbl: pa.Table, path: str, compression: str = "zlib",
              stripe_rows: int = 65_536) -> None:
    with open(path, "wb") as f:
        f.write(write_orc_bytes(tbl, compression, stripe_rows))


def spark_write_orc(df, out_dir: str, compression: str = "zlib",
                    stripe_rows: int = 65_536) -> int:
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
                    compression, stripe_rows)
                n = 1
        yield _pa.RecordBatch.from_arrays(
            [_pa.array([n], type=_pa.int64())], names=["files"])

    from pyspark.sql import functions as F
    return int(df.mapInArrow(runner, "files long")
               .agg(F.sum("files")).collect()[0][0] or 0)
