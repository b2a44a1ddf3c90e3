"""Pure-numpy codec kernels. No Spark imports — unit-testable in milliseconds.

Byte-format parity targets (reference: /root/reference, a Rust ORC decoder):
  - integer RLE v2: src/read/decode/rle_v2.rs (short-repeat/direct/delta;
    patched-base is todo!() there and implemented here from the public ORC spec)
  - boolean/byte RLE: src/read/decode/boolean_rle.rs
  - raw LE IEEE floats: src/read/decode/float.rs
  - string direct / sorted dictionary: tests/it/deserialize.rs:106-201
  - zlib block framing with is-original escape: src/read/decompress/mod.rs:9-17
  - FSST: no reference implementation; built from the public FSST paper
    (Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
    VLDB 2020).
"""

from . import bitpack, boolean_rle, deflate, floats, fsst, rle_v2, strings, varint  # noqa: F401
