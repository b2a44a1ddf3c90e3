"""FSST-style symbol-table string compression (from the public paper:
Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
VLDB 2020). No reference implementation exists in /root/reference
(SURVEY.md §2.8) — this is an independent, self-consistent design.

Format (our own container; decode-side self-parity pinned by tests):
    header:  u8 n_symbols (0..255)
             n_symbols * u8 symbol byte-lengths (1..8)
             concatenated symbol bytes
    body:    code stream; byte 0..254 = symbol code, byte 255 = escape,
             followed by one literal byte.

Table construction (paper §3.2, simplified deterministically): iterate
``_ITERATIONS`` times — greedily encode a bounded sample with the current
table, count frequencies of emitted symbols and of adjacent-symbol
concatenations (≤8 bytes), score gain = freq * len, keep the top 254
candidates (tie-broken by symbol bytes for determinism).

Vectorization: longest-match lengths/codes are computed for ALL positions
with numpy (per symbol length L: sliding-window L-gram keys + searchsorted
against the ≤255 sorted symbol keys). Only the final greedy cursor walk is a
Python loop, and it advances one *symbol* (avg several bytes) per step.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254
MAX_LEN = 8
_ITERATIONS = 5
_SAMPLE = 1 << 15
# multiply-shift hash multipliers (odd 64-bit constants from the public
# splitmix64/xxhash/murmur finalizers) tried in order until injective over
# a length's symbol keys — single-probe exact lookup in match_all
_HASH_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD,
               0x2545F4914F6CDD1D, 0xD6E8FEB86659FD93, 0xA24BAED4963EE407,
               0x9FB21C651E98DF25, 0xB492B66FBE98F273)

_POW256 = (np.uint64(256) ** np.arange(7, -1, -1, dtype=np.uint64))


def _gram_keys(data: np.ndarray, L: int) -> np.ndarray:
    """u64 big-endian keys of all L-grams of ``data`` (len n-L+1)."""
    n = len(data)
    if n < L:
        return np.zeros(0, dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(data, L).astype(np.uint64)
    return sw @ _POW256[-L:]


class _GramKeys:
    """Lazy 8-byte big-endian keys over zero-padded data: key8[i] = bytes
    i..i+7. No materialized O(8n) build — a 1-byte-strided unaligned
    big-endian uint64 VIEW over the padded buffer, so 8-byte keys are only
    ever converted at the (much sparser) candidate positions the caller
    gathers. The only construction cost is the n+7-byte pad copy."""

    def __init__(self, data: np.ndarray):
        self.n = n = len(data)
        pad = np.zeros(n + 7, dtype=np.uint8)
        pad[:n] = data
        self._pad = pad  # keeps the buffer alive under the strided view
        base = pad[:8].view(">u8")
        self._key8 = np.lib.stride_tricks.as_strided(
            base, shape=(n,), strides=(1,))

    def keys(self, L: int) -> np.ndarray:
        """Keys of all n-L+1 L-grams (positions where the gram fits)."""
        m = max(self.n - L + 1, 0)
        return (self._key8[:m].astype(np.uint64)
                >> np.uint64((8 - L) * 8))


def _sym_key(sym: bytes) -> int:
    k = 0
    for b in sym:
        k = (k << 8) | b
    return k


class SymbolTable:
    """Up to 255 symbols of 1..8 bytes, with match tables per length."""

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        # per length: sorted key array + code array (for searchsorted)
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._lookup: dict[int, tuple] = {}
        for L in range(1, MAX_LEN + 1):
            pairs = [(_sym_key(s), c) for c, s in enumerate(symbols) if len(s) == L]
            if pairs:
                pairs.sort()
                keys = np.array([p[0] for p in pairs], dtype=np.uint64)
                codes = np.array([p[1] for p in pairs], dtype=np.int64)
                # prefix pre-screen before searchsorted: 2-byte LUT for
                # L>=2 (<=255 symbols -> <=255 hot entries of 65536, so the
                # candidate set shrinks ~100x vs a first-byte screen on
                # text), 1-byte LUT for L=1. Filtering only — the match set
                # and therefore the encoded bytes are unchanged.
                if L >= 2:
                    lut = np.zeros(65536, dtype=bool)
                    lut[(keys >> np.uint64((L - 2) * 8)).astype(np.int64)] = True
                else:
                    lut = np.zeros(256, dtype=bool)
                    lut[keys.astype(np.int64)] = True
                self._by_len[L] = (keys, codes, lut)
                # exact O(1) lookup replacing searchsorted in match_all —
                # the match SET is unchanged, only the mechanism:
                # L<=2: dense table over the gram space; L>=3: single-probe
                # hash (multiply-shift, multiplier retried until injective
                # over this length's keys; empty slots carry code -1, so a
                # gram colliding with the zero-filled key array still
                # misses). Falls back to searchsorted if no multiplier
                # works (probability ~1e-7 at 255 keys).
                if L <= 2:
                    dlut = np.full(1 << (8 * L), -1, dtype=np.int16)
                    dlut[keys.astype(np.int64)] = codes.astype(np.int16)
                    self._lookup[L] = ("direct", dlut)
                else:
                    for mult in _HASH_MULTS:
                        with np.errstate(over="ignore"):
                            slots = ((keys * np.uint64(mult))
                                     >> np.uint64(48)).astype(np.int64)
                        if len(np.unique(slots)) == len(keys):
                            hkeys = np.zeros(65536, dtype=np.uint64)
                            hcodes = np.full(65536, -1, dtype=np.int16)
                            hkeys[slots] = keys
                            hcodes[slots] = codes.astype(np.int16)
                            self._lookup[L] = ("hash", hkeys, hcodes,
                                               np.uint64(mult))
                            break
                    else:
                        self._lookup[L] = ("sorted",)
        # combined prescreen: ONE uint8 bitmask LUT over 2-byte prefixes,
        # bit (L-2) set iff some length-L symbol starts with those 2 bytes —
        # match_all then pays a single O(n) gather instead of one per length
        self._lut2 = np.zeros(65536, dtype=np.uint8)
        for L, (keys, _, _) in self._by_len.items():
            if L >= 2:
                pref = (keys >> np.uint64((L - 2) * 8)).astype(np.int64)
                self._lut2[pref] |= np.uint8(1 << (L - 2))
        # second-stage prescreen for L>=4: bit (L-4) over symbol BYTES 2-3.
        # On text the first-2-bytes screen is weak for long symbols (common
        # bigrams start many length-8 symbols — measured 1.25M of 1.3M
        # positions passing), so requiring bytes 2-3 to also start some
        # symbol tail shrinks the candidate gather ~10x. Filtering only:
        # a true length-L match at i necessarily has bytes i+2..i+3 equal
        # to the symbol's bytes 2-3, so no match is ever screened out.
        self._lut2b = np.zeros(65536, dtype=np.uint8)
        for L, (keys, _, _) in self._by_len.items():
            if L >= 4:
                mid = ((keys >> np.uint64((L - 4) * 8))
                       & np.uint64(0xFFFF)).astype(np.int64)
                self._lut2b[mid] |= np.uint8(1 << (L - 4))

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        out += bytes(len(s) for s in self.symbols)
        for s in self.symbols:
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, buf, pos: int = 0) -> tuple["SymbolTable", int]:
        n = buf[pos]
        pos += 1
        lens = list(buf[pos:pos + n])
        pos += n
        symbols = []
        for ln in lens:
            symbols.append(bytes(buf[pos:pos + ln]))
            pos += ln
        return cls(symbols), pos

    def match_all(self, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Longest-match (length, code) at every position; len 0 = no match.

        Bandwidth-lean: one rolling key build, then ONE reused buffer shifted
        in place per length (descending), int8/uint8 result arrays — the
        kernels stay ALU-bound so they scale across many workers."""
        n = len(data)
        best_len = np.zeros(n, dtype=np.int8)
        best_code = np.zeros(n, dtype=np.uint8)
        if not self._by_len:
            return best_len, best_code
        g = _GramKeys(data)._key8  # unshifted; shifted per-candidate below
        lens_desc = sorted(self._by_len, reverse=True)
        masks = masks_b = None
        if any(L >= 2 for L in lens_desc):
            # 2-byte keys of every position (big-endian), built once, then
            # ONE bitmask gather covering every length's prescreen
            d16 = data.astype(np.uint16)
            data2 = np.empty(max(n - 1, 0), dtype=np.intp)
            if n > 1:
                np.left_shift(d16[:-1], 8, out=data2[:], casting="unsafe")
                data2 |= d16[1:]
            masks = self._lut2[data2]
            if any(L >= 4 for L in lens_desc) and n > 3:
                # bytes 2-3 screen: the same 2-byte key array shifted by 2
                masks_b = self._lut2b[data2[2:]]
        for L in lens_desc:  # longest first
            keys, codes, lut = self._by_len[L]
            m = n - L + 1
            # pre-screen: position can only match if its leading bytes start
            # some length-L symbol AND no longer match claimed it
            if L >= 2:
                cand = (masks[:m] & np.uint8(1 << (L - 2))).astype(bool)
                if L >= 4 and masks_b is not None:
                    cand &= (masks_b[:m]
                             & np.uint8(1 << (L - 4))).astype(bool)
            else:
                cand = lut[data[:m]]
            if L < 8:
                cand &= best_len[:m] == 0
            pos = np.flatnonzero(cand)
            if len(pos) == 0:
                continue
            # gather-then-convert: only candidate positions pay the
            # unaligned BE load + byteswap
            grams = g[pos].astype(np.uint64) >> np.uint64((8 - L) * 8)
            lk = self._lookup[L]
            if lk[0] == "direct":
                c = lk[1][grams.astype(np.int64)]
                hit = c >= 0
                hit_codes = c[hit]
            elif lk[0] == "hash":
                hkeys, hcodes, mult = lk[1], lk[2], lk[3]
                with np.errstate(over="ignore"):
                    slot = ((grams * mult) >> np.uint64(48)).astype(np.int64)
                c = hcodes[slot]
                hit = (hkeys[slot] == grams) & (c >= 0)
                hit_codes = c[hit]
            else:
                idx = np.searchsorted(keys, grams)
                np.minimum(idx, len(keys) - 1, out=idx)
                hit = keys[idx] == grams
                hit_codes = codes[idx[hit]]
            hp = pos[hit]
            best_len[hp] = L
            best_code[hp] = hit_codes.astype(np.uint8)
        return best_len, best_code


def _token_starts(best_len: np.ndarray) -> np.ndarray:
    """Greedy left-to-right token starts, block-parallelized.

    The scan is sequential in principle (each token's start depends on the
    previous token's length), but steps are <=8 bytes while blocks are 4096,
    so a walk always ENTERS the next block (never skips one). That allows a
    two-phase vectorized scheme, ~5x faster than the one-append-per-token
    Python loop (90 ms -> ~18 ms on a 1.3 MB stripe blob):

      1. walk all 8 possible entry offsets of every block CONCURRENTLY
         (one numpy gather per step over a (n_blocks x 8) frontier) to
         tabulate exit[block, offset] -> entry offset into the next block;
      2. chain the true entries through the exit table (n_blocks scalar
         steps), then re-walk every block from its single true entry, all
         blocks in parallel, marking visited positions in a bool mask.

    flatnonzero of the mask returns the starts in order. Exactness is
    pinned by tests against the reference loop."""
    n = len(best_len)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if not best_len.any():
        # no symbol matches anywhere (e.g. the empty table of build_table's
        # first iteration): every byte is its own token
        return np.arange(n, dtype=np.int64)
    steps = np.maximum(best_len, 1).astype(np.int64)
    BLOCK = 4096
    # the block-parallel walk amortizes only on large inputs: per phase
    # iteration it pays ~10 numpy ops over the whole frontier, and the
    # iteration count is the worst block's token count — below ~256 KB the
    # plain loop's ~160 ns/token wins (measured crossover)
    if n <= (1 << 18):
        out = []
        append = out.append
        st = steps.tolist()
        i = 0
        while i < n:
            append(i)
            i += st[i]
        return np.array(out, dtype=np.int64)
    # f[i] = next token start after a token at i (clamped into the pad)
    f = np.arange(n, dtype=np.int64) + steps
    n_blocks = -(-n // BLOCK)
    bounds = np.minimum(np.arange(1, n_blocks + 1) * BLOCK, n)
    # phase 1: from every (block, offset<8) candidate entry, walk to the
    # block's exit. All walkers advance together; finished ones freeze.
    cand = (np.arange(n_blocks)[:, None] * BLOCK
            + np.arange(8)[None, :]).ravel()
    np.minimum(cand, n - 1, out=cand)
    cur = cand.copy()
    bnd = np.repeat(bounds, 8)
    active = cur < bnd
    while active.any():
        nxt = f[cur[active]]
        cur[active] = nxt
        active = cur < bnd
    exits = cur  # (n_blocks*8,) first position >= block bound
    # phase 2a: chain true entries sequentially (n_blocks scalar steps)
    entries = np.empty(n_blocks, dtype=np.int64)
    e = 0
    ex = exits.reshape(n_blocks, 8)
    for b in range(n_blocks):
        entries[b] = e
        off = e - b * BLOCK
        e = int(ex[b, off]) if off < 8 else None
        if off >= 8:  # cannot happen: steps <= 8 < BLOCK
            raise AssertionError("token step exceeded block overlap")
    # phase 2b: re-walk every block from its true entry, marking visits
    is_start = np.zeros(n, dtype=bool)
    cur = entries.copy()
    active = cur < bounds
    while active.any():
        pos = cur[active]
        is_start[pos] = True
        cur[active] = f[pos]
        active = cur < bounds
    return np.flatnonzero(is_start).astype(np.int64)


def _greedy_encode(data: np.ndarray, table: SymbolTable) -> np.ndarray:
    """Emit code stream (escapes expanded) for ``data`` under ``table``.
    Token resolution: minimal sequential scan; byte emission: vectorized."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    best_len, best_code = table.match_all(data)
    starts = _token_starts(best_len)
    tok_len = best_len[starts]
    is_esc = tok_len == 0
    out_sizes = np.where(is_esc, 2, 1)
    offsets = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(out_sizes[:-1], out=offsets[1:])
    out = np.empty(int(out_sizes.sum()), dtype=np.uint8)
    out[offsets] = np.where(is_esc, ESCAPE, best_code[starts]).astype(np.uint8)
    esc_off = offsets[is_esc]
    out[esc_off + 1] = data[starts[is_esc]]
    return out


def _emitted_tokens(data: np.ndarray, table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of emitted tokens (symbol match or escape)."""
    best_len, _ = table.match_all(data)
    starts = _token_starts(best_len)
    lens = np.maximum(best_len[starts], 1)
    return starts, lens


def build_table(data: np.ndarray, sample: int = _SAMPLE) -> SymbolTable:
    """Deterministic iterative table construction on a bounded sample."""
    if len(data) > sample:
        # 8 contiguous chunks, evenly spaced, for representativeness
        n_chunks = 8
        chunk = sample // n_chunks
        stride = len(data) // n_chunks
        data = np.concatenate([data[i * stride:i * stride + chunk] for i in range(n_chunks)])
    table = SymbolTable([])
    if len(data) == 0:
        return table  # nothing to sample; the reference loop ends here too
    key8 = _GramKeys(data)._key8
    for _ in range(_ITERATIONS):
        starts, lens = _emitted_tokens(data, table)
        if len(starts) == 0:
            continue
        # candidate symbols = every emitted token + every adjacent-token
        # concatenation of <=8 bytes, scored by bytes covered. Instead of a
        # per-token Python dict over byte slices, each candidate is its
        # ZERO-PADDED 8-byte big-endian key + length: (key, len) ascending
        # orders exactly like the raw bytes (padding is zeros, and a
        # shorter symbol that is a prefix of a longer one shares the key,
        # where len breaks the tie the same way lexicographic order does),
        # so grouping + scoring + the deterministic (-gain, symbol)
        # tie-break all vectorize. Same candidates, same scores, same
        # table — pinned byte-exact by tests against the dict loop.
        lens64 = lens.astype(np.uint64)
        shift = (np.uint64(8) - lens64) * np.uint64(8)
        tok_keys = (key8[starts].astype(np.uint64) >> shift) << shift
        # greedy tokens are contiguous, so cat length = lens[j] + lens[j+1]
        cat_len = lens[:-1] + lens[1:]
        j = np.flatnonzero(cat_len <= MAX_LEN)
        clen64 = cat_len[j].astype(np.uint64)
        cshift = (np.uint64(8) - clen64) * np.uint64(8)
        cat_keys = (key8[starts[j]].astype(np.uint64) >> cshift) << cshift
        all_keys = np.concatenate([tok_keys, cat_keys])
        all_lens = np.concatenate([lens64, clen64])
        order = np.lexsort((all_lens, all_keys))
        ks, ls = all_keys[order], all_lens[order]
        new_run = np.ones(len(ks), dtype=bool)
        new_run[1:] = (ks[1:] != ks[:-1]) | (ls[1:] != ls[:-1])
        seg = np.flatnonzero(new_run)
        gains = np.add.reduceat(ls.astype(np.int64), seg)
        u_keys, u_lens = ks[seg], ls[seg]
        # gain = bytes covered (paper's freq*len); deterministic tie-break
        top = np.lexsort((u_lens, u_keys, -gains))[:MAX_SYMBOLS]
        table = SymbolTable([
            int(u_keys[i]).to_bytes(8, "big")[: int(u_lens[i])]
            for i in top])
    return table


def encode(blob: bytes) -> bytes:
    """Compress a byte blob: serialized table + code stream."""
    data = np.frombuffer(blob, dtype=np.uint8)
    table = build_table(data)
    codes = _greedy_encode(data, table)
    return table.serialize() + codes.tobytes()


def decode(buf, out_size: int) -> bytes:
    """Decompress to exactly ``out_size`` bytes (fully vectorized)."""
    table, pos = SymbolTable.deserialize(buf, 0)
    codes = np.frombuffer(buf, dtype=np.uint8, offset=pos)
    if out_size == 0:
        return b""
    # build (256, 8) symbol matrix + length vector
    mat = np.zeros((256, MAX_LEN), dtype=np.uint8)
    lens = np.zeros(256, dtype=np.int64)
    for c, s in enumerate(table.symbols):
        mat[c, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[c] = len(s)
    # escapes: code 255 followed by a literal byte. A literal byte may itself
    # be 255, but every maximal run of consecutive 255s starts with an escape,
    # so within a run the escapes sit at even offsets.
    pos255 = np.flatnonzero(codes == ESCAPE)
    if len(pos255):
        run_start_mask = np.diff(pos255, prepend=-2) != 1
        run_starts = pos255[run_start_mask]
        run_idx = np.cumsum(run_start_mask) - 1
        esc_pos = pos255[(pos255 - run_starts[run_idx]) % 2 == 0]
    else:
        esc_pos = pos255
    if len(esc_pos) and esc_pos[-1] + 1 >= len(codes):
        raise ValueError("FSST stream ends with a dangling escape")
    is_esc = np.zeros(len(codes), dtype=bool)
    is_esc[esc_pos] = True
    keep = np.ones(len(codes), dtype=bool)
    keep[esc_pos + 1] = False  # literal bytes are not tokens
    tok_codes = codes[keep].astype(np.int64)
    tok_is_esc = is_esc[keep]
    literals = codes[esc_pos + 1]
    out_lens = lens[tok_codes]
    out_lens[tok_is_esc] = 1
    rows = mat[tok_codes]
    if tok_is_esc.any():
        rows = rows.copy()
        rows[tok_is_esc, 0] = literals
    mask = np.arange(MAX_LEN) < out_lens[:, None]
    out = rows[mask]
    if len(out) != out_size:
        raise ValueError(f"FSST decode size mismatch: {len(out)} != {out_size}")
    return out.tobytes()
