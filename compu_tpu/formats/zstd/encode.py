"""Zstandard encoder (RFC 8878).

v1 strategy per 128 KiB block: LZ tokens from the shared data-parallel
matcher (formats/deflate/deflate_encode.tokenize — same hash-chain +
pointer-jump machinery, zstd just consumes (ll, offset, ml) triples),
Huffman-compressed literals (1- or 4-stream, raw fallback), sequences
FSE-coded with custom normalized tables (predefined fallback), RLE/raw
block fallbacks, optional xxhash64 content checksum.

Streams validated two ways in tests: decode-back by this package's own
decoder AND by the foreign `zstandard` (libzstd) oracle.
"""

from __future__ import annotations

import struct

import numpy as np

from ...ops.xxhash import xxh64
from ..base import CodecFailure
from ..deflate.deflate_encode import tokenize
from ..deflate.options import ZlibStrategy
from .fse import ForwardBitWriter, FseEncodeTable, write_norm_counts
from .huff import HufEncoder, normalize_counts
from . import tables as T

ZSTD_MAGIC = 0xFD2FB528
MAX_BLOCK = 128 * 1024


def _sequences_from_tokens(data, tok_pos, tok_len, tok_dist):
    """Collapse a token cover into zstd sequences (ll, offset, ml) plus the
    literal byte stream. Adjacent same-distance matches merge into one long
    sequence (the shared matcher caps matches at DEFLATE's 258; zstd match
    lengths are unbounded, so merging recovers long runs)."""
    lits = bytearray()
    seqs = []
    pending_lit = 0
    run_start = 0
    for p, l, d in zip(tok_pos, tok_len, tok_dist):
        if l == 0:
            if pending_lit == 0:
                run_start = p
            pending_lit += 1
        else:
            if (
                seqs
                and pending_lit == 0
                and seqs[-1][1] == int(d)
                and seqs[-1][2] + int(l) <= 131074  # ML code 52 ceiling
            ):
                seqs[-1] = (seqs[-1][0], seqs[-1][1], seqs[-1][2] + int(l))
            else:
                lits.extend(data[run_start : run_start + pending_lit])
                seqs.append((pending_lit, int(d), int(l)))
                pending_lit = 0
            run_start = p + l
    if pending_lit:
        lits.extend(data[run_start : run_start + pending_lit])
    return bytes(lits), seqs


def _literals_section(lits: bytes) -> bytes:
    """Literals section: huffman when profitable, else raw."""
    n = len(lits)
    if n >= 32:
        try:
            freqs = np.bincount(np.frombuffer(lits, np.uint8), minlength=256)
            enc = HufEncoder(freqs)
            desc = enc.describe()
            if n <= 1023:
                stream = enc.encode_stream(lits)
                payload = desc + stream
                comp = len(payload)
                if comp < n and comp <= 1023:
                    # size_format 00: single stream, 10+10 bits
                    b0 = 2 | (0 << 2) | ((n & 0xF) << 4)
                    b1 = (n >> 4) | ((comp & 3) << 6)
                    b2 = comp >> 2
                    return bytes([b0, b1, b2]) + payload
            else:
                per = (n + 3) // 4
                counts = [per, per, per, n - 3 * per]
                streams = []
                off = 0
                for c in counts:
                    streams.append(enc.encode_stream(lits[off : off + c]))
                    off += c
                jump = struct.pack(
                    "<HHH", len(streams[0]), len(streams[1]), len(streams[2])
                )
                payload = desc + jump + b"".join(streams)
                comp = len(payload)
                if comp < n:
                    if n <= 16383 and comp <= 16383:
                        # size_format 10: 14+14 bits
                        b0 = 2 | (2 << 2) | ((n & 0xF) << 4)
                        b1 = (n >> 4) & 0xFF
                        b2 = ((n >> 12) & 3) | ((comp & 0x3F) << 2)
                        b3 = (comp >> 6) & 0xFF
                        return bytes([b0, b1, b2, b3]) + payload
                    # size_format 11: 18+18 bits
                    b0 = 2 | (3 << 2) | ((n & 0xF) << 4)
                    b1 = (n >> 4) & 0xFF
                    b2 = ((n >> 12) & 0x3F) | ((comp & 3) << 6)
                    b3 = (comp >> 2) & 0xFF
                    b4 = (comp >> 10) & 0xFF
                    return bytes([b0, b1, b2, b3, b4]) + payload
        except CodecFailure:
            pass
    # Raw literals.
    if n < 32:
        if n <= 31:
            return bytes([0 | (0 << 2) | (n << 3)]) + lits
    if n <= 4095:
        b0 = 0 | (1 << 2) | ((n & 0xF) << 4)
        return bytes([b0, n >> 4]) + lits
    b0 = 0 | (3 << 2) | ((n & 0xF) << 4)
    return bytes([b0, (n >> 4) & 0xFF, (n >> 12) & 0xFF]) + lits


def _offset_code(offset_value: int) -> int:
    return offset_value.bit_length() - 1


class _SeqTable:
    """One sequence channel's chosen coding: RLE / predefined / custom."""

    def __init__(self, codes, default_dist, default_log, max_symbol, max_log):
        self.codes = codes
        uniq = set(codes)
        if len(uniq) == 1:
            self.mode = 1  # RLE
            self.header = bytes([codes[0]])
            self.enc = None
            return
        freqs = np.bincount(np.asarray(codes, dtype=np.int64), minlength=max_symbol + 1)
        norm, log = normalize_counts(freqs, len(codes), max_log)
        use_custom = norm is not None
        if use_custom:
            try:
                enc = FseEncodeTable(norm, log)
                header = write_norm_counts(norm, log)
            except CodecFailure:
                use_custom = False
        if use_custom and len(header) < 32:
            self.mode = 2
            self.header = header
            self.enc = enc
            return
        # Predefined fallback: valid only if every code is representable
        # with nonzero probability in the default distribution.
        ok = all(c < len(default_dist) and default_dist[c] != 0 for c in uniq)
        if not ok:
            # Force custom even if the header is large.
            if norm is None:
                raise CodecFailure(299, "cannot code sequence channel")
            self.mode = 2
            self.header = write_norm_counts(norm, log)
            self.enc = FseEncodeTable(norm, log)
            return
        self.mode = 0
        self.header = b""
        self.enc = FseEncodeTable(default_dist, default_log)


def _sequences_section(seqs) -> bytes:
    n = len(seqs)
    out = bytearray()
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append((n >> 8) + 128)
        out.append(n & 0xFF)
    else:
        out.append(255)
        out.append((n - 0x7F00) & 0xFF)
        out.append((n - 0x7F00) >> 8)
    if n == 0:
        return bytes(out)

    ll_codes = [T.ll_code(ll) for ll, _, _ in seqs]
    # Repeat-offset resolution: mirror the decoder's 3-slot history
    # (decode.py::_execute_sequences) so recent distances cost ~1 bit.
    of_values = []
    rep = [1, 4, 8]
    for ll, off, _ in seqs:
        if ll != 0:
            if off == rep[0]:
                val = 1
            elif off == rep[1]:
                val = 2
            elif off == rep[2]:
                val = 3
            else:
                val = off + 3
        else:
            if off == rep[1]:
                val = 1
            elif off == rep[2]:
                val = 2
            elif off == rep[0] - 1 and off > 0:
                val = 3
            else:
                val = off + 3
        of_values.append(val)
        # History update (identical to the decoder).
        if val > 3:
            rep = [off, rep[0], rep[1]]
        else:
            idx = val - 1 + (1 if ll == 0 else 0)
            if idx == 1:
                rep = [off, rep[0], rep[2]]
            elif idx >= 2:
                rep = [off, rep[0], rep[1]]
            # idx == 0: unchanged
    of_codes = [_offset_code(v) for v in of_values]
    ml_codes = [T.ml_code(ml) for _, _, ml in seqs]

    ll_t = _SeqTable(ll_codes, T.LL_DEFAULT_DIST, T.LL_DEFAULT_LOG, T.MAX_LL_SYMBOL, T.MAX_LL_LOG)
    of_t = _SeqTable(of_codes, T.OF_DEFAULT_DIST, T.OF_DEFAULT_LOG, T.MAX_OF_SYMBOL, T.MAX_OF_LOG)
    ml_t = _SeqTable(ml_codes, T.ML_DEFAULT_DIST, T.ML_DEFAULT_LOG, T.MAX_ML_SYMBOL, T.MAX_ML_LOG)
    out.append((ll_t.mode << 6) | (of_t.mode << 4) | (ml_t.mode << 2))
    out.extend(ll_t.header)
    out.extend(of_t.header)
    out.extend(ml_t.header)

    # Bitstream: ForwardBitWriter; push order is the exact reverse of the
    # decoder's read order (see decode.py::_execute_sequences).
    w = ForwardBitWriter()
    last = n - 1
    ll_state = ll_t.enc.init_state(ll_codes[last]) if ll_t.enc else None
    ml_state = ml_t.enc.init_state(ml_codes[last]) if ml_t.enc else None
    of_state = of_t.enc.init_state(of_codes[last]) if of_t.enc else None

    def push_extras(i):
        ll, off, ml = seqs[i]
        oc = of_codes[i]
        # reverse of read order (of_x, ml_x, ll_x) -> push ll, ml, of
        w.push(ll - int(T.LL_BASE[ll_codes[i]]), int(T.LL_BITS[ll_codes[i]]))
        w.push(ml - int(T.ML_BASE[ml_codes[i]]), int(T.ML_BITS[ml_codes[i]]))
        w.push(of_values[i] - (1 << oc), oc)

    push_extras(last)
    for i in range(last - 1, -1, -1):
        # Updates are read llu, mlu, ofu after seq i's extras; push reversed:
        # of, ml, ll updates first, then the extras of seq i.
        if of_t.enc:
            of_state = of_t.enc.encode(of_state, of_codes[i], w)
        if ml_t.enc:
            ml_state = ml_t.enc.encode(ml_state, ml_codes[i], w)
        if ll_t.enc:
            ll_state = ll_t.enc.encode(ll_state, ll_codes[i], w)
        push_extras(i)
    # Init-state flushes: decoder reads ll, of, ml first -> push ml, of, ll.
    if ml_t.enc:
        ml_t.enc.flush(ml_state, w)
    if of_t.enc:
        of_t.enc.flush(of_state, w)
    if ll_t.enc:
        ll_t.enc.flush(ll_state, w)
    out.extend(w.finish())
    return bytes(out)


def compress_block(data: bytes, level: int, max_dist: int = MAX_BLOCK,
                   tokenizer=None) -> bytes:
    """One zstd block body (compressed type), or raw/RLE when better.
    Returns the full block including its 3-byte header."""
    n = len(data)
    assert 0 < n <= MAX_BLOCK

    def header(btype, size, last=0):
        h = last | (btype << 1) | (size << 3)
        return struct.pack("<I", h)[:3]

    if data.count(data[0]) == n:  # RLE
        return header(1, n) + data[:1]

    arr = np.frombuffer(data, dtype=np.uint8)
    if tokenizer is not None:
        tok_pos, tok_len, tok_dist = tokenizer(data)
    else:
        strategy = ZlibStrategy.Default
        tok_pos, tok_len, tok_dist = tokenize(arr, min(level, 9), strategy, max_dist)
    lits, seqs = _sequences_from_tokens(arr, tok_pos, tok_len, tok_dist)
    try:
        body = _literals_section(lits) + _sequences_section(seqs)
    except CodecFailure:
        body = None
    if body is None or len(body) >= n:
        return header(0, n) + data
    return header(2, len(body)) + body


class ZstdStreamEncoder:
    """Frame-level streaming encoder (hooks for the pipeline backend)."""

    def __init__(self, level: int = 3, checksum: bool = True,
                 window_log: int = 17, device_lz: bool = False) -> None:
        self.level = level
        self.checksum = checksum
        self.window_log = window_log
        self.tokenizer = None
        if device_lz:
            from ..device_lz import DeviceTokenizer

            self.tokenizer = DeviceTokenizer(
                MAX_BLOCK, min((1 << window_log) - 1, MAX_BLOCK)
            )
        self.reset()

    def reset(self) -> None:
        self._hash_buf = bytearray()
        self._blocks: list[bytes] = []

    def header(self) -> bytes:
        fhd = 0
        if self.checksum:
            fhd |= 0x04
        # No content size (streaming), window descriptor present.
        exponent = self.window_log - 10
        wd = exponent << 3
        return struct.pack("<IBB", ZSTD_MAGIC, fhd, wd)

    def compress_chunk(self, data: bytes, final: bool) -> bytes:
        """Compress up to MAX_BLOCK bytes as one frame block."""
        out = bytearray()
        if self.checksum:
            self._hash_buf.extend(data)
        if not data:
            # Empty final block (raw, size 0).
            out.extend(struct.pack("<I", 1 | (0 << 1) | 0)[:3])
            return bytes(out)
        blob = compress_block(
            data, self.level,
            max_dist=min((1 << self.window_log) - 1, MAX_BLOCK),
            tokenizer=self.tokenizer,
        )
        if final:
            blob = bytes([blob[0] | 1]) + blob[1:]
        out.extend(blob)
        return bytes(out)

    def trailer(self) -> bytes:
        if self.checksum:
            return struct.pack("<I", xxh64(bytes(self._hash_buf)) & 0xFFFFFFFF)
        return b""
