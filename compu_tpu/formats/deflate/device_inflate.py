"""Foreign-stream device inflate: speculative-resync driver + streaming
backend (``decoder.Interface.zlib_device``).

Decodes ARBITRARY deflate/zlib/gzip streams (no side index) on device:

* host: framing headers, per-deflate-block header parse (bit-accurate),
  and the trivial sequential phase-composition walk;
* device: 15-bit LUT builds, the speculative 48-phase chunk scan
  (kernels/inflate_spec.py), and the stream-global expansion +
  back-reference resolution (window history crosses deflate blocks).

This closes the reference's third zlib decode implementation slot
(/root/reference/src/decoder/zlib_ng.rs:61-91 — a second full decoder
behind one vtable): zlib (pure Python) / zlib_native (C++) / zlib_device
(TPU) all run the same streaming state-machine contract.

Honest economics (docs/DEVICE_DECODE.md): the 48x speculation plus the
per-block sequential header discovery make this slower end-to-end than
the native host scan on a high-RTT device link; it exists for parity,
for the single-dispatch-per-16KiB wave structure, and as the foundation
for merge-retirement optimizations.
"""

from __future__ import annotations

import struct

import numpy as np

from ...ops import checksum
from ..base import CodecFailure, DecoderBackend
from . import consts
from .inflate import ERRORS
from .options import ZlibDecodeOptions, ZlibMode


def parse_block_header_at(data: bytes, bit: int):
    """Parse ONE deflate block header starting at absolute ``bit``.

    Returns (kind, lit_lens[288], dist_lens[30], body_bit, bfinal):
    288 includes the phantom fixed-tree symbols 286/287 — never emitted,
    but their 8-bit lengths shift every 9-bit code's canonical number
    (dropping them decoded all 9-bit literals +4).
    kind 0 = stored, 1 = fixed, 2 = dynamic; ``body_bit`` is the absolute
    bit where the block body (tokens / stored payload) starts. Raises
    CodecFailure on corruption, IndexError on truncation."""
    from ...ops.bitio import BitReader
    from ...ops.huffman import build_decode_table

    r = BitReader(bytearray(data), 0)
    r.bitpos = bit
    bfinal = r.read(1)
    btype = r.read(2)
    lit = np.zeros(288, dtype=np.int32)
    dist = np.zeros(30, dtype=np.int32)
    if btype == 3:
        raise CodecFailure(-3, "invalid block type")
    if btype == 0:
        return 0, lit, dist, r.bitpos, bfinal
    if btype == 1:
        lit[:288] = np.asarray(
            [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8, dtype=np.int32
        )
        dist[:] = 5
        return 1, lit, dist, r.bitpos, bfinal
    hlit = r.read(5) + 257
    hdist = r.read(5) + 1
    hclen = r.read(4) + 4
    if hlit > 286 or hdist > 30:
        raise CodecFailure(-3, "bad HLIT/HDIST")
    clen_lengths = np.zeros(19, dtype=np.int64)
    for i in range(hclen):
        clen_lengths[consts.CLEN_ORDER[i]] = r.read(3)
    cl_syms, cl_lens = build_decode_table(clen_lengths, 7)
    lengths = np.zeros(hlit + hdist, dtype=np.int64)
    i = 0
    while i < hlit + hdist:
        idx = r.peek(7)
        l = int(cl_lens[idx])
        if l == 0:
            raise CodecFailure(-3, "bad code-length code")
        sym = int(cl_syms[idx])
        r.skip(l)
        if sym < 16:
            lengths[i] = sym
            i += 1
        elif sym == 16:
            if i == 0:
                raise CodecFailure(-3, "repeat with no previous length")
            rep = 3 + r.read(2)
            lengths[i : i + rep] = lengths[i - 1]
            i += rep
        elif sym == 17:
            i += 3 + r.read(3)
        else:
            i += 11 + r.read(7)
    lit[:hlit] = lengths[:hlit]
    dist[:hdist] = lengths[hlit : hlit + hdist]
    return 2, lit, dist, r.bitpos, bfinal


class _Truncated(Exception):
    """Input ends before the stream completes (NeedInput)."""


def _pow2ceil(n: int, lo: int = 1 << 12) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def device_inflate_raw(data: bytes, start_bit: int):
    """Decode a COMPLETE raw-deflate stream starting at ``start_bit`` of
    ``data`` on device. Returns (out_bytes, end_bit). Raises _Truncated
    when the final block's EOB lies beyond the input, CodecFailure on
    corruption."""
    import jax.numpy as jnp

    from ...kernels.inflate_spec import (
        C,
        PHASES,
        RF,
        WAVE_CHUNKS,
        build_foreign_luts,
        make_comp12,
        resolve_foreign,
        spec_scan_wave,
    )

    total_bits = len(data) * 8
    comp_np = np.frombuffer(data, dtype=np.uint8)
    comp12 = make_comp12(comp_np)
    tb = jnp.int32(total_bits)

    bit = start_bit
    out_pos = 0
    tok_outlen: list[np.ndarray] = []
    tok_islit: list[np.ndarray] = []
    tok_payload: list[np.ndarray] = []
    tok_start: list[np.ndarray] = []
    stored_ranges: list[tuple[int, bytes]] = []

    while True:
        try:
            kind, lit, dist, body_bit, bfinal = parse_block_header_at(data, bit)
        except (IndexError, struct.error):
            raise _Truncated
        if body_bit > total_bits:
            raise _Truncated
        if kind == 0:
            byte = (body_bit + 7) // 8
            if byte + 4 > len(data):
                raise _Truncated
            ln, nln = struct.unpack_from("<HH", data, byte)
            if ln ^ nln != 0xFFFF:
                raise CodecFailure(-3, "stored LEN/NLEN mismatch")
            if byte + 4 + ln > len(data):
                raise _Truncated
            stored_ranges.append((out_pos, data[byte + 4 : byte + 4 + ln]))
            out_pos += ln
            bit = (byte + 4 + ln) * 8
        else:
            luts = build_foreign_luts(jnp.asarray(lit), jnp.asarray(dist))
            lit_lut, dist_lut = luts
            # wave loop: scan 16 KiB of compressed bits per dispatch until
            # the composed trajectory reaches this block's EOB
            wave_bit0 = body_bit
            phase = 0
            eob_bit = -1
            while eob_bit < 0:
                if wave_bit0 >= total_bits:
                    raise _Truncated
                exit_rel, eob_bits, flags, nrec, outb, t_rec = spec_scan_wave(
                    comp12, lit_lut, dist_lut, jnp.int32(wave_bit0), tb)
                exit_h = np.asarray(exit_rel)
                eob_h = np.asarray(eob_bits)
                flags_h = np.asarray(flags)
                true_lanes = []
                for k in range(WAVE_CHUNKS):
                    lane = k * PHASES + phase
                    # a lane whose chunk span may have read past the
                    # available bytes decoded garbage zeros — its verdict
                    # is unreliable: that is truncation, not corruption
                    span_end = wave_bit0 + (k + 1) * C + PHASES
                    if flags_h[lane] & 1 and int(eob_h[lane]) <= total_bits:
                        true_lanes.append(lane)
                        eob_bit = int(eob_h[lane])
                        break
                    if span_end > total_bits:
                        raise _Truncated
                    if flags_h[lane] & 2:
                        raise CodecFailure(-3, "invalid code in block body")
                    true_lanes.append(lane)
                    phase = int(exit_h[lane])
                # gather only the true lanes' records (device-side select)
                sel = jnp.asarray(np.asarray(true_lanes, np.int32))
                recs = np.asarray(jnp.take(t_rec, sel, axis=0))  # (k, RF)
                ol = (recs & 0x1FF).astype(np.int32)
                il = (recs >> 9) & 1
                pay = ((recs >> 10) & 0x7FFF).astype(np.int32)
                keep = ol > 0
                ol_f = ol[keep]
                if ol_f.size:
                    starts = out_pos + np.concatenate(
                        [[0], np.cumsum(ol_f)[:-1]])
                    tok_outlen.append(ol_f)
                    tok_islit.append(il[keep].astype(np.int32))
                    tok_payload.append(pay[keep])
                    tok_start.append(starts.astype(np.int64))
                    out_pos += int(ol_f.sum())
                wave_bit0 += WAVE_CHUNKS * C
            bit = eob_bit
        if bfinal:
            break
    total_out = out_pos

    if total_out == 0:
        return b"", bit
    NT = _pow2ceil(total_out)
    if tok_outlen:
        ol = np.concatenate(tok_outlen)
        il = np.concatenate(tok_islit)
        pay = np.concatenate(tok_payload)
        st = np.concatenate(tok_start)
        # window validity: distances must not reach before the stream start
        mi = ~(il.astype(bool))
        if np.any(st[mi] - (pay[mi] + 1) < 0):
            raise CodecFailure(-3, "distance too far back")
    else:
        ol = np.zeros(0, np.int32)
        il = np.zeros(0, np.int32)
        pay = np.zeros(0, np.int32)
        st = np.zeros(0, np.int64)
    T = _pow2ceil(max(len(ol), 1), lo=1 << 8)
    pad = T - len(ol)
    ol = np.concatenate([ol, np.zeros(pad, np.int32)])
    il = np.concatenate([il, np.zeros(pad, np.int32)])
    pay = np.concatenate([pay, np.zeros(pad, np.int32)])
    st = np.concatenate([st, np.zeros(pad, np.int64)])

    stored_out = np.zeros(NT, np.uint8)
    stored_mask = np.zeros(NT, bool)
    for off, blob in stored_ranges:
        stored_out[off : off + len(blob)] = np.frombuffer(blob, np.uint8)
        stored_mask[off : off + len(blob)] = True
    # padding positions past total_out resolve as stored zeros
    stored_mask[total_out:] = True

    import jax.numpy as jnp  # noqa: F811 (local alias for clarity)

    out, ok = resolve_foreign(
        jnp.asarray(ol), jnp.asarray(il), jnp.asarray(pay),
        jnp.asarray(st.astype(np.int32)),
        jnp.asarray(stored_out), jnp.asarray(stored_mask),
        total_out=NT,
    )
    if int(np.asarray(ok)[0]) != 1:
        raise CodecFailure(-3, "unresolved back-references")
    return np.asarray(out)[:total_out].tobytes(), bit


def _parse_gzip_header(data: bytes) -> int:
    """Return the byte offset where deflate data starts; raises _Truncated
    if the (variable-length) header is incomplete, CodecFailure if bad."""
    if len(data) < 10:
        raise _Truncated
    if data[0] != 0x1F or data[1] != 0x8B or data[2] != 8:
        raise CodecFailure(-3, "bad gzip magic/method")
    flg = data[3]
    pos = 10
    if flg & 4:  # FEXTRA
        if len(data) < pos + 2:
            raise _Truncated
        xlen = struct.unpack_from("<H", data, pos)[0]
        pos += 2 + xlen
    if flg & 8:  # FNAME
        end = data.find(b"\0", pos)
        if end < 0:
            raise _Truncated
        pos = end + 1
    if flg & 16:  # FCOMMENT
        end = data.find(b"\0", pos)
        if end < 0:
            raise _Truncated
        pos = end + 1
    if flg & 2:  # FHCRC
        pos += 2
    if len(data) < pos:
        raise _Truncated
    return pos


class DeviceDeflateDecoder(DecoderBackend):
    """Streaming zlib/gzip/deflate decoder running the foreign-stream
    speculative device inflate. Third implementation of the zlib decode
    slot behind the one Interface (reference: src/decoder/zlib_rust.rs —
    an alternate full decoder, same contract)."""

    name = "zlib-device"
    ERRORS = ERRORS

    def __init__(self, options: ZlibDecodeOptions | ZlibMode | None = None) -> None:
        if options is None:
            options = ZlibDecodeOptions()
        if isinstance(options, ZlibMode):
            options = ZlibDecodeOptions(mode=options)
        self.options = options
        super().__init__()

    def _pump(self) -> None:
        if self._finished:
            return
        data = bytes(self._staged[self._staged_pos :])
        if not data:
            return
        mode = self.options.mode
        try:
            if mode is ZlibMode.Auto:
                if len(data) >= 2 and data[0] == 0x1F and data[1] == 0x8B:
                    mode = ZlibMode.Gzip
                elif len(data) >= 2 and data[0] & 0x0F == 8 \
                        and ((data[0] << 8) | data[1]) % 31 == 0:
                    mode = ZlibMode.Zlib
                else:
                    mode = ZlibMode.Deflate
            if mode is ZlibMode.Gzip:
                body = _parse_gzip_header(data)
                out, end_bit = device_inflate_raw(data, body * 8)
                tail = (end_bit + 7) // 8
                if tail + 8 > len(data):
                    raise _Truncated
                crc, isize = struct.unpack_from("<II", data, tail)
                if checksum.crc32(out, 0) != crc:
                    raise CodecFailure(-3, "gzip crc mismatch")
                if isize != (len(out) & 0xFFFFFFFF):
                    raise CodecFailure(-3, "gzip isize mismatch")
                consumed = tail + 8
            elif mode is ZlibMode.Zlib:
                if len(data) < 2:
                    raise _Truncated
                cmf, flg = data[0], data[1]
                if cmf & 0x0F != 8 or ((cmf << 8) | flg) % 31 != 0:
                    raise CodecFailure(-3, "bad zlib header")
                out, end_bit = device_inflate_raw(data, 16)
                tail = (end_bit + 7) // 8
                if tail + 4 > len(data):
                    raise _Truncated
                adler = struct.unpack_from(">I", data, tail)[0]
                if checksum.adler32(out, 1) != adler:
                    raise CodecFailure(-3, "adler mismatch")
                consumed = tail + 4
            else:  # raw deflate
                out, end_bit = device_inflate_raw(data, 0)
                consumed = (end_bit + 7) // 8
        except _Truncated:
            return  # NeedInput: wait for more bytes, consume nothing
        except CodecFailure:
            raise
        self._pending.extend(out)
        self._staged_pos += consumed
        self._finished = True

    def _do_reset(self) -> None:
        pass
