"""DEFLATE format pipeline: framing + streaming backend glue.

Plays the role of the reference's zlib adapter pair
(src/encoder/zlib.rs:50-111, src/decoder/zlib.rs:59-126): maps the generic
Encoder/Decoder contract onto the deflate core, emitting/validating
zlib (RFC1950), gzip (RFC1952) or raw framing with rolling adler32/crc32.
"""

from __future__ import annotations

import struct

from ...ops import checksum
from ..base import CodecFailure, DecoderBackend, EncoderBackend
from .deflate_encode import DeflateStream
from .inflate import ERRORS, Inflate
from .options import ZlibDecodeOptions, ZlibMode, ZlibOptions


class DeflateEncoder(EncoderBackend):
    """Streaming deflate/zlib/gzip encoder backend.

    Matches never cross the 1 MiB pipeline block boundary (window reset per
    block), making self-produced streams block-parallel decodable; the
    format stays fully RFC-compliant for any inflate.
    """

    name = "zlib"
    block_size = 1 << 20

    def __init__(self, options: ZlibOptions | None = None) -> None:
        self.options = options or ZlibOptions()
        super().__init__()
        self._stream = DeflateStream(
            self.options.level, self.options.strategy,
            mem_level=self.options.mem_level,
        )
        self._init_checksums()

    def _init_checksums(self) -> None:
        self._adler = 1
        self._crc = 0
        self._isize = 0

    def _header(self) -> bytes:
        mode = self.options.mode
        if mode is ZlibMode.Zlib:
            cmf = 0x78  # method 8, 32 KiB window
            flevel = (0, 0, 0, 1, 1, 1, 2, 2, 3, 3)[self.options.level]
            flg = flevel << 6
            fcheck = (31 - ((cmf << 8 | flg) % 31)) % 31
            return bytes([cmf, flg | fcheck])
        if mode is ZlibMode.Gzip:
            xfl = 2 if self.options.level >= 9 else (4 if self.options.level <= 2 else 0)
            # mtime 0 keeps chunked == one-shot deterministic.
            return struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, 0, 0, xfl, 255)
        return b""

    def _compress(self, data: bytes, final: bool) -> bytes:
        mode = self.options.mode
        if mode is ZlibMode.Zlib:
            self._adler = checksum.adler32(data, self._adler)
        elif mode is ZlibMode.Gzip:
            self._crc = checksum.crc32(data, self._crc)
            self._isize += len(data)
        return self._stream.compress(data, final)

    def _flush_mark(self) -> bytes:
        return self._stream.sync_flush()

    def _trailer(self) -> bytes:
        out = bytearray(self._stream.align())
        mode = self.options.mode
        if mode is ZlibMode.Zlib:
            out.extend(struct.pack(">I", self._adler))
        elif mode is ZlibMode.Gzip:
            out.extend(struct.pack("<II", self._crc, self._isize & 0xFFFFFFFF))
        return bytes(out)

    def _do_reset(self) -> None:
        self._stream.reset()
        self._init_checksums()


class DeflateDecoder(DecoderBackend):
    """Streaming inflate backend accepting foreign streams bit-exactly."""

    name = "zlib"
    ERRORS = ERRORS

    def __init__(self, options: ZlibDecodeOptions | ZlibMode | None = None) -> None:
        if options is None:
            options = ZlibDecodeOptions()
        if isinstance(options, ZlibMode):
            options = ZlibDecodeOptions(mode=options)
        self.options = options
        super().__init__()
        self._inflate = Inflate(self.options.mode)
        self._inflate.sink_budget = self.pending_high_water

    def _pump(self) -> None:
        try:
            consumed, finished = self._inflate.pump(self._staged, self._staged_pos)
        except CodecFailure:
            raise
        if self._inflate.sink:
            self._pending.extend(self._inflate.sink)
            self._inflate.sink = bytearray()
        self._staged_pos = consumed
        if finished:
            self._finished = True

    def _rebase_input(self, nbytes: int) -> None:
        # The inflate core keeps an absolute bit cursor into the staged
        # buffer; shift it when the backend drops the consumed prefix.
        self._inflate.bitpos -= 8 * nbytes

    def _do_reset(self) -> None:
        self._inflate = Inflate(self.options.mode)
        self._inflate.sink_budget = self.pending_high_water


class NativeDeflateDecoder(DeflateDecoder):
    """Same format, native (C++) deflate hot loop — the framework's zlib-ng
    analogue: a second implementation of one format behind the same
    Interface (reference pattern: src/decoder/zlib.rs vs zlib_ng.rs).
    Framing + checksums stay in Python (formats/deflate/native_inflate.py);
    raw deflate blocks decode in csrc/compu_inflate.cpp."""

    name = "zlib-native"

    def __init__(self, options: ZlibDecodeOptions | ZlibMode | None = None) -> None:
        from .native_inflate import NativeInflate

        if options is None:
            options = ZlibDecodeOptions()
        if isinstance(options, ZlibMode):
            options = ZlibDecodeOptions(mode=options)
        self.options = options
        DecoderBackend.__init__(self)
        self._inflate = NativeInflate(self.options.mode)
        self._inflate.sink_budget = self.pending_high_water

    def _rebase_input(self, nbytes: int) -> None:
        self._inflate.pos -= nbytes

    def _do_reset(self) -> None:
        self._inflate._reset_stream()
        self._inflate.sink_budget = self.pending_high_water
