"""Native-backed streaming inflate: framing in Python, the raw-deflate hot
loop in C++ (csrc/compu_inflate.cpp).

This is the framework's analogue of the reference's zlib-ng backend — a
second, faster implementation of the SAME format behind the same decoder
Interface (the multi-backend vtable pattern, /root/reference/src/decoder/
zlib.rs vs zlib_ng.rs vs zlib_rust.rs). The pure-Python Inflate
(inflate.py) remains the reference implementation and the fallback when no
native toolchain exists.
"""

from __future__ import annotations

import ctypes
import struct

from ...ops import checksum
from ...runtime import native
from ..base import CodecFailure
from .inflate import (
    ERR_CHECKSUM,
    ERR_HEADER,
    ERR_LENGTH_MISMATCH,
    ERR_TRAILING,
    ERRORS,
)
from .options import ZlibMode

# C++ status codes (csrc/compu_inflate.cpp)
_NEED_INPUT, _NEED_OUTPUT, _DONE = 0, 1, 2
_CPP_ERRORS = {-1: 102, -2: 103, -3: 104, -4: 105, -5: 106}


def native_inflate_available() -> bool:
    lib = native._load()
    return lib is not None and hasattr(lib, "compu_inflate_new")


class NativeInflate:
    """Drop-in for :class:`Inflate` (same pump/sink/sink_budget protocol),
    raw-deflate decoding delegated to the native state machine."""

    SCRATCH = 1 << 20  # per-run native output burst

    def __init__(self, mode: ZlibMode = ZlibMode.Auto) -> None:
        self._lib = native._load()
        if self._lib is None or not hasattr(self._lib, "compu_inflate_new"):
            raise RuntimeError("native inflate unavailable")
        self.mode = mode
        self.sink = bytearray()
        self._handle = self._lib.compu_inflate_new()
        self._scratch = ctypes.create_string_buffer(self.SCRATCH)
        self._reset_stream()

    def __del__(self):  # pragma: no cover - lifecycle
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            lib.compu_inflate_free(h)
            self._handle = None

    def _reset_stream(self) -> None:
        self.phase = "frame_header"
        self.pos = 0  # absolute byte offset into the staged buffer
        self.framing = None
        self.sink_budget = None
        self.adler = 1
        self.crc = 0
        self.out_count = 0
        self._lib.compu_inflate_reset(self._handle)

    # -- framing ------------------------------------------------------------
    def _parse_frame_header(self, staged) -> bool:
        """Returns True when the header is complete; False = need input."""
        mode = self.mode
        avail = len(staged) - self.pos
        if mode is ZlibMode.Auto:
            if avail < 2:
                return False
            b0, b1 = staged[self.pos], staged[self.pos + 1]
            if b0 == 0x1F and b1 == 0x8B:
                mode = ZlibMode.Gzip
            elif ((b0 << 8) | b1) % 31 == 0 and (b0 & 0x0F) == 8 and (b0 >> 4) <= 7:
                mode = ZlibMode.Zlib
            else:
                raise CodecFailure(ERR_HEADER, ERRORS[ERR_HEADER])
        if mode is ZlibMode.Deflate:
            self.framing = "raw"
            return True
        if mode is ZlibMode.Zlib:
            if avail < 2:
                return False
            cmf, flg = staged[self.pos], staged[self.pos + 1]
            if ((cmf << 8) | flg) % 31 != 0 or (cmf & 0x0F) != 8 or (cmf >> 4) > 7:
                raise CodecFailure(ERR_HEADER, ERRORS[ERR_HEADER])
            if flg & 0x20:
                raise CodecFailure(108, ERRORS[108])
            self.pos += 2
            self.framing = "zlib"
            return True
        # gzip
        if avail < 10:
            return False
        p = self.pos
        magic0, magic1, method, flags = staged[p], staged[p + 1], staged[p + 2], staged[p + 3]
        if magic0 != 0x1F or magic1 != 0x8B or method != 8 or flags & 0xE0:
            raise CodecFailure(ERR_HEADER, ERRORS[ERR_HEADER])
        p += 10
        if flags & 0x04:  # FEXTRA
            if len(staged) - p < 2:
                return False
            xlen = staged[p] | (staged[p + 1] << 8)
            if len(staged) - p < 2 + xlen:
                return False
            p += 2 + xlen
        for bit in (0x08, 0x10):  # FNAME, FCOMMENT: NUL-terminated
            if flags & bit:
                end = staged.find(b"\x00", p) if hasattr(staged, "find") else bytes(staged).find(b"\x00", p)
                if end < 0:
                    return False
                p = end + 1
        if flags & 0x02:  # FHCRC
            if len(staged) - p < 2:
                return False
            p += 2
        self.pos = p
        self.framing = "gzip"
        return True

    # -- main pump ------------------------------------------------------------
    def pump(self, staged, pos: int):
        del pos
        while True:
            if self.phase == "frame_header":
                if not self._parse_frame_header(staged):
                    return self.pos, False
                self.phase = "deflate"
            if self.phase == "deflate":
                if (self.sink_budget is not None
                        and len(self.sink) >= self.sink_budget):
                    return self.pos, False
                # Bounded input view: a full bytes() of the remaining
                # suffix would cost O(remaining) per ~1 MiB burst (O(n^2)
                # total); a from_buffer zero-copy view pins the bytearray
                # against the backend's extend/compact resizes. Capping the
                # copy at 2x the scratch keeps total copying O(n) — a
                # truncated view just reports NEED_INPUT at its end, which
                # is a resumable state.
                remaining = min(len(staged) - self.pos, 2 * self.SCRATCH)
                view = bytes(memoryview(staged)[self.pos:self.pos + remaining])
                arr = (ctypes.c_ubyte * remaining).from_buffer_copy(view) \
                    if remaining else (ctypes.c_ubyte * 0)()
                consumed = ctypes.c_size_t(0)
                written = ctypes.c_size_t(0)
                st = self._lib.compu_inflate_run(
                    self._handle,
                    ctypes.cast(arr, ctypes.POINTER(ctypes.c_ubyte)),
                    remaining,
                    self._scratch, self.SCRATCH,
                    ctypes.byref(consumed), ctypes.byref(written),
                )
                if written.value:
                    out = self._scratch.raw[: written.value]
                    self.sink.extend(out)
                    self.out_count += written.value
                    if self.framing == "zlib":
                        self.adler = checksum.adler32(out, self.adler)
                    elif self.framing == "gzip":
                        self.crc = checksum.crc32(out, self.crc)
                self.pos += consumed.value
                if st < 0:
                    code = _CPP_ERRORS.get(st, 105)
                    raise CodecFailure(code, ERRORS.get(code, "corrupt stream"))
                if st == _DONE:
                    self.phase = "trailer"
                    continue
                if st == _NEED_OUTPUT:
                    continue  # scratch drained into sink; run again
                if remaining < len(staged) - self.pos and consumed.value:
                    continue  # NEED_INPUT from the bounded view, not the stream
                return self.pos, False  # NEED_INPUT
            if self.phase == "trailer":
                avail = len(staged) - self.pos
                if self.framing == "zlib":
                    if avail < 4:
                        return self.pos, False
                    (want,) = struct.unpack_from(">I", bytes(staged[self.pos:self.pos + 4]))
                    if want != self.adler & 0xFFFFFFFF:
                        raise CodecFailure(ERR_CHECKSUM, ERRORS[ERR_CHECKSUM])
                    self.pos += 4
                elif self.framing == "gzip":
                    if avail < 8:
                        return self.pos, False
                    want_crc, want_len = struct.unpack_from(
                        "<II", bytes(staged[self.pos:self.pos + 8])
                    )
                    if want_crc != self.crc & 0xFFFFFFFF:
                        raise CodecFailure(ERR_CHECKSUM, ERRORS[ERR_CHECKSUM])
                    if want_len != self.out_count & 0xFFFFFFFF:
                        raise CodecFailure(
                            ERR_LENGTH_MISMATCH, ERRORS[ERR_LENGTH_MISMATCH]
                        )
                    self.pos += 8
                self.phase = "done"
            if self.phase == "done":
                return self.pos, True
