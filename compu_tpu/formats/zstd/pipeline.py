"""zstd format pipeline: streaming backend glue.

Plays the role of the reference's zstd adapter pair
(src/encoder/zstd.rs:140-210, src/decoder/zstd.rs:81-164): maps the
generic Encoder/Decoder contract onto the frame codec.
"""

from __future__ import annotations

from ..base import DecoderBackend, EncoderBackend
from .decode import ERRORS, ZstdFrameDecoder
from .encode import MAX_BLOCK, ZstdStreamEncoder
from .options import ZstdDecodeOptions, ZstdOptions


class ZstdEncoder(EncoderBackend):
    name = "zstd"
    block_size = MAX_BLOCK  # zstd's maximum block content size

    def __init__(self, options: ZstdOptions | None = None) -> None:
        self.options = options or ZstdOptions()
        super().__init__()
        self._stream = ZstdStreamEncoder(
            level=self.options.level,
            checksum=self.options.checksum,
            window_log=self.options.window_log,
            device_lz=getattr(self.options, "device_lz", False),
            strategy=self.options.strategy,
            device_literals=getattr(self.options, "device_literals", False),
            device_sequences=getattr(self.options, "device_sequences", False),
        )
        if self._stream.tokenizer is not None:
            # Stage 8 frame blocks per device-tokenizer call: one transfer
            # round trip per MiB instead of per 128 KiB (frame blocks stay
            # <= MAX_BLOCK; compress_chunk slices the token cover).
            self.block_size = self._stream.tokenizer_span

    def _header(self) -> bytes:
        return self._stream.header()

    def _compress(self, data: bytes, final: bool) -> bytes:
        return self._stream.compress_chunk(data, final)

    def _flush_mark(self) -> bytes:
        # Block boundaries are already byte-aligned resume points in zstd;
        # nothing extra to emit.
        return b""

    def _trailer(self) -> bytes:
        return self._stream.trailer()

    def _do_reset(self) -> None:
        self._stream.reset()


class NativeZstdEncoder(ZstdEncoder):
    """Same format, the standalone native (C++) encoder — a second
    complete zstd encoder implementation behind the same Interface
    (csrc/compu_zstd_enc2.cpp: hash-chain matcher, repeat offsets,
    RLE/custom/predefined FSE sequence modes, 1/4-stream Huffman
    literals with direct or FSE weight descriptions, RLE/raw block
    fallbacks, streaming xxh64). Mirrors the multi-impl pattern the
    reference ships for zlib (zlib vs zlib-ng vs zlib-rs)."""

    name = "zstd-native"

    def __init__(self, options: ZstdOptions | None = None) -> None:
        from .native_enc2 import NativeZstdStream

        self.options = options or ZstdOptions()
        EncoderBackend.__init__(self)
        self._stream = NativeZstdStream(
            level=self.options.level,
            window_log=self.options.window_log,
            checksum=self.options.checksum,
        )

    def _do_reset(self) -> None:
        self._stream.reset()


class ZstdDecoder(DecoderBackend):
    name = "zstd"
    ERRORS = ERRORS

    def __init__(self, options: ZstdDecodeOptions | None = None) -> None:
        self.options = options or ZstdDecodeOptions()
        super().__init__()
        self._frame = ZstdFrameDecoder(
            window_log_max=self.options.window_log_max,
            device_literals=getattr(self.options, "device_literals", False))
        self._frame.sink_budget = self.pending_high_water

    def _pump(self) -> None:
        consumed, finished = self._frame.pump(self._staged, self._staged_pos)
        if self._frame.sink:
            self._pending.extend(self._frame.sink)
            self._frame.sink = bytearray()
        self._staged_pos = consumed
        if finished:
            self._finished = True

    def _rebase_input(self, nbytes: int) -> None:
        self._frame.pos -= nbytes

    def _do_reset(self) -> None:
        self._frame = ZstdFrameDecoder(
            window_log_max=self.options.window_log_max,
            device_literals=getattr(self.options, "device_literals", False))
        self._frame.sink_budget = self.pending_high_water


class NativeZstdDecoder(ZstdDecoder):
    """Same format, native (C++) frame decoder — the framework's libzstd
    analogue: a second implementation of zstd decode behind the same
    Interface (reference pattern: src/decoder/zstd.rs reaching libzstd's
    ZSTD_decompressStream). The whole state machine (entropy tables,
    sequences, window, xxh64) runs in csrc/compu_zstd.cpp."""

    name = "zstd-native"

    def __init__(self, options: ZstdDecodeOptions | None = None) -> None:
        from .native_decode import NativeZstdFrame

        self.options = options or ZstdDecodeOptions()
        DecoderBackend.__init__(self)
        self._frame = NativeZstdFrame(window_log_max=self.options.window_log_max)
        self._frame.sink_budget = self.pending_high_water

    def _rebase_input(self, nbytes: int) -> None:
        self._frame.pos -= nbytes

    def _do_reset(self) -> None:
        self._frame._reset_stream()
        self._frame.sink_budget = self.pending_high_water
