"""Brotli format pipeline: streaming backend glue.

Plays the role of the reference's brotli adapter pairs
(src/encoder/brotli_c.rs, src/encoder/brotli.rs and decoder twins). Like
those backends, this one buffers internally and re-creates its state on
reset (the reference's brotli reset recreates the instance and re-applies
the stored options, src/encoder/brotli_c.rs:88-98).
"""

from __future__ import annotations

from ..base import DecoderBackend, EncoderBackend
from .decode import ERRORS, BrotliDecoderState
from .encode import BrotliStreamEncoder
from .options import BrotliOptions


class BrotliEncoder(EncoderBackend):
    name = "brotli"
    block_size = 1 << 20  # one meta-block per pipeline block

    def __init__(self, options: BrotliOptions | None = None) -> None:
        self.options = options or BrotliOptions()
        super().__init__()
        self._stream = BrotliStreamEncoder(
            quality=self.options.quality,
            window_bits=self.options.window_bits,
            device_lz=getattr(self.options, "device_lz", False),
            mode=self.options.mode,
        )

    def _header(self) -> bytes:
        return b""  # stream header rides in the first compress_chunk

    def _compress(self, data: bytes, final: bool) -> bytes:
        return self._stream.compress_chunk(data, final)

    def _flush_mark(self) -> bytes:
        # Meta-block boundaries already provide resume points; brotli has no
        # dedicated sync marker. (Bit remainder stays buffered.)
        return b""

    def _trailer(self) -> bytes:
        return b""  # the final empty meta-block is emitted by compress_chunk

    def _do_reset(self) -> None:
        self._stream.reset()


class NativeBrotliEncoder(BrotliEncoder):
    """Same format, the standalone native (C++) encoder — the second
    complete brotli encoder implementation behind the same Interface
    (reference pattern: the interchangeable brotli-C / rust-brotli
    ENCODERS, src/encoder/brotli_c.rs:42-50 vs brotli.rs:22-29). The
    whole encode path (hash-chain matcher, command planning, prefix-code
    construction, header serialization) runs in
    csrc/compu_brotli_enc2.cpp; options survive reset (the encoder
    re-applies quality/window on the C++ state)."""

    name = "brotli-native"

    def __init__(self, options: BrotliOptions | None = None) -> None:
        from .native_enc2 import NativeBrotliStream

        self.options = options or BrotliOptions()
        EncoderBackend.__init__(self)
        self._stream = NativeBrotliStream(
            quality=self.options.quality,
            window_bits=self.options.window_bits,
        )

    def _do_reset(self) -> None:
        self._stream.reset()


class BrotliDecoder(DecoderBackend):
    name = "brotli"
    ERRORS = ERRORS

    def __init__(self, options=None) -> None:
        del options  # decode side has no options (parity with reference)
        super().__init__()
        self._state = BrotliDecoderState()
        self._state.sink_budget = self.pending_high_water

    def _pump(self) -> None:
        consumed, finished = self._state.pump(self._staged, self._staged_pos)
        if self._state.sink:
            self._pending.extend(self._state.sink)
            self._state.sink = bytearray()
        self._staged_pos = consumed
        if finished:
            self._finished = True

    def _rebase_input(self, nbytes: int) -> None:
        self._state.bitpos -= 8 * nbytes

    def _do_reset(self) -> None:
        self._state = BrotliDecoderState()
        self._state.sink_budget = self.pending_high_water


class NativeBrotliDecoder(BrotliDecoder):
    """Same format, native (C++) meta-block decoder — the framework's
    second brotli implementation behind the same Interface (reference
    pattern: the interchangeable brotli-C / rust-brotli backends,
    src/decoder/brotli_c.rs:22-28 vs brotli.rs:20-26). The whole state
    machine (prefix codes, context maps, block switching, dictionary
    transforms) runs in csrc/compu_brotli.cpp."""

    name = "brotli-native"

    def __init__(self, options=None) -> None:
        from .native_decode import NativeBrotliState

        del options
        DecoderBackend.__init__(self)
        self._state = NativeBrotliState()
        self._state.sink_budget = self.pending_high_water

    def _do_reset(self) -> None:
        self._state._reset_stream()
        self._state.sink_budget = self.pending_high_water
