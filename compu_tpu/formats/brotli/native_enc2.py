"""ctypes bridge to the standalone native brotli encoder
(csrc/compu_brotli_enc2.cpp) — the framework's SECOND complete brotli
encoder implementation.

Reference parity: the reference ships two interchangeable brotli encoders
behind one vtable (pure-Rust src/encoder/brotli.rs:22-29 vs C
src/encoder/brotli_c.rs:42-50); here the Python/JAX meta-block planner
(encode.py) is one implementation and this native hash-chain encoder is
the other, registered as ``encoder.Interface.brotli_native``.
"""

from __future__ import annotations

import ctypes

from ...runtime import native
from ..base import CodecFailure


def available() -> bool:
    lib = native._load()
    return lib is not None and hasattr(lib, "compu_brenc2_new")


class NativeBrotliStream:
    """One stream: one meta-block per compress_chunk call; the distance
    ring, window history and bit phase carry across calls in C++."""

    def __init__(self, quality: int = 9, window_bits: int = 22) -> None:
        self._lib = native._load()
        if self._lib is None or not hasattr(self._lib, "compu_brenc2_new"):
            raise RuntimeError("native brotli encoder unavailable")
        self.quality = quality
        self.window_bits = window_bits
        self._handle = self._lib.compu_brenc2_new(quality, window_bits)
        if not self._handle:
            raise RuntimeError("brotli encoder init failed")

    def __del__(self):  # pragma: no cover - lifecycle
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            lib.compu_brenc2_free(h)
            self._handle = None

    def reset(self) -> None:
        self._lib.compu_brenc2_reset(self._handle)

    def compress_chunk(self, data: bytes, final: bool) -> bytes:
        cap = max(len(data), 1) * 2 + (1 << 16)
        out = ctypes.create_string_buffer(cap)
        w = self._lib.compu_brenc2_run(
            self._handle, bytes(data), len(data), out, cap, 1 if final else 0
        )
        if w < 0:
            raise CodecFailure(401, "brotli encode overflow")
        return out.raw[:w]
