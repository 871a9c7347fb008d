"""ctypes bridge to the standalone native zstd encoder
(csrc/compu_zstd_enc2.cpp) — the framework's second complete zstd
encoder implementation.

Reference parity: the reference reaches libzstd's compressor through one
adapter (src/encoder/zstd.rs:140-198); this framework ships the
multi-implementation pattern it uses for zlib/brotli on zstd as well:
the Python/JAX planner (encode.py, custom per-block tables, strategy
ladder, device stages) and this C++ encoder (hash-chain matcher,
RLE/custom/predefined sequence modes, 1/4-stream Huffman literals,
streaming xxh64) behind one Interface.
"""

from __future__ import annotations

import ctypes

from ...runtime import native
from ..base import CodecFailure


def available() -> bool:
    lib = native._load()
    return lib is not None and hasattr(lib, "compu_zstd2_new")


class NativeZstdStream:
    """One frame: blocks per compress_chunk call; window history, repeat
    offsets and the content checksum carry across calls in C++."""

    def __init__(self, level: int = 3, window_log: int = 21,
                 checksum: bool = True) -> None:
        self._lib = native._load()
        if self._lib is None or not hasattr(self._lib, "compu_zstd2_new"):
            raise RuntimeError("native zstd encoder unavailable")
        self._handle = self._lib.compu_zstd2_new(
            level, window_log, 1 if checksum else 0)
        if not self._handle:
            raise RuntimeError("zstd encoder init failed")

    def __del__(self):  # pragma: no cover - lifecycle
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            lib.compu_zstd2_free(h)
            self._handle = None

    def reset(self) -> None:
        self._lib.compu_zstd2_reset(self._handle)

    def header(self) -> bytes:
        return b""  # the frame header rides in the first compress_chunk

    def trailer(self) -> bytes:
        return b""  # closing block + checksum ride the final chunk

    def compress_chunk(self, data: bytes, final: bool) -> bytes:
        cap = max(len(data), 1) * 2 + (1 << 16)
        out = ctypes.create_string_buffer(cap)
        w = self._lib.compu_zstd2_run(
            self._handle, bytes(data), len(data), out, cap,
            1 if final else 0)
        if w < 0:
            raise CodecFailure(301, "zstd encode overflow")
        return out.raw[:w]
