"""Growable byte vector with explicit capacity, mirroring the "caller
allocates" discipline of the reference API (reference: src/lib.rs:45 — "API
never allocates, only you allocate").

Python's ``bytearray`` hides its capacity, but the reference's driver styles
(``encode_vec`` writing only into *spare capacity*, ``*_vec_full`` growing via
``try_reserve_exact``) are part of the behavior contract and of the test
oracle, so we model capacity explicitly.
"""

from __future__ import annotations


class ByteVec:
    """A byte vector with separate length and capacity.

    ``data`` is the initialized prefix; ``spare_capacity`` is the writable
    region codecs fill (the analogue of Rust's ``Vec::spare_capacity_mut``).
    """

    __slots__ = ("_buf", "_len")

    def __init__(self, initial: bytes = b"") -> None:
        self._buf = bytearray(initial)
        self._len = len(initial)

    # -- capacity management -------------------------------------------------
    def __len__(self) -> int:
        return self._len

    @property
    def capacity(self) -> int:
        return len(self._buf)

    @property
    def spare(self) -> int:
        """Number of writable bytes after the initialized prefix."""
        return len(self._buf) - self._len

    def reserve_exact(self, additional: int) -> None:
        """Ensure at least ``additional`` bytes of spare capacity
        (analogue of ``try_reserve_exact``; allocation failure surfaces as
        ``MemoryError``, which is recoverable like ``TryReserveError``)."""
        need = self._len + additional - len(self._buf)
        if need > 0:
            self._buf.extend(b"\0" * need)

    def reserve(self, additional: int) -> None:
        self.reserve_exact(additional)

    # -- data access ---------------------------------------------------------
    def data(self) -> bytes:
        return bytes(self._buf[: self._len])

    def spare_capacity_mut(self) -> memoryview:
        return memoryview(self._buf)[self._len :]

    def set_len(self, new_len: int) -> None:
        if not 0 <= new_len <= len(self._buf):
            raise ValueError("set_len beyond capacity")
        self._len = new_len

    def add_len(self, delta: int) -> None:
        self.set_len(self._len + delta)

    def clear(self) -> None:
        self._len = 0

    def extend(self, data: bytes) -> None:
        self.reserve_exact(len(data))
        self._buf[self._len : self._len + len(data)] = data
        self._len += len(data)


class ChunkedSink:
    """``bytes::BufMut``-style chunk-lending output sink (reference:
    ``encode_buf``/``decode_buf``, encoder/mod.rs:276-308 /
    decoder/mod.rs:394-427).

    The codec writes directly into the sink's spare capacity via
    ``chunk_mut()`` (a mutable view of the current chunk's free bytes —
    chunks are non-contiguous, like a ``BufMut`` rope) and commits with
    ``advance_mut(n)``. No intermediate staging copy is involved, matching
    the reference's "only you allocate" discipline."""

    def __init__(self, chunk_size: int = 65_536) -> None:
        if chunk_size < 128:
            raise ValueError("chunk_size must be >= 128")
        self._chunk_size = chunk_size
        self._chunks: list[bytearray] = []
        self._fill: list[int] = []

    def chunk_mut(self) -> memoryview:
        """Mutable view of the current chunk's spare bytes (allocates a new
        chunk when the current one is full)."""
        if not self._chunks or self._fill[-1] == len(self._chunks[-1]):
            self._chunks.append(bytearray(self._chunk_size))
            self._fill.append(0)
        return memoryview(self._chunks[-1])[self._fill[-1] :]

    def advance_mut(self, n: int) -> None:
        if not self._chunks:
            if n:
                raise ValueError("advance_mut before chunk_mut")
            return
        if not 0 <= n <= len(self._chunks[-1]) - self._fill[-1]:
            raise ValueError("advance_mut beyond lent chunk")
        self._fill[-1] += n

    def __len__(self) -> int:
        return sum(self._fill)

    def chunks(self) -> list[bytes]:
        """The committed chunks, in order (non-contiguous by design)."""
        return [bytes(c[:f]) for c, f in zip(self._chunks, self._fill)]

    def data(self) -> bytes:
        return b"".join(self.chunks())
