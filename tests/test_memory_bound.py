"""Streaming memory is bounded: a large stream pushed through small caller
buffers must hold O(block + window) host memory, not O(stream) — the
reference operates in O(window) on unbounded streams (its state objects are
2-3 words + the native library's window, src/decoder/mod.rs:269-276).

Pins VERDICT r1 item 6: real ``input_remain`` back-pressure under Process,
compaction of consumed/drained prefixes, bounded decode windows."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import EncodeOp, EncodeStatus, DecodeStatus, decoder, encoder
from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions

TOTAL = 64 << 20  # 64 MiB logical stream
CHUNK = 64 << 10  # fed/drained through 64 KiB buffers


def _gen_chunk(i: int) -> bytes:
    # Compressible but non-constant (so blocks do real work).
    rng = np.random.default_rng(i)
    base = (b"record-%08d|" % i) * (CHUNK // 16)
    arr = np.frombuffer(base[:CHUNK], dtype=np.uint8).copy()
    idx = rng.integers(0, CHUNK, 64)
    arr[idx] = rng.integers(32, 127, 64, dtype=np.uint8)
    return arr.tobytes()


def _backend_bytes(backend) -> int:
    return len(backend._staged) + len(backend._pending)


def test_encoder_backpressure_and_bounded_buffers():
    enc = encoder.Interface.zlib(ZlibOptions(mode=ZlibMode.Gzip, level=1))
    backend = enc._backend
    out = bytearray(CHUNK)
    peak = 0
    produced = 0
    n_chunks = TOTAL // CHUNK
    for i in range(n_chunks):
        chunk = _gen_chunk(i)
        view = memoryview(chunk)
        while len(view):
            res = enc.encode(view, out, EncodeOp.Process)
            produced += CHUNK - res.output_remain
            view = view[len(view) - res.input_remain :]
            peak = max(peak, _backend_bytes(backend))
    while True:
        res = enc.encode(b"", out, EncodeOp.Finish)
        produced += CHUNK - res.output_remain
        if res.status is EncodeStatus.Finished:
            break
        assert res.status is EncodeStatus.NeedOutput
    peak = max(peak, _backend_bytes(backend))
    # O(block): staged < block_size, pending < high_water + one block's
    # compressed output. 4x block_size is a generous ceiling; O(stream)
    # would be 64 MiB.
    assert peak < 4 * backend.block_size, f"peak backend memory {peak}"
    assert produced > 0


def test_decoder_backpressure_and_bounded_buffers():
    # Build a 16 MiB gzip stream, then decode through 64 KiB buffers.
    import zlib as zmod

    total = 16 << 20
    raw = bytearray()
    comp = bytearray()
    c = zmod.compressobj(6, zmod.DEFLATED, 31)
    for i in range(total // CHUNK):
        chunk = _gen_chunk(i)
        raw.extend(chunk)
        comp.extend(c.compress(chunk))
    comp.extend(c.flush())

    dec = decoder.Interface.zlib(ZlibMode.Gzip)
    backend = dec._backend
    out = bytearray(CHUNK)
    got = 0
    peak = 0
    view = memoryview(bytes(comp))
    pos = 0
    while True:
        inp = view[pos : pos + CHUNK]
        res = dec.decode(inp, out)
        assert not res.is_error
        consumed = len(inp) - res.input_remain
        pos += consumed
        n = CHUNK - res.output_remain
        assert bytes(out[:n]) == bytes(raw[got : got + n])
        got += n
        peak = max(peak, _backend_bytes(backend))
        if res.status is DecodeStatus.Finished:
            break
        if res.status is DecodeStatus.NeedInput:
            assert pos < len(view), "decoder wants input past stream end"
    assert got == total
    # O(window + high_water), far below the 16 MiB stream.
    assert peak < 4 << 20, f"peak backend memory {peak}"
