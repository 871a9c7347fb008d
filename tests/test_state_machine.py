"""Roundtrip state-machine tests, mirroring the reference test harness:

* one-shot encode with NeedOutput finalization for header-dominated tiny
  inputs (tests/encoder.rs:10-40);
* Buffer-chunked encode byte-identical to one-shot (tests/encoder.rs:43-57);
* encode_vec_full byte-identical (tests/encoder.rs:61-66);
* decode: one-shot exact, partial-output restart, Buffer-chunked loop,
  decode_vec_full (tests/decoder.rs:21-77);
* Process -> Flush -> Finish(empty input) 3-op protocol with chunked decode
  asserting NeedInput between chunks (tests/encoder.rs:115-173).

Every registered format backend runs through the same oracle.
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import (
    Buffer,
    ByteVec,
    DecodeError,
    DecodeStatus,
    Detection,
    EncodeOp,
    EncodeStatus,
    decoder,
    encoder,
)

DATA_DIR = pathlib.Path(__file__).parent / "data"

TINY = b"X" * 10 + b"Y" * 10  # the reference's 10x10y fixture content


def load_corpus():
    alice = DATA_DIR / "alice29.txt"
    data = [TINY]
    if alice.exists():
        data.append(alice.read_bytes())
    return data


from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions


def _zlib_enc(mode, level=6):
    return lambda: encoder.Interface.zlib(ZlibOptions(mode=mode, level=level))


def _zlib_dec(mode):
    return lambda: decoder.Interface.zlib(mode)


# (name, encoder factory, decoder factory, expected detection of own output)
BACKENDS = [
    ("stored", encoder.Interface.stored, decoder.Interface.stored, Detection.Unknown),
    ("zlib", _zlib_enc(ZlibMode.Zlib), _zlib_dec(ZlibMode.Zlib), Detection.Zlib),
    ("gzip", _zlib_enc(ZlibMode.Gzip), _zlib_dec(ZlibMode.Gzip), Detection.Gzip),
    ("deflate-raw", _zlib_enc(ZlibMode.Deflate), _zlib_dec(ZlibMode.Deflate), Detection.Unknown),
    ("zlib-auto", _zlib_enc(ZlibMode.Zlib), _zlib_dec(ZlibMode.Auto), Detection.Zlib),
    ("gzip-auto", _zlib_enc(ZlibMode.Gzip), _zlib_dec(ZlibMode.Auto), Detection.Gzip),
    ("zstd", encoder.Interface.zstd, decoder.Interface.zstd, Detection.Zstd),
    ("brotli", encoder.Interface.brotli, decoder.Interface.brotli, Detection.Unknown),
]

# The native (C++) inflate backend runs the same oracle when the toolchain
# built it (the multi-backend pattern: same format, second implementation —
# reference src/decoder/zlib_ng.rs).
try:
    from compu_tpu.formats.deflate.native_inflate import native_inflate_available

    if native_inflate_available():
        def _zlib_native_dec(mode):
            return lambda: decoder.Interface.zlib_native(mode)

        BACKENDS += [
            ("zlib-native", _zlib_enc(ZlibMode.Zlib), _zlib_native_dec(ZlibMode.Zlib), Detection.Zlib),
            ("gzip-native", _zlib_enc(ZlibMode.Gzip), _zlib_native_dec(ZlibMode.Gzip), Detection.Gzip),
            ("auto-native", _zlib_enc(ZlibMode.Zlib), _zlib_native_dec(ZlibMode.Auto), Detection.Zlib),
        ]
except Exception:
    pass

# Device-backed deflate encoder through the same product Interface (VERDICT
# r1 item 4: the TPU path must be reachable via the vtable like any other
# backend). Small block size keeps the CPU-jit test fast; the invariants
# (chunked == one-shot, detection, reset-reuse) are block-size independent.
def _zlib_device_enc(mode):
    return lambda: encoder.Interface.zlib_device(
        ZlibOptions(mode=mode, level=6), block_size=1 << 15
    )

BACKENDS += [
    ("zlib-device", _zlib_device_enc(ZlibMode.Zlib), _zlib_dec(ZlibMode.Zlib), Detection.Zlib),
    ("gzip-device", _zlib_device_enc(ZlibMode.Gzip), _zlib_dec(ZlibMode.Gzip), Detection.Gzip),
]

# Native C++ deflate ENCODER through the same oracle (encoder half of the
# multi-backend pattern).
try:
    from compu_tpu.runtime.native import _load as _native_load

    if _native_load() is not None and hasattr(_native_load(), "compu_deflate_new"):
        def _zlib_native_enc(mode, level=6):
            return lambda: encoder.Interface.zlib_native(
                ZlibOptions(mode=mode, level=level)
            )

        BACKENDS += [
            ("zlib-cenc", _zlib_native_enc(ZlibMode.Zlib), _zlib_dec(ZlibMode.Zlib), Detection.Zlib),
            ("gzip-cenc", _zlib_native_enc(ZlibMode.Gzip), _zlib_dec(ZlibMode.Gzip), Detection.Gzip),
        ]
except Exception:
    pass


def roundtrip_case(enc, dec, data, expected_detection):
    """Port of the reference's encoder test_case driver."""
    # --- one-shot encode into a data-sized buffer ---
    compressed_buf = bytearray(len(data))
    result = enc.encode(data, compressed_buf, EncodeOp.Finish)
    assert result.input_remain == 0
    if result.status is EncodeStatus.NeedOutput:
        # Header-dominated tiny inputs: grow and finalize.
        extra = bytearray(len(data) + 4096)
        result2 = enc.encode(b"", extra, EncodeOp.Finish)
        assert result2.status is EncodeStatus.Finished
        compressed = bytes(compressed_buf) + bytes(extra[: len(extra) - result2.output_remain])
    else:
        assert result.status is EncodeStatus.Finished
        compressed = bytes(compressed_buf[: len(compressed_buf) - result.output_remain])

    assert Detection.detect(compressed) == expected_detection

    # --- one-shot decode ---
    out = bytearray(len(data))
    result = dec.decode(compressed, out)
    assert result.status is DecodeStatus.Finished
    assert result.input_remain == 0
    assert result.output_remain == 0
    assert bytes(out) == data

    # --- Buffer-chunked encode, byte-identical to one-shot ---
    assert enc.reset()
    buffer = Buffer(4096)
    chunked = bytearray()
    remaining = memoryview(data)
    while True:
        consumed, status = buffer.encode(enc, remaining, EncodeOp.Finish)
        remaining = remaining[consumed:]
        chunked.extend(buffer.data())
        buffer.consume()
        assert status.status is not EncodeStatus.Error
        if status.status is EncodeStatus.Finished:
            break
    assert bytes(chunked) == compressed, "chunked encode must equal one-shot"

    # --- encode_vec_full, byte-identical ---
    assert enc.reset()
    full = ByteVec()
    result = enc.encode_vec_full(data, full, EncodeOp.Finish)
    assert result.status is EncodeStatus.Finished
    assert result.input_remain == 0
    assert full.data() == compressed

    # --- Buffer-chunked decode ---
    assert dec.reset()
    buffer = Buffer(4096)
    decoded = bytearray()
    remaining = memoryview(compressed)
    while True:
        consumed, result = buffer.decode(dec, remaining)
        assert not result.is_error
        remaining = remaining[consumed:]
        decoded.extend(buffer.data())
        buffer.consume()
        if result.status is DecodeStatus.Finished:
            break
    assert bytes(decoded) == data

    # --- decode_vec_full ---
    assert dec.reset()
    vec = ByteVec()
    result = dec.decode_vec_full(compressed, vec)
    assert result.status is DecodeStatus.Finished
    assert result.input_remain == 0
    assert vec.data() == data

    assert enc.reset()
    assert dec.reset()
    return compressed


def partial_output_case(dec, data, compressed):
    """Port of the reference's decoder partial-buffer driver
    (tests/decoder.rs:33-43)."""
    out = bytearray(len(data))
    half = len(data) // 2
    result = dec.decode(compressed, memoryview(out)[:half])
    assert result.status is DecodeStatus.NeedOutput
    assert result.output_remain == 0
    remaining = compressed[len(compressed) - result.input_remain :]
    result = dec.decode(remaining, memoryview(out)[half:])
    assert result.status is DecodeStatus.Finished
    assert bytes(out) == data
    assert dec.reset()


def empty_final_case(enc, dec, data):
    """Port of the 3-op protocol driver (tests/encoder.rs:115-173)."""
    compressed = ByteVec()
    compressed.reserve_exact(len(data) + 4096)

    result = enc.encode_vec(data, compressed, EncodeOp.Process)
    assert result.status is not EncodeStatus.Error

    result = enc.encode_vec(b"", compressed, EncodeOp.Flush)
    assert result.input_remain == 0
    assert result.status is EncodeStatus.Continue

    compressed.reserve_exact(4096)
    result = enc.encode_vec(b"", compressed, EncodeOp.Finish)
    assert result.status is EncodeStatus.Finished

    blob = compressed.data()
    decoded = ByteVec()
    decoded.reserve_exact(len(data) + 100)
    chunk_size = max(1, len(blob) // 4)
    finished = False
    for idx in range(0, len(blob), chunk_size):
        chunk = blob[idx : idx + chunk_size]
        result = dec.decode_vec(chunk, decoded)
        assert result.input_remain == 0
        assert not result.is_error
        if result.status is DecodeStatus.Finished:
            finished = True
            break
        assert result.status is DecodeStatus.NeedInput
    assert finished
    assert decoded.data() == data
    assert enc.reset()
    assert dec.reset()


@pytest.mark.parametrize("name,make_enc,make_dec,detection", BACKENDS)
def test_roundtrip(name, make_enc, make_dec, detection):
    enc, dec = make_enc(), make_dec()
    for data in load_corpus():
        compressed = roundtrip_case(enc, dec, data, detection)
        partial_output_case(dec, data, compressed)


@pytest.mark.parametrize("name,make_enc,make_dec,detection", BACKENDS)
def test_empty_final(name, make_enc, make_dec, detection):
    enc, dec = make_enc(), make_dec()
    for data in load_corpus():
        empty_final_case(enc, dec, data)


@pytest.mark.parametrize("name,make_enc,make_dec,detection", BACKENDS)
def test_describe_error(name, make_enc, make_dec, detection):
    dec = make_dec()
    assert dec.describe_error(DecodeError.no_error()) is not None


@pytest.mark.parametrize("name,make_enc,make_dec,detection", BACKENDS)
def test_encode_buf_decode_buf(name, make_enc, make_dec, detection):
    """The bytes::BufMut chunked drivers (tests/encoder.rs:81-113)."""
    enc, dec = make_enc(), make_dec()
    for data in load_corpus():
        compressed = bytearray()
        result = enc.encode_buf(data, compressed, EncodeOp.Finish)
        assert result.status is EncodeStatus.Finished
        assert result.input_remain == 0
        decoded = bytearray()
        result = dec.decode_buf(bytes(compressed), decoded)
        assert result.status is DecodeStatus.Finished
        assert bytes(decoded) == data
        assert enc.reset()
        assert dec.reset()


def test_chunked_sink_bufmut_parity():
    """encode_buf/decode_buf write in place into a chunk-lending sink
    (the bytes::BufMut driver, reference tests/encoder.rs test_case_bytes)
    and the result is byte-identical to the bytearray fallback."""
    import compu_tpu as ct
    from compu_tpu import ChunkedSink, EncodeOp, EncodeStatus, DecodeStatus

    data = (DATA_DIR / "alice29.txt").read_bytes()
    enc = ct.encoder.Interface.zlib()
    sink = ChunkedSink(4096)
    res = enc.encode_buf(data, sink, EncodeOp.Finish)
    assert res.status is EncodeStatus.Finished and res.input_remain == 0
    assert len(sink.chunks()) > 1  # genuinely non-contiguous
    enc.reset()
    ba = bytearray()
    enc.encode_buf(data, ba, EncodeOp.Finish)
    assert sink.data() == bytes(ba)

    dec = ct.decoder.Interface.zlib()
    out = ChunkedSink(4096)
    res = dec.decode_buf(sink.data(), out)
    assert res.status is DecodeStatus.Finished
    assert out.data() == data
