"""Native (C++) zstd decoder: the second zstd decode implementation behind
the same Interface (reference pattern: src/decoder/zstd.rs reaching
libzstd). Mirrors the foreign-oracle + driver-style tests the Python
decoder passes, plus cross-implementation equivalence."""

import pathlib
import struct
import sys

import pytest
import zstandard

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import Buffer, ByteVec, DecodeStatus, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.zstd.native_decode import native_zstd_available
from compu_tpu.formats.zstd.options import ZstdDecodeOptions, ZstdOptions

pytestmark = pytest.mark.skipif(
    not native_zstd_available(), reason="native runtime unavailable"
)

DATA = pathlib.Path(__file__).parent / "data"
ALICE = (DATA / "alice29.txt").read_bytes()


def decode_all(dec, blob):
    vec = ByteVec()
    result = dec.decode_vec_full(blob, vec)
    assert result.status is DecodeStatus.Finished, result
    return vec.data()


@pytest.mark.parametrize("fixture,plain", [
    ("alice29.txt.zst", "alice29.txt"),
    ("10x10y.zst", "10x10y"),
])
def test_golden_fixture(fixture, plain):
    dec = decoder.Interface.zstd_native()
    assert decode_all(dec, (DATA / fixture).read_bytes()) == (DATA / plain).read_bytes()


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
@pytest.mark.parametrize("checksum", [False, True])
def test_foreign_levels(level, checksum):
    dec = decoder.Interface.zstd_native()
    blob = zstandard.ZstdCompressor(
        level=level, write_checksum=checksum).compress(ALICE)
    assert decode_all(dec, blob) == ALICE


def test_own_encoder_roundtrip():
    enc = encoder.Interface.zstd(ZstdOptions(level=3, checksum=True))
    vec = ByteVec()
    assert enc.encode_vec_full(ALICE, vec, EncodeOp.Finish).status is EncodeStatus.Finished
    dec = decoder.Interface.zstd_native()
    assert decode_all(dec, vec.data()) == ALICE


def test_one_shot_exact(tmp_path):
    blob = zstandard.ZstdCompressor(level=3).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    out = bytearray(len(ALICE))
    result = dec.decode(blob, out)
    assert result.status is DecodeStatus.Finished
    assert result.input_remain == 0 and result.output_remain == 0
    assert bytes(out) == ALICE


def test_partial_output_restart():
    blob = zstandard.ZstdCompressor(level=3).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    half = len(ALICE) // 2
    first = bytearray(half)
    result = dec.decode(blob, first)
    assert result.status is DecodeStatus.NeedOutput
    second = bytearray(len(ALICE) - half + 64)
    rest = blob[len(blob) - result.input_remain:]
    result = dec.decode(rest, second)
    assert result.status is DecodeStatus.Finished
    produced = len(second) - result.output_remain
    assert bytes(first) + bytes(second[:produced]) == ALICE


def test_buffer_chunked_driver():
    blob = zstandard.ZstdCompressor(level=3).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    buf = Buffer(4096)
    out = bytearray()
    inp = memoryview(blob)
    while True:
        consumed, result = buf.decode(dec, inp)
        out.extend(buf.data())
        buf.consume()
        inp = inp[consumed:]
        if result.status is DecodeStatus.Finished:
            break
        assert result.status in (DecodeStatus.NeedInput, DecodeStatus.NeedOutput)
    assert bytes(out) == ALICE


def test_chunked_input_feed():
    blob = zstandard.ZstdCompressor(level=19).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    vec = ByteVec()
    vec.reserve_exact(len(ALICE) + 1024)
    pos = 0
    while pos < len(blob):
        chunk = blob[pos: pos + 997]
        result = dec.decode_vec(chunk, vec)
        assert not result.is_error
        pos += len(chunk) - result.input_remain
        if result.status is DecodeStatus.Finished:
            break
        assert result.status in (DecodeStatus.NeedInput, DecodeStatus.NeedOutput)
    assert result.status is DecodeStatus.Finished
    assert vec.data() == ALICE


def test_reset_reuse():
    blob = zstandard.ZstdCompressor(level=3).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    assert decode_all(dec, blob) == ALICE
    assert dec.reset()
    assert decode_all(dec, blob) == ALICE


def test_matches_python_impl():
    """Cross-implementation oracle: both decoders accept the same streams
    and produce identical output (the reference's interchangeable-backend
    property, tests/decoder.rs:97-161)."""
    for level in (1, 9, 22):
        blob = zstandard.ZstdCompressor(level=level).compress(ALICE)
        a = decode_all(decoder.Interface.zstd(), blob)
        b = decode_all(decoder.Interface.zstd_native(), blob)
        assert a == b == ALICE


def test_skippable_frame_prefix():
    payload = b"\x50\x2a\x4d\x18" + struct.pack("<I", 5) + b"hello"
    blob = payload + zstandard.ZstdCompressor(level=3).compress(ALICE)
    dec = decoder.Interface.zstd_native()
    assert decode_all(dec, blob) == ALICE


def test_corrupt_magic_typed_error():
    dec = decoder.Interface.zstd_native()
    out = bytearray(64)
    result = dec.decode(b"\x00\x01\x02\x03\x04\x05\x06\x07", out)
    assert result.is_error
    assert dec.describe_error(result.status) == "invalid zstd magic"


def test_corrupt_checksum_typed_error():
    blob = bytearray(zstandard.ZstdCompressor(
        level=3, write_checksum=True).compress(ALICE))
    blob[-1] ^= 0xFF
    dec = decoder.Interface.zstd_native()
    out = bytearray(len(ALICE) + 64)
    result = dec.decode(bytes(blob), out)
    assert result.is_error
    assert dec.describe_error(result.status) == "content checksum mismatch"


def test_corrupt_body_typed_error():
    blob = bytearray(zstandard.ZstdCompressor(level=19).compress(ALICE))
    blob[len(blob) // 2] ^= 0xA5
    dec = decoder.Interface.zstd_native()
    out = bytearray(len(ALICE) + 64)
    result = dec.decode(bytes(blob), out)
    # either a typed decode error or (rarely) garbage that still parses —
    # but alice's fixture always trips a typed error in practice
    assert result.is_error
    assert dec.describe_error(result.status) is not None


def test_window_log_cap():
    blob = zstandard.ZstdCompressor(level=19).compress(ALICE)
    dec = decoder.Interface.zstd_native(ZstdDecodeOptions(window_log_max=10))
    out = bytearray(len(ALICE))
    result = dec.decode(blob, out)
    assert result.is_error
    assert dec.describe_error(result.status) == "window size beyond configured limit"
