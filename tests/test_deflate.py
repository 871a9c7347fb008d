"""DEFLATE format tests: golden foreign fixtures, cross-tool oracles,
levels and strategies — the oracle structure of the reference suite
(roundtrip + golden fixtures + cross-implementation validation)."""

import pathlib
import sys
import zlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import ByteVec, DecodeStatus, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions, ZlibStrategy

DATA = pathlib.Path(__file__).parent / "data"
ALICE = (DATA / "alice29.txt").read_bytes()
TINY = b"X" * 10 + b"Y" * 10


def decode_all(dec, blob):
    vec = ByteVec()
    result = dec.decode_vec_full(blob, vec)
    assert result.status is DecodeStatus.Finished, result
    return vec.data()


def encode_all(enc, data):
    vec = ByteVec()
    result = enc.encode_vec_full(data, vec, EncodeOp.Finish)
    assert result.status is EncodeStatus.Finished, result
    return vec.data()


# --------------------------------------------------------------------------
# Golden fixtures: foreign-produced streams must decode bit-exactly.
# --------------------------------------------------------------------------
@pytest.mark.parametrize(
    "fixture,plain",
    [
        ("alice29.txt.gz", "alice29.txt"),
        ("10x10y.gz", "10x10y"),
        ("alice29.txt.zz", "alice29.txt"),
        ("10x10y.zz", "10x10y"),
    ],
)
def test_golden_fixture(fixture, plain):
    dec = decoder.Interface.zlib(ZlibMode.Auto)
    assert decode_all(dec, (DATA / fixture).read_bytes()) == (DATA / plain).read_bytes()


def test_foreign_levels():
    dec = decoder.Interface.zlib(ZlibMode.Auto)
    for level in range(10):
        blob = zlib.compress(ALICE, level)
        assert decode_all(dec, blob) == ALICE
        dec.reset()


# --------------------------------------------------------------------------
# Cross-tool encode validation: stock zlib must accept our streams.
# --------------------------------------------------------------------------
@pytest.mark.parametrize("level", [0, 1, 4, 6, 9])
def test_zlib_accepts_our_zlib_stream(level):
    enc = encoder.Interface.zlib(ZlibOptions(mode=ZlibMode.Zlib, level=level))
    blob = encode_all(enc, ALICE)
    assert zlib.decompress(blob) == ALICE


@pytest.mark.parametrize("level", [1, 6, 9])
def test_zlib_accepts_our_gzip_stream(level):
    enc = encoder.Interface.zlib(ZlibOptions(mode=ZlibMode.Gzip, level=level))
    blob = encode_all(enc, ALICE)
    assert zlib.decompress(blob, wbits=31) == ALICE


def test_zlib_accepts_our_raw_stream():
    enc = encoder.Interface.zlib(ZlibOptions(mode=ZlibMode.Deflate))
    blob = encode_all(enc, ALICE)
    assert zlib.decompress(blob, wbits=-15) == ALICE


@pytest.mark.parametrize("strategy", list(ZlibStrategy))
def test_strategies_roundtrip(strategy):
    enc = encoder.Interface.zlib(ZlibOptions(strategy=strategy))
    dec = decoder.Interface.zlib()
    blob = encode_all(enc, ALICE)
    assert zlib.decompress(blob) == ALICE
    assert decode_all(dec, blob) == ALICE


def test_compression_ratio_budget():
    """Compressed size must stay within striking distance of the zlib
    wrappers (parity target: <= reference output; tracked while the
    optimal-parse pass lands)."""
    enc = encoder.Interface.zlib(ZlibOptions(level=9))
    blob = encode_all(enc, ALICE)
    assert len(blob) < len(ALICE) // 2
    assert len(blob) <= int(len(zlib.compress(ALICE, 9)) * 1.05)


def test_flush_then_continue():
    """Process/Flush mid-stream then continue: resulting stream stays valid
    (Z_SYNC_FLUSH semantics)."""
    enc = encoder.Interface.zlib(ZlibOptions())
    vec = ByteVec()
    half = len(ALICE) // 2
    r = enc.encode_vec_full(ALICE[:half], vec, EncodeOp.Flush)
    assert r.status is EncodeStatus.Continue
    r = enc.encode_vec_full(ALICE[half:], vec, EncodeOp.Finish)
    assert r.status is EncodeStatus.Finished
    assert zlib.decompress(vec.data()) == ALICE
    dec = decoder.Interface.zlib()
    assert decode_all(dec, vec.data()) == ALICE


def test_corrupt_stream_errors():
    enc = encoder.Interface.zlib(ZlibOptions())
    blob = bytearray(encode_all(enc, ALICE))
    # Corrupt the adler trailer.
    blob[-1] ^= 0xFF
    dec = decoder.Interface.zlib()
    vec = ByteVec()
    result = dec.decode_vec_full(bytes(blob), vec)
    assert result.is_error
    assert dec.describe_error(result.status) is not None


def test_bad_header_errors():
    dec = decoder.Interface.zlib(ZlibMode.Auto)
    vec = ByteVec()
    result = dec.decode_vec_full(b"\x00\x01not a stream", vec)
    assert result.is_error


def test_multi_block_window_refs():
    """Input larger than one pipeline block: window resets per block but the
    stream stays valid end-to-end."""
    data = (ALICE * 9)[: (1 << 20) + 131072]  # ~1.1 MiB, crosses block edge
    enc = encoder.Interface.zlib(ZlibOptions(level=6))
    blob = encode_all(enc, data)
    assert zlib.decompress(blob) == data
    dec = decoder.Interface.zlib()
    assert decode_all(dec, blob) == data
