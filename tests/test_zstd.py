"""zstd format tests: foreign-stream golden fixtures + the libzstd oracle
in both directions, plus entropy-stage unit roundtrips."""

import pathlib
import sys

import numpy as np
import pytest
import zstandard

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import ByteVec, DecodeStatus, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.zstd.options import ZstdDecodeOptions, ZstdOptions

DATA = pathlib.Path(__file__).parent / "data"
ALICE = (DATA / "alice29.txt").read_bytes()


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


@pytest.mark.parametrize("fixture,plain", [
    ("alice29.txt.zst", "alice29.txt"),
    ("10x10y.zst", "10x10y"),
])
def test_golden_fixture(fixture, plain):
    dec = decoder.Interface.zstd()
    assert decode_all(dec, (DATA / fixture).read_bytes()) == (DATA / plain).read_bytes()


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
def test_foreign_levels(level):
    dec = decoder.Interface.zstd()
    blob = zstandard.ZstdCompressor(level=level).compress(ALICE)
    assert decode_all(dec, blob) == ALICE


def test_foreign_features():
    dec = decoder.Interface.zstd()
    # checksummed frame
    blob = zstandard.ZstdCompressor(level=5, write_checksum=True).compress(ALICE)
    assert decode_all(dec, blob) == ALICE
    dec.reset()
    # content-size-known frame
    blob = zstandard.ZstdCompressor(level=5, write_content_size=True).compress(ALICE)
    assert decode_all(dec, blob) == ALICE
    dec.reset()
    # empty payload
    blob = zstandard.ZstdCompressor().compress(b"")
    assert decode_all(dec, blob) == b""


@pytest.mark.parametrize("level", [1, 3, 6, 12])
def test_libzstd_accepts_our_streams(level):
    enc = encoder.Interface.zstd(ZstdOptions(level=level))
    blob = encode_all(enc, ALICE)
    got = zstandard.ZstdDecompressor().decompress(blob, max_output_size=len(ALICE) + 16)
    assert got == ALICE


def test_multi_block_stream():
    data = (ALICE * 3)[: 300_000]  # > 2 blocks of 128 KiB
    enc = encoder.Interface.zstd(ZstdOptions(level=3))
    blob = encode_all(enc, data)
    assert zstandard.ZstdDecompressor().decompress(blob, max_output_size=len(data) + 16) == data
    dec = decoder.Interface.zstd()
    assert decode_all(dec, blob) == data


def test_window_log_cap():
    enc = encoder.Interface.zstd(ZstdOptions(window_log=20))
    blob = encode_all(enc, ALICE)
    dec = decoder.Interface.zstd(ZstdDecodeOptions(window_log_max=10))
    vec = ByteVec()
    result = dec.decode_vec_full(blob, vec)
    assert result.is_error  # window beyond the configured cap


def test_corrupt_checksum():
    enc = encoder.Interface.zstd(ZstdOptions(checksum=True))
    blob = bytearray(encode_all(enc, ALICE))
    blob[-1] ^= 0xFF
    dec = decoder.Interface.zstd()
    vec = ByteVec()
    result = dec.decode_vec_full(bytes(blob), vec)
    assert result.is_error
    assert dec.describe_error(result.status) is not None


def test_skippable_frame():
    import struct

    skippable = struct.pack("<II", 0x184D2A50, 5) + b"hello"
    blob = skippable + zstandard.ZstdCompressor().compress(b"payload")
    dec = decoder.Interface.zstd()
    assert decode_all(dec, blob) == b"payload"


def test_rle_and_raw_blocks():
    dec = decoder.Interface.zstd()
    for data in [b"a" * 70_000, bytes(np.random.default_rng(1).integers(0, 256, 4096, dtype=np.uint8))]:
        enc = encoder.Interface.zstd()
        blob = encode_all(enc, data)
        assert zstandard.ZstdDecompressor().decompress(blob, max_output_size=len(data) + 16) == data
        assert decode_all(dec, blob) == data
        dec.reset()
