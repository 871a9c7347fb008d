"""Brotli format tests: golden fixtures, the libbrotli oracle in both
directions across all qualities/modes, and encoder feature coverage."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import brotli_oracle
from compu_tpu import ByteVec, DecodeStatus, Detection, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.brotli.options import BrotliMode, BrotliOptions

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
    ("alice29.txt.br", "alice29.txt"),
    ("10x10y.br", "10x10y"),
])
def test_golden_fixture(fixture, plain):
    dec = decoder.Interface.brotli()
    assert decode_all(dec, (DATA / fixture).read_bytes()) == (DATA / plain).read_bytes()


@pytest.mark.parametrize("quality", [0, 1, 2, 5, 9, 11])
def test_foreign_qualities(quality):
    dec = decoder.Interface.brotli()
    blob = brotli_oracle.compress(ALICE, quality)
    assert decode_all(dec, blob) == ALICE


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_foreign_modes(mode):
    """Text/font modes exercise dictionary transforms + context maps."""
    dec = decoder.Interface.brotli()
    blob = brotli_oracle.compress(ALICE[:40000], 11, 22, mode)
    assert decode_all(dec, blob) == ALICE[:40000]


def test_foreign_small_window():
    dec = decoder.Interface.brotli()
    blob = brotli_oracle.compress(ALICE, 9, 10)
    assert decode_all(dec, blob) == ALICE


@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_libbrotli_accepts_our_streams(quality):
    enc = encoder.Interface.brotli(BrotliOptions(quality=quality))
    blob = encode_all(enc, ALICE)
    assert brotli_oracle.decompress(blob, len(ALICE) + 64) == ALICE


def test_brotli_detects_unknown():
    """Brotli has no magic: own output must sniff as Unknown
    (reference: tests/encoder.rs:181)."""
    enc = encoder.Interface.brotli()
    blob = encode_all(enc, ALICE)
    assert Detection.detect(blob) is Detection.Unknown


def test_multi_metablock():
    data = (ALICE * 10)[: (1 << 20) + 123_456]
    enc = encoder.Interface.brotli(BrotliOptions(quality=5))
    blob = encode_all(enc, data)
    assert brotli_oracle.decompress(blob, len(data) + 64) == data
    dec = decoder.Interface.brotli()
    assert decode_all(dec, blob) == data


def test_multi_metablock_distance_ring_carry():
    """The decoder's 4-slot distance ring persists across meta-blocks;
    the encoder must thread it through chunks too. A text chunk followed
    by a run chunk whose first copy is ring-relative desynchronizes a
    per-meta-block-reset ring (regression: encoder planned short distance
    codes against a fresh INITIAL_DISTANCES ring in chunk 2+, producing
    streams libbrotli rejects or mis-decodes)."""
    data = (ALICE * 40)[: 1 << 20] + b"A" * 1024
    for q in (1, 5, 9):
        enc = encoder.Interface.brotli(BrotliOptions(quality=q))
        blob = encode_all(enc, data)
        assert brotli_oracle.decompress(blob, len(data) + 64) == data
        dec = decoder.Interface.brotli()
        assert decode_all(dec, blob) == data


def test_incompressible_and_runs():
    rng = np.random.default_rng(7)
    dec = decoder.Interface.brotli()
    for data in [rng.integers(0, 256, 10000, dtype=np.uint8).tobytes(), b"z" * 50000]:
        enc = encoder.Interface.brotli()
        blob = encode_all(enc, data)
        assert brotli_oracle.decompress(blob, len(data) + 64) == data
        assert decode_all(dec, blob) == data
        dec.reset()


def test_mode_option_accepted():
    for mode in BrotliMode:
        enc = encoder.Interface.brotli(BrotliOptions(mode=mode))
        blob = encode_all(enc, b"data " * 1000)
        assert brotli_oracle.decompress(blob, 6000) == b"data " * 1000


def test_corrupt_stream_errors():
    enc = encoder.Interface.brotli()
    blob = bytearray(encode_all(enc, ALICE))
    blob[len(blob) // 2] ^= 0xFF
    dec = decoder.Interface.brotli()
    vec = ByteVec()
    result = dec.decode_vec_full(bytes(blob), vec)
    # Either a typed error or wrong output — must not silently succeed
    # with matching output. (Bit flips mid-stream may decode to garbage
    # of the right length; the strict check is on typed failure paths.)
    if not result.is_error:
        assert vec.data() != ALICE
    else:
        assert dec.describe_error(result.status) is not None
