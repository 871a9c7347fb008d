"""Second zstd ENCODER implementation (csrc/compu_zstd_enc2.cpp) — the
multi-implementation pattern (reference: zlib vs zlib-ng vs zlib-rs
behind one vtable) applied to zstd encode.

Oracles: the foreign zstandard library (libzstd) decode, this repo's
pure-Python frame decoder and native C++ frame decoder, plus the state
machine invariants the reference's encoder tests pin."""

import sys

import numpy as np
import pytest
import zstandard

sys.path.insert(0, "tests")

from compu_tpu import Buffer, ByteVec, decoder, encoder
from compu_tpu.formats.zstd.native_enc2 import available
from compu_tpu.formats.zstd.options import ZstdOptions
from compu_tpu.status import DecodeStatus, EncodeOp, EncodeStatus

pytestmark = pytest.mark.skipif(not available(),
                                reason="native runtime unavailable")

ALICE = open("tests/data/alice29.txt", "rb").read()


def _encode_full(enc, data):
    vec = ByteVec()
    res = enc.encode_vec_full(data, vec, EncodeOp.Finish)
    assert res.status is EncodeStatus.Finished
    return vec.data()


@pytest.mark.parametrize("level", [1, 3, 6, 12, 19])
def test_oracle_roundtrip(level):
    enc = encoder.Interface.zstd_native(ZstdOptions(level=level))
    blob = _encode_full(enc, ALICE)
    got = zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(ALICE) + 64)
    assert got == ALICE


@pytest.mark.parametrize("impl", ["python", "native"])
def test_cross_impl_decoders(impl):
    enc = encoder.Interface.zstd_native(ZstdOptions(level=3))
    blob = _encode_full(enc, ALICE * 3)
    dec = (decoder.Interface.zstd() if impl == "python"
           else decoder.Interface.zstd_native())
    vec = ByteVec()
    res = dec.decode_vec_full(blob, vec)
    assert res.status is DecodeStatus.Finished
    assert vec.data() == ALICE * 3


def test_chunked_equals_oneshot():
    opts = ZstdOptions(level=3)
    one = _encode_full(encoder.Interface.zstd_native(opts), ALICE)
    enc = encoder.Interface.zstd_native(opts)
    buf = Buffer(4096)
    chunked = bytearray()
    rem = memoryview(ALICE)
    while True:
        consumed, st = buf.encode(enc, rem, EncodeOp.Finish)
        rem = rem[consumed:]
        chunked.extend(buf.data())
        buf.consume()
        assert st.status is not EncodeStatus.Error
        if st.status is EncodeStatus.Finished and not buf.data():
            break
    assert bytes(chunked) == one


def test_reset_reuse_and_detection():
    from compu_tpu import Detection

    enc = encoder.Interface.zstd_native(ZstdOptions(level=6))
    b1 = _encode_full(enc, ALICE)
    assert Detection.detect(b1) is Detection.Zstd
    assert enc.reset()
    assert _encode_full(enc, ALICE) == b1


def test_checksum_knob():
    without = _encode_full(
        encoder.Interface.zstd_native(ZstdOptions(level=3, checksum=False)),
        ALICE)
    with_ck = _encode_full(
        encoder.Interface.zstd_native(ZstdOptions(level=3, checksum=True)),
        ALICE)
    assert len(with_ck) == len(without) + 4
    assert zstandard.ZstdDecompressor().decompress(
        without, max_output_size=len(ALICE) + 64) == ALICE


@pytest.mark.parametrize("kind", ["random", "lowent", "runs", "empty", "tiny"])
def test_hard_corpora(kind):
    rng = np.random.default_rng(4)
    data = {
        "random": rng.integers(0, 256, 200000, dtype=np.uint8).tobytes(),
        "lowent": rng.integers(0, 4, 200000, dtype=np.uint8).tobytes(),
        "runs": b"\x00" * 150000 + b"ab" * 30000,
        "empty": b"",
        "tiny": b"z",
    }[kind]
    enc = encoder.Interface.zstd_native(ZstdOptions(level=3))
    blob = _encode_full(enc, data)
    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(data) + 64) == data


def test_window_carry_across_chunks():
    data = ALICE * 8  # > 1 MiB: multiple pipeline chunks, cross-chunk matches
    enc = encoder.Interface.zstd_native(ZstdOptions(level=3, window_log=21))
    blob = _encode_full(enc, data)
    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(data) + 64) == data
    assert len(blob) < len(ALICE)  # repeats compress across chunk boundaries
