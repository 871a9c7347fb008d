"""zstd device stages: the 4-stream Huffman literal pack must be
byte-identical to the host writer (so streams stay foreign-valid with no
separate validation surface), and the device-LZ + device-literals hybrid
must produce foreign-decodable frames. Pins VERDICT r1 item 8."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import EncodeOp, ByteVec, encoder
from compu_tpu.formats.zstd.options import ZstdOptions

DATA = (pathlib.Path(__file__).parent / "data" / "alice29.txt").read_bytes()

zstandard = pytest.importorskip("zstandard")


def _encode(opts, data):
    v = ByteVec()
    encoder.Interface.zstd(opts).encode_vec_full(data, v, EncodeOp.Finish)
    return v.data()


def test_device_literals_byte_identical_and_foreign_valid():
    host = _encode(ZstdOptions(level=6), DATA)
    dev = _encode(ZstdOptions(level=6, device_literals=True), DATA)
    assert dev == host
    got = zstandard.ZstdDecompressor().decompress(dev, max_output_size=len(DATA))
    assert got == DATA


def test_device_lz_plus_literals_hybrid_foreign_valid():
    dev = _encode(ZstdOptions(level=6, device_lz=True, device_literals=True), DATA)
    got = zstandard.ZstdDecompressor().decompress(dev, max_output_size=len(DATA))
    assert got == DATA


def test_stream_kernel_matches_backward_writer_exactly():
    from compu_tpu.formats.zstd.huff import HufEncoder
    from compu_tpu.kernels.zstd_literals_jax import encode_streams_device

    rng = np.random.default_rng(5)
    lits = bytes(DATA[:40000])
    freqs = np.bincount(np.frombuffer(lits, np.uint8), minlength=256)
    enc = HufEncoder(freqs)
    per = (len(lits) + 3) // 4
    chunks = [lits[i * per : (i + 1) * per] for i in range(3)]
    chunks.append(lits[3 * per :])
    host = [enc.encode_stream(c) for c in chunks]
    dev = encode_streams_device(chunks, enc.code, enc.nbits)
    assert dev == host


def test_device_sequences_byte_identical_and_foreign_valid():
    """The device FSE sequence bitstream (kernels/zstd_seq_jax.py) must be
    byte-identical to the host ForwardBitWriter push loop, and the full
    device entropy path (LZ + literals + sequences) foreign-decodable."""
    host = _encode(ZstdOptions(level=6), DATA)
    dev = _encode(ZstdOptions(level=6, device_sequences=True), DATA)
    assert dev == host
    allon = _encode(
        ZstdOptions(level=6, device_literals=True, device_sequences=True),
        DATA,
    )
    assert allon == host
    got = zstandard.ZstdDecompressor().decompress(
        allon, max_output_size=len(DATA) + 64
    )
    assert got == DATA


def test_device_sequences_levels_and_small():
    for level, blob in ((3, DATA[:9000]), (9, DATA[:40000])):
        host = _encode(ZstdOptions(level=level), blob)
        dev = _encode(ZstdOptions(level=level, device_sequences=True), blob)
        assert dev == host
