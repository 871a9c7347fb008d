"""Compressed-size oracle: our encoders at max effort must not exceed the
reference-tool fixtures (BASELINE.md target: size <= reference wrappers'
output on the tests/data corpus), and the streams must stay valid for
foreign decoders where an oracle exists."""

import pathlib
import sys
import zlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import compu_tpu as ct
from compu_tpu import ByteVec, EncodeOp
from compu_tpu.formats.brotli.options import BrotliOptions
from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions
from compu_tpu.formats.zstd.options import ZstdOptions

DATA = pathlib.Path(__file__).parent / "data"


def _encode(iface, data: bytes) -> bytes:
    vec = ByteVec()
    iface.encode_vec_full(data, vec, EncodeOp.Finish)
    return bytes(vec.data())


def _decode_ours(iface, blob: bytes) -> bytes:
    out = ByteVec()
    iface.decode_vec_full(blob, out)
    return bytes(out.data())


@pytest.mark.parametrize("name", ["10x10y", "alice29.txt"])
def test_gzip_beats_reference(name):
    data = (DATA / name).read_bytes()
    fixture = len((DATA / f"{name}.gz").read_bytes())
    blob = _encode(ct.encoder.Interface.zlib(ZlibOptions(level=9, mode=ZlibMode.Gzip)), data)
    assert zlib.decompress(blob, wbits=31) == data
    assert len(blob) <= fixture, (len(blob), fixture)


@pytest.mark.parametrize("name", ["10x10y", "alice29.txt"])
def test_zstd_beats_reference(name):
    zstandard = pytest.importorskip("zstandard")
    data = (DATA / name).read_bytes()
    fixture = len((DATA / f"{name}.zst").read_bytes())
    blob = _encode(ct.encoder.Interface.zstd(ZstdOptions(level=22, checksum=False)), data)
    got = zstandard.ZstdDecompressor().decompress(blob, max_output_size=max(len(data) * 2, 64))
    assert got == data
    assert len(blob) <= fixture, (len(blob), fixture)


@pytest.mark.parametrize("name", ["10x10y", "alice29.txt"])
def test_brotli_beats_reference(name):
    data = (DATA / name).read_bytes()
    fixture = len((DATA / f"{name}.br").read_bytes())
    blob = _encode(ct.encoder.Interface.brotli(BrotliOptions(quality=11)), data)
    # Foreign oracle (system libbrotli) plus decode-back with our own
    # RFC 7932 decoder.
    import brotli_oracle

    assert brotli_oracle.decompress(blob, len(data) + 64) == data
    assert _decode_ours(ct.decoder.Interface.brotli(), blob) == data
    assert len(blob) <= fixture, (len(blob), fixture)
