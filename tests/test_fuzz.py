"""Randomized roundtrip fuzzing across formats, levels, content shapes and
chunkings — every stream cross-checked against the foreign oracle where one
exists (stock zlib / libzstd / libbrotli)."""

import pathlib
import sys
import zlib

import numpy as np
import pytest
import zstandard

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import brotli_oracle
from compu_tpu import ByteVec, DecodeStatus, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.brotli.options import BrotliOptions
from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions
from compu_tpu.formats.zstd.options import ZstdOptions


def make_payload(rng, kind: str, size: int) -> bytes:
    if kind == "random":
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    if kind == "lowent":
        return rng.integers(0, 4, size, dtype=np.uint8).tobytes()
    if kind == "runs":
        parts = []
        while sum(map(len, parts)) < size:
            parts.append(bytes([rng.integers(0, 256)]) * int(rng.integers(1, 500)))
        return b"".join(parts)[:size]
    if kind == "text":
        words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ", b"lazy ", b"dog. "]
        return b"".join(words[rng.integers(0, len(words))] for _ in range(size // 5))[:size]
    if kind == "repeat":
        unit = rng.integers(0, 256, int(rng.integers(1, 100)), dtype=np.uint8).tobytes()
        return (unit * (size // max(1, len(unit)) + 1))[:size]
    raise ValueError(kind)


KINDS = ["random", "lowent", "runs", "text", "repeat"]
SIZES = [0, 1, 2, 63, 1024, 65537]


def roundtrip(enc, dec, data, foreign_decode):
    vec = ByteVec()
    r = enc.encode_vec_full(data, vec, EncodeOp.Finish)
    assert r.status is EncodeStatus.Finished
    blob = vec.data()
    if foreign_decode is not None:
        assert foreign_decode(blob) == data
    out = ByteVec()
    r = dec.decode_vec_full(blob, out)
    assert r.status is DecodeStatus.Finished, r
    assert out.data() == data
    enc.reset()
    dec.reset()


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_deflate(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    enc = encoder.Interface.zlib(ZlibOptions(level=int(rng.integers(1, 10))))
    dec = decoder.Interface.zlib()
    for size in SIZES:
        data = make_payload(rng, kind, size)
        roundtrip(enc, dec, data, zlib.decompress)


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_zstd(kind):
    rng = np.random.default_rng(hash(kind) % 2**32 + 1)
    enc = encoder.Interface.zstd(ZstdOptions(level=int(rng.integers(1, 20))))
    dec = decoder.Interface.zstd()
    dctx = zstandard.ZstdDecompressor()
    for size in SIZES:
        data = make_payload(rng, kind, size)
        roundtrip(enc, dec, data, lambda b: dctx.decompress(b, max_output_size=size + 64))


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_brotli(kind):
    rng = np.random.default_rng(hash(kind) % 2**32 + 2)
    enc = encoder.Interface.brotli(BrotliOptions(quality=int(rng.integers(1, 12))))
    dec = decoder.Interface.brotli()
    for size in SIZES:
        data = make_payload(rng, kind, size)
        roundtrip(enc, dec, data, lambda b: brotli_oracle.decompress(b, size + 64))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_foreign_streams(seed):
    """Foreign-produced streams at random levels decode bit-exactly."""
    rng = np.random.default_rng(seed)
    data = make_payload(rng, KINDS[seed % len(KINDS)], int(rng.integers(1, 200_000)))
    blob = zlib.compress(data, int(rng.integers(0, 10)))
    d = decoder.Interface.zlib()
    out = ByteVec()
    assert d.decode_vec_full(blob, out).status is DecodeStatus.Finished
    assert out.data() == data

    blob = zstandard.ZstdCompressor(level=int(rng.integers(1, 20))).compress(data)
    d = decoder.Interface.zstd()
    out = ByteVec()
    assert d.decode_vec_full(blob, out).status is DecodeStatus.Finished
    assert out.data() == data

    blob = brotli_oracle.compress(data, int(rng.integers(0, 12)))
    d = decoder.Interface.brotli()
    out = ByteVec()
    assert d.decode_vec_full(blob, out).status is DecodeStatus.Finished
    assert out.data() == data


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_chunked_feeding(seed):
    """Random chunk boundaries on both input and output paths."""
    rng = np.random.default_rng(100 + seed)
    data = make_payload(rng, "text", 150_000)
    for make_enc, make_dec in [
        (lambda: encoder.Interface.zlib(ZlibOptions()), decoder.Interface.zlib),
        (lambda: encoder.Interface.zstd(), decoder.Interface.zstd),
        (lambda: encoder.Interface.brotli(), decoder.Interface.brotli),
    ]:
        enc, dec = make_enc(), make_dec()
        vec = ByteVec()
        pos = 0
        while pos < len(data):
            take = int(rng.integers(1, 40_000))
            chunk = data[pos : pos + take]
            pos += len(chunk)
            r = enc.encode_vec_full(chunk, vec, EncodeOp.Process)
            assert not r.is_error if hasattr(r, "is_error") else True
        r = enc.encode_vec_full(b"", vec, EncodeOp.Finish)
        assert r.status is EncodeStatus.Finished
        blob = vec.data()
        out = ByteVec()
        out.reserve_exact(len(data) + 1024)
        pos = 0
        finished = False
        while pos < len(blob):
            take = int(rng.integers(1, 20_000))
            chunk = blob[pos : pos + take]
            pos += len(chunk)
            r = dec.decode_vec(chunk, out)
            assert not r.is_error
            if r.status is DecodeStatus.Finished:
                finished = True
                break
            if r.status is DecodeStatus.NeedOutput:
                out.reserve_exact(65536)
        while not finished:
            r = dec.decode_vec(b"", out)
            if r.status is DecodeStatus.NeedOutput:
                out.reserve_exact(65536)
                continue
            assert r.status is DecodeStatus.Finished
            finished = True
        assert out.data() == data


@pytest.mark.parametrize("level", [12, 19, 22])
def test_fuzz_zstd_max_levels_multichunk(level):
    """Max-effort zstd paths (native-cost DP, block splitting, cross-block
    history, entropy-state reuse) on >128 KiB inputs, against the libzstd
    oracle."""
    rng = np.random.default_rng(7000 + level)
    for kind in ("text", "repeat", "runs"):
        data = make_payload(rng, kind, 200_000)
        enc = encoder.Interface.zstd(ZstdOptions(level=level))
        dec = decoder.Interface.zstd()
        roundtrip(
            enc, dec, data,
            lambda b: zstandard.ZstdDecompressor().decompress(
                b, max_output_size=len(data) + 64
            ),
        )


@pytest.mark.parametrize("quality", [10, 11])
def test_fuzz_brotli_max_quality(quality):
    """Deep-walk brotli qualities (ring distance codes, implicit-distance
    commands) roundtrip on mixed payloads."""
    rng = np.random.default_rng(8000 + quality)
    for kind in ("text", "repeat", "lowent"):
        data = make_payload(rng, kind, 150_000)
        enc = encoder.Interface.brotli(BrotliOptions(quality=quality))
        dec = decoder.Interface.brotli()
        roundtrip(enc, dec, data,
                  lambda b: brotli_oracle.decompress(b, len(data) + 64))
