"""Every option knob must change behavior (not just be accepted) — the
reference applies each to the native codec state (ZstdStrategy via
ZSTD_c_strategy, src/encoder/zstd.rs:121; brotli mode via apply_c/apply_rust,
src/encoder/brotli_common.rs:58-73; zlib mem_level via deflateInit2_,
src/encoder/zlib.rs:60). Each test asserts the knob alters output AND the
output still roundtrips (foreign oracle where available)."""

import pathlib
import sys
import zlib as zlib_mod

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.brotli.options import BrotliMode, BrotliOptions
from compu_tpu.formats.deflate.options import ZlibMode, ZlibOptions
from compu_tpu.formats.zstd.options import (
    ZstdDecodeOptions,
    ZstdOptions,
    ZstdStrategy,
)

DATA_DIR = pathlib.Path(__file__).parent / "data"
TEXT = (DATA_DIR / "alice29.txt").read_bytes()[:65536]


def _encode(enc, data):
    out = bytearray(len(data) * 2 + 4096)
    res = enc.encode(data, out, EncodeOp.Finish)
    assert res.status is EncodeStatus.Finished, res.status
    return bytes(out[: len(out) - res.output_remain])


def _decode_zstd(blob):
    dec = decoder.Interface.zstd(ZstdDecodeOptions())
    out = bytearray(len(TEXT) + 1024)
    res = dec.decode(blob, out)
    return bytes(out[: len(out) - res.output_remain])


def test_zstd_strategy_changes_output_and_roundtrips():
    sizes = {}
    for strat in (ZstdStrategy.Fast, ZstdStrategy.Greedy, ZstdStrategy.BtOpt):
        enc = encoder.Interface.zstd(ZstdOptions(level=3, strategy=strat))
        blob = _encode(enc, TEXT)
        assert _decode_zstd(blob) == TEXT
        sizes[strat] = len(blob)
    # A stronger strategy at the same level must compress harder.
    assert sizes[ZstdStrategy.BtOpt] < sizes[ZstdStrategy.Fast]
    assert sizes[ZstdStrategy.Greedy] != sizes[ZstdStrategy.Fast]


def test_zstd_negative_and_zero_levels():
    # Reference accepts the full libzstd range (src/encoder/zstd.rs:81-93).
    blob_fast = _encode(encoder.Interface.zstd(ZstdOptions(level=-5)), TEXT)
    blob_zero = _encode(encoder.Interface.zstd(ZstdOptions(level=0)), TEXT)
    blob_mid = _encode(encoder.Interface.zstd(ZstdOptions(level=9)), TEXT)
    assert _decode_zstd(blob_fast) == TEXT
    assert _decode_zstd(blob_zero) == TEXT
    # fast levels trade ratio away; level 0 behaves like the default (3)
    assert len(blob_fast) > len(blob_mid)
    assert len(blob_zero) == len(_encode(encoder.Interface.zstd(ZstdOptions(level=3)), TEXT))
    with pytest.raises(ValueError):
        ZstdOptions(level=-131073)
    with pytest.raises(ValueError):
        ZstdOptions(level=23)


def test_zlib_mem_level_changes_output_and_roundtrips():
    blobs = {}
    for ml in (1, 4, 8):
        enc = encoder.Interface.zlib(ZlibOptions(mode=ZlibMode.Zlib, level=6, mem_level=ml))
        blob = _encode(enc, TEXT)
        assert zlib_mod.decompress(blob) == TEXT  # foreign oracle
        blobs[ml] = blob
    # Narrower hash tables collide more -> different (worse) output.
    assert blobs[1] != blobs[8]
    assert len(blobs[1]) >= len(blobs[8])


def test_brotli_mode_changes_output_and_roundtrips():
    blobs = {}
    for mode in (BrotliMode.Generic, BrotliMode.Text, BrotliMode.Font):
        enc = encoder.Interface.brotli(BrotliOptions(quality=4, mode=mode))
        blob = _encode(enc, TEXT)
        dec = decoder.Interface.brotli()
        out = bytearray(len(TEXT) + 1024)
        res = dec.decode(blob, out)
        assert bytes(out[: len(out) - res.output_remain]) == TEXT
        blobs[mode] = blob
    # Text enables context modeling below the Generic threshold; Font
    # disables it at qualities where Generic would enable it.
    assert blobs[BrotliMode.Text] != blobs[BrotliMode.Generic]
    enc_font = encoder.Interface.brotli(BrotliOptions(quality=9, mode=BrotliMode.Font))
    enc_gen = encoder.Interface.brotli(BrotliOptions(quality=9, mode=BrotliMode.Generic))
    assert _encode(enc_font, TEXT) != _encode(enc_gen, TEXT)
