"""Hybrid pipeline test: the shared device LZ stage feeding host entropy
coders (small shapes keep CPU-XLA compiles fast; the same graph runs on
TPU)."""

import pathlib
import sys
import zlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu.formats.device_lz import DeviceTokenizer
from compu_tpu.formats.zstd.encode import compress_block

DATA = pathlib.Path(__file__).parent / "data"
BS = 1 << 14


def test_device_tokens_cover():
    """Device tokens form a valid contiguous cover with sane matches."""
    raw = (DATA / "alice29.txt").read_bytes()[:BS]
    tok = DeviceTokenizer(BS, BS)
    tok_pos, tok_len, tok_dist = tok(raw)
    pos = 0
    for p, l, d in zip(tok_pos, tok_len, tok_dist):
        assert p == pos
        if l:
            assert 3 <= l <= 258
            assert 1 <= d <= p
            assert raw[p : p + l] == raw[p - d : p - d + l]
            pos += l
        else:
            pos += 1
    assert pos == len(raw)


def test_device_tokens_feed_zstd_entropy():
    """Device cover through the zstd host entropy stage roundtrips."""
    import zstandard

    raw = (DATA / "alice29.txt").read_bytes()[:BS]
    tok = DeviceTokenizer(BS, BS)
    blob = compress_block(raw, 6, tokenizer=tok)
    # compress_block returns a full block (header included); wrap manually.
    import struct

    frame = struct.pack("<IBB", 0xFD2FB528, 0, (14 - 10) << 3) + bytes(
        [blob[0] | 1]
    ) + blob[1:]
    got = zstandard.ZstdDecompressor().decompress(frame, max_output_size=BS + 16)
    assert got == raw
