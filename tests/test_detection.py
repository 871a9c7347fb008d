"""Format sniffer tests (reference behavior: src/decoder/mod.rs:11-114 and
the detection assertions in tests/encoder.rs:35,181)."""

import pathlib
import sys
import zlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import Detection

DATA = pathlib.Path(__file__).parent / "data"


def test_too_short():
    assert Detection.detect(b"") is None
    assert Detection.detect(b"\x1f") is None
    # Two non-matching bytes still need 4 to rule out zstd.
    assert Detection.detect(b"\x00\x00") is None


def test_gzip():
    assert Detection.detect((DATA / "alice29.txt.gz").read_bytes()) is Detection.Gzip
    assert Detection.detect(b"\x1f\x8b\x08\x00") is Detection.Gzip


def test_zlib():
    for level in (1, 6, 9):
        assert Detection.detect(zlib.compress(b"hello world", level)) is Detection.Zlib
    assert Detection.detect((DATA / "alice29.txt.zz").read_bytes()) is Detection.Zlib


def test_zstd():
    assert Detection.detect((DATA / "alice29.txt.zst").read_bytes()) is Detection.Zstd
    assert Detection.detect(bytes.fromhex("28b52ffd") + b"\x00" * 4) is Detection.Zstd


def test_brotli_is_unknown():
    # Brotli has no magic; streams must sniff as Unknown
    # (reference tests/encoder.rs:181).
    assert Detection.detect((DATA / "alice29.txt.br").read_bytes()) is Detection.Unknown


def test_unknown():
    assert Detection.detect(b"\x00\x01\x02\x03") is Detection.Unknown
