"""zlib/deflate option surface, mirroring the reference's option structs
(encoder: src/encoder/zlib_common.rs:5-110; decoder: src/decoder/zlib_common.rs:4-15).

The reference encodes modes as zlib windowBits values (Deflate=-15, Zlib=15,
Gzip=31, decode Auto=15+32); here the mode is a plain enum and the window is
always the format-maximal 32 KiB.
"""

from __future__ import annotations

import dataclasses
import enum


class ZlibMode(enum.Enum):
    """Framing selection. ``Auto`` (decode only) sniffs zlib vs gzip."""

    Deflate = "deflate"  # raw RFC1951, no framing
    Zlib = "zlib"        # RFC1950: 2-byte header + adler32
    Gzip = "gzip"        # RFC1952: gzip header + crc32 + isize
    Auto = "auto"        # decode-side header auto-detection


class ZlibStrategy(enum.Enum):
    """Encoding strategies (reference: src/encoder/zlib_common.rs:5-16)."""

    Default = "default"
    #: Favor literals over short/far matches (filtered/PNG-style data).
    Filtered = "filtered"
    #: Entropy coding only, no LZ77 matches.
    HuffmanOnly = "huffman_only"
    #: Only distance-1 matches (run-length encoding).
    Rle = "rle"
    #: Fixed Huffman tables only (no dynamic blocks).
    Fixed = "fixed"


@dataclasses.dataclass(frozen=True)
class ZlibOptions:
    """Encoder options (reference: ZlibOptions, src/encoder/zlib_common.rs:46-110).

    ``level`` 0..9 maps onto match-finder effort (0 = stored blocks only);
    ``mem_level`` sizes the match-finder hash table (mem_level + 8 hash
    bits — zlib's memLevel semantics: smaller values collide more and
    trade ratio for memory; the default 8 is the full-width hash).
    """

    mode: ZlibMode = ZlibMode.Zlib
    level: int = 6
    strategy: ZlibStrategy = ZlibStrategy.Default
    mem_level: int = 8

    def __post_init__(self) -> None:
        if not 0 <= self.level <= 9:
            raise ValueError("compression level must be in 0..9")
        if not 1 <= self.mem_level <= 9:
            raise ValueError("mem_level must be in 1..9")
        if self.mode is ZlibMode.Auto:
            raise ValueError("Auto mode is decode-only")


@dataclasses.dataclass(frozen=True)
class ZlibDecodeOptions:
    """Decoder options (reference: src/decoder/zlib_common.rs:4-15)."""

    mode: ZlibMode = ZlibMode.Auto
