"""Brotli option surface, mirroring the reference's option structs
(src/encoder/brotli_common.rs:4-56: quality 1-11, mode Generic/Text/Font,
packed into the 2-byte reset payload there; a plain dataclass here)."""

from __future__ import annotations

import dataclasses
import enum


class BrotliMode(enum.Enum):
    """Input hint (reference: BrotliEncoderMode, src/encoder/brotli_common.rs:4-11).

    Drives the literal context model: ``Text`` enables the UTF8 context map
    from quality 2 (text benefits most from per-context literal trees),
    ``Font`` disables context mapping (font data wants the signed context
    mode this encoder does not model), ``Generic`` keeps the quality-gated
    default (enabled at quality >= 5)."""

    Generic = 0
    Text = 1
    Font = 2


@dataclasses.dataclass(frozen=True)
class BrotliOptions:
    """Encoder options (reference: BrotliOptions, src/encoder/brotli_common.rs:15-56)."""

    quality: int = 9
    mode: BrotliMode = BrotliMode.Generic
    window_bits: int = 22
    #: Run the LZ match+parse stage on the device (shared v2 kernel),
    #: keeping the prefix-code entropy stage on the host.
    device_lz: bool = False

    def __post_init__(self) -> None:
        if not 1 <= self.quality <= 11:
            raise ValueError("brotli quality must be in 1..11")
        if not 10 <= self.window_bits <= 24:
            raise ValueError("window_bits must be in 10..24")
