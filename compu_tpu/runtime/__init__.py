"""Host runtime: native (C++) helpers behind graceful Python fallbacks."""

from .native import native_available, crc32 as native_crc32  # noqa: F401
