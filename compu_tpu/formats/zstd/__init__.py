"""Zstandard (RFC 8878).

The reference reaches zstd through libzstd FFI (src/encoder/zstd.rs,
src/decoder/zstd.rs); here the format is implemented natively: FSE/tANS
entropy coding, zstd-canonical Huffman literals (1/4-stream), sequence
coding with the 3-slot repeat-offset history, window/frame handling and
xxhash64 content checksums."""
