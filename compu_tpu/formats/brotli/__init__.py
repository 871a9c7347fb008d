"""Brotli (RFC 7932).

The reference reaches brotli through FFI (src/encoder/brotli_c.rs,
src/decoder/brotli.rs); here the format is implemented natively: static
dictionary + word transforms (spec data vendored under this package),
context modeling, block switching, the combined insert&copy command
alphabet and the postfix/direct distance scheme."""
