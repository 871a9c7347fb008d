"""Test-only ctypes bindings to the system libbrotli — the foreign-tool
oracle for the brotli format (the role stock gzip/zstandard play for the
other formats). Never used by the product code path."""

import ctypes

_enc = ctypes.CDLL("libbrotlienc.so.1")
_enc.BrotliEncoderCompress.restype = ctypes.c_int
_enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
]
_dec = ctypes.CDLL("libbrotlidec.so.1")
_dec.BrotliDecoderDecompress.restype = ctypes.c_int
_dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
]


def compress(data: bytes, quality: int = 9, lgwin: int = 22, mode: int = 0) -> bytes:
    out_size = ctypes.c_size_t(len(data) + 2048)
    out = ctypes.create_string_buffer(out_size.value)
    ok = _enc.BrotliEncoderCompress(
        quality, lgwin, mode, len(data), data, ctypes.byref(out_size), out
    )
    if not ok:
        raise RuntimeError("libbrotli compress failed")
    return out.raw[: out_size.value]


def decompress(blob: bytes, max_out: int) -> bytes:
    out_size = ctypes.c_size_t(max_out)
    out = ctypes.create_string_buffer(max_out)
    r = _dec.BrotliDecoderDecompress(len(blob), blob, ctypes.byref(out_size), out)
    if r != 1:
        raise RuntimeError(f"libbrotli decompress failed ({r})")
    return out.raw[: out_size.value]
