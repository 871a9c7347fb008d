"""Checksum oracle tests: our lane-parallel adler32/crc32 vs CPython's zlib
(the external-library oracle role the multiple backends play in the
reference suite)."""

import os
import pathlib
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu.ops import checksum as ck

SIZES = [0, 1, 19, 255, 4095, 16384, 65537, 152089, (1 << 20) + 7777]


@pytest.mark.parametrize("n", SIZES)
def test_adler32_matches_zlib(n):
    data = os.urandom(n)
    assert ck.adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("n", SIZES)
def test_crc32_matches_zlib(n):
    data = os.urandom(n)
    assert ck.crc32(data) == zlib.crc32(data)


def test_rolling_continuation():
    d1, d2 = os.urandom(70000), os.urandom(130001)
    assert ck.crc32(d2, ck.crc32(d1)) == zlib.crc32(d2, zlib.crc32(d1))
    assert ck.adler32(d2, ck.adler32(d1)) == zlib.adler32(d2, zlib.adler32(d1))


def test_combine():
    """Combine algebra merges per-block checksums computed independently —
    the primitive the block-parallel scheduler relies on."""
    d1, d2 = os.urandom(70000), os.urandom(130001)
    assert ck.crc32_combine(ck.crc32(d1), ck.crc32(d2), len(d2)) == zlib.crc32(d1 + d2)
    assert (
        ck.adler32_combine(ck.adler32(d1), ck.adler32(d2), len(d2))
        == zlib.adler32(d1 + d2)
    )


def test_corpus_files():
    data = (pathlib.Path(__file__).parent / "data" / "alice29.txt").read_bytes()
    assert ck.adler32(data) == zlib.adler32(data)
    assert ck.crc32(data) == zlib.crc32(data)


@pytest.mark.parametrize("n,pad", [(4096, 0), (4096, 123), (1 << 15, 7)])
def test_device_crc_register_fold(n, pad):
    """Kernel-side GF(2) lane fold == zlib.crc32 (pad stripped on host)."""
    import jax.numpy as jnp

    from compu_tpu.kernels.deflate_jax_v2 import _device_crc_register

    rng = np.random.default_rng(n + pad)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    padded = np.concatenate([data[: n - pad], np.zeros(pad, np.uint8)])
    reg = int(np.asarray(_device_crc_register(jnp.asarray(padded))))
    reg = ck.crc_shift(0xFFFFFFFF, n) ^ reg
    reg = ck.crc_unshift(reg, pad)
    assert (reg ^ 0xFFFFFFFF) == zlib.crc32(bytes(data[: n - pad]))
