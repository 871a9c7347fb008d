"""Pallas kernel oracle tests (interpret mode on CPU; the same kernels
compile through Mosaic on TPU — verified there manually and by bench)."""

import pathlib
import sys
import zlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from compu_tpu.kernels.pallas_kernels import adler32_pallas, byte_histogram

DATA = pathlib.Path(__file__).parent / "data"


def test_adler32_pallas():
    raw = (DATA / "alice29.txt").read_bytes()
    N = 1 << 16
    for n in (N, N - 777, 1024):
        block = np.zeros(N, np.uint8)
        block[:n] = np.frombuffer(raw[:n], np.uint8)
        assert adler32_pallas(jnp.asarray(block), n) == zlib.adler32(raw[:n])


def test_byte_histogram():
    raw = (DATA / "alice29.txt").read_bytes()[: 1 << 16]
    arr = np.frombuffer(raw, np.uint8)
    hist = np.asarray(byte_histogram(jnp.asarray(arr)))
    assert (hist.astype(int) == np.bincount(arr, minlength=256)).all()
