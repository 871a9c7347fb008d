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


def test_match_candidates_pallas_interpret():
    """The Pallas matcher (interpret mode) must reproduce the XLA
    candidate loop bit-exactly, including across chunk boundaries (the
    halo row is carried through VMEM scratch) and across logical block
    boundaries (lpos masking)."""
    import jax

    from compu_tpu.kernels.deflate_jax_v2 import (_candidates_xla,
                                                  _sort_stage)
    from compu_tpu.kernels.match_pallas import C, match_candidates_pallas

    raw = (DATA / "alice29.txt").read_bytes()
    N = C  # one logical block per chunk: exercises both boundary kinds
    B = 3
    wcap = 16
    depth = 6
    rng = np.random.default_rng(7)
    blocks = np.zeros((B, N), np.uint8)
    blocks[0] = np.frombuffer(raw[:N], np.uint8)
    blocks[1] = np.frombuffer((raw[100:100 + N // 2] * 2)[:N], np.uint8)
    blocks[2] = rng.integers(0, 8, N, dtype=np.uint8)  # dense matches
    lens = jnp.full(B, N, jnp.int32)

    sorted_ops = jax.vmap(
        lambda d, n: _sort_stage(d, n, wcap=wcap))(jnp.asarray(blocks), lens)
    hs, ps = sorted_ops[0], sorted_ops[1]
    sw = sorted_ops[2:]
    bl_ref, bd_ref = jax.vmap(
        lambda h, p, *w: _candidates_xla(h, p, w, depth=depth,
                                         max_dist=32768, wcap=wcap)
    )(hs, ps, *sw)
    bl, bd = match_candidates_pallas(
        hs.reshape(-1), ps.reshape(-1),
        tuple(w.reshape(-1) for w in sw),
        depth=depth, max_dist=32768, block_elems=N, interpret=True,
    )
    assert (np.asarray(bl) == np.asarray(bl_ref).reshape(-1)).all()
    assert (np.asarray(bd) == np.asarray(bd_ref).reshape(-1)).all()
