"""Micro-benchmark: element gathers vs two-factor one-hot MXU lookups vs
row gathers on the real chip — decides the decode-scan redesign.

Shapes mirror the LUT decode: L = 32768 lanes, per-block 4096-entry LUTs
(B = 16 blocks x S = 2048 lanes), 12-word row windows.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import functools

B, S = 16, 2048
L = B * S
LUT = 4096
REPS = 32  # lookups per compiled call (amortize dispatch; chained)


@jax.jit
def gather_lookup(lut_flat, idx):
    # idx (L,) in [0, 4096); per-block LUT regions
    lut_base = (jnp.arange(L, dtype=jnp.int32) // S) * LUT
    acc = jnp.int32(0)
    x = idx
    for _ in range(REPS):
        v = lut_flat[lut_base + x]
        x = (x + v) & (LUT - 1)
        acc = acc + v
    return acc


@jax.jit
def mxu_lookup(lut_bs, idx):
    # lut_bs: (B, 128, 32) f32; idx (B, S)
    acc = jnp.zeros((B, S), jnp.int32)
    x = idx
    hi_iota = jnp.arange(128, dtype=jnp.int32)
    for _ in range(REPS):
        hi = x >> 5
        lo = x & 31
        oh = (hi[:, :, None] == hi_iota[None, None, :]).astype(jnp.float32)
        m = jnp.einsum("bsh,bhr->bsr", oh, lut_bs,
                       precision=jax.lax.Precision.HIGHEST)  # (B, S, 32)
        # 5-level mux on lo
        w = m
        for bit in range(5):
            half = w.shape[-1] // 2
            sel = ((lo >> bit) & 1).astype(bool)
            w = jnp.where(sel[:, :, None], w[:, :, 1::2], w[:, :, 0::2])
        v = w[:, :, 0].astype(jnp.int32)
        x = (x + v) & (LUT - 1)
        acc = acc + v
    return acc


@jax.jit
def row_gather(comp12, rows):
    acc = jnp.zeros((L,), jnp.uint32)
    r = rows
    for _ in range(REPS):
        w = jnp.take(comp12, r, axis=0)      # (L, 12)
        acc = acc + w[:, 0]
        r = (r + (w[:, 1] & 63).astype(jnp.int32)) % comp12.shape[0]
    return acc


@jax.jit
def row_gather24(comp24, rows):
    acc = jnp.zeros((L // 2,), jnp.uint32)
    r = rows[: L // 2]
    for _ in range(REPS):
        w = jnp.take(comp24, r, axis=0)      # (L/2, 24)
        acc = acc + w[:, 0]
        r = (r + (w[:, 1] & 63).astype(jnp.int32)) % comp24.shape[0]
    return acc


def chain(fn, *args, k=6):
    r = fn(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); t1 = time.perf_counter()
    t2 = time.perf_counter()
    acc = None
    for _ in range(k):
        acc = fn(*args)
    jax.block_until_ready(acc)
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (k - 1)


def main():
    rng = np.random.default_rng(0)
    lut_flat = jnp.asarray(rng.integers(0, 1 << 24, B * LUT, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, LUT, L, dtype=np.int32))
    per = chain(gather_lookup, lut_flat, idx)
    print("element gather: %.2f ms / %d lookups of %d -> %.2f ns/elem"
          % (per * 1e3, REPS, L, per / (REPS * L) * 1e9))

    lut_bs = jnp.asarray(
        rng.integers(0, 1 << 24, (B, 128, 32)).astype(np.float32))
    idx_bs = jnp.asarray(rng.integers(0, LUT, (B, S), dtype=np.int32))
    per = chain(mxu_lookup, lut_bs, idx_bs)
    print("mxu lookup: %.2f ms -> %.2f ns/elem"
          % (per * 1e3, per / (REPS * L) * 1e9))

    nrows = 340000
    comp12 = jnp.asarray(rng.integers(0, 1 << 30, (nrows, 12), dtype=np.int64).astype(np.uint32))
    rows = jnp.asarray(rng.integers(0, nrows, L, dtype=np.int32))
    per = chain(row_gather, comp12, rows)
    print("row gather 12w x L: %.2f ms -> %.1f ns/row"
          % (per * 1e3, per / (REPS * L) * 1e9))
    comp24 = jnp.asarray(rng.integers(0, 1 << 30, (nrows, 24), dtype=np.int64).astype(np.uint32))
    per = chain(row_gather24, comp24, rows)
    print("row gather 24w x L/2: %.2f ms -> %.1f ns/row"
          % (per * 1e3, per / (REPS * L // 2) * 1e9))


if __name__ == "__main__":
    main()
