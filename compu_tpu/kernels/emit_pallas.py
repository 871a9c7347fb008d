"""Pallas TPU kernel for the segment-local bit-pack (emit stage).

The XLA emit (deflate_jax_v3._emit) materializes two one-hot factors
through HBM — a (S, 256, 32) q-one-hot and a (S, 256, 64) r-one-hot x
byte-lane tensor, ~1.5 GB per 16x256 KiB batch — to drive the pack
einsum; measured ~3.9 ms/batch, dominated by that traffic. This kernel
builds both factors in VMEM and contracts them there, so HBM sees only
the (S, 256) field inputs and the (S, 32, 32) packed tile out (~0.2 GB).

Factorization change vs the XLA form: the 4 byte lanes of each shifted
field value fold into the r factor as r' = (bytep & 15) + k (k = lane),
r' < 19 < 32 — one (G, 256, 32) rhs instead of a 64-wide one, and the
lane overlap-add disappears. The packed tile entry (q, r') holds the sum
of byte contributions to segment-local byte p = 16q + r'; the caller
splits r' at 16 and overlap-adds the upper half 16 bytes later (see
rows_from_tiles). Adjacent fields share bytes but never bits, so f32
sums stay exact (<= 255 per byte per lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W2 = 512  # segment row width in bytes (matches deflate_jax_v3._emit)


def _emit_kernel(bytep_ref, shifted_ref, out_ref, *, g: int):
    bytep = bytep_ref[:, :]            # (G, 256) i32
    shifted = shifted_ref[:, :]        # (G, 256) u32 (as i32 bits)
    q = bytep >> 4
    r = bytep & 15
    qcols = jax.lax.broadcasted_iota(jnp.int32, (g, 256, 32), 2)
    a = (q[:, :, None] == qcols).astype(jnp.bfloat16)
    # rhs accumulates in f32 (Mosaic only inserts minor dims on 32-bit
    # types) and casts to bf16 once for the MXU; values <= 255 are exact.
    b32 = jnp.zeros((g, 256, 32), jnp.float32)
    su = shifted.astype(jnp.uint32)
    for k in range(4):
        byte_k = ((su >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(
            jnp.int32).astype(jnp.float32)
        rk = r + k
        b32 = b32 + (rk[:, :, None] == qcols).astype(jnp.float32) \
            * byte_k[:, :, None]
    b = b32.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                   # (G, 32, 32)
    out_ref[:, :, :] = out.astype(jnp.int32)


@jax.jit
def emit_pack_pallas(bytep: jnp.ndarray, shifted: jnp.ndarray) -> jnp.ndarray:
    """(S, 256) byte positions + shifted field values -> (S, 32, 32)
    packed tiles (entry (q, r') = byte value at p = 16q + r')."""
    S = bytep.shape[0]
    # g bounds the in-kernel f32 one-hot temporaries ((g, 256, 32) each,
    # x4 unrolled byte lanes): g=8 keeps the scoped VMEM well under limit
    g = 8
    while S % g:
        g //= 2
    grid = (S // g,)
    spec = pl.BlockSpec((g, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_emit_kernel, g=g),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((g, 32, 32), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 32, 32), jnp.int32),
    )(bytep, shifted.astype(jnp.int32))
    return out


def rows_from_tiles(tiles: jnp.ndarray) -> jnp.ndarray:
    """(S, 32, 32) packed tiles -> (S, W2) byte rows: p = 16q + r', upper
    r' half lands 16 bytes later."""
    S = tiles.shape[0]
    lo = tiles[:, :, :16].reshape(S, W2)
    hi = tiles[:, :, 16:].reshape(S, W2)
    return lo + jnp.pad(hi[:, : W2 - 16], ((0, 0), (16, 0)))


def emit_pack_xla(bytep: jnp.ndarray, shifted: jnp.ndarray) -> jnp.ndarray:
    """XLA twin of emit_pack_pallas (CPU fallback / oracle): same
    (S, 32, 32) tile output."""
    S = bytep.shape[0]
    q = bytep >> 4
    r = bytep & 15
    qcols = jnp.arange(32, dtype=jnp.int32)
    a = (q[:, :, None] == qcols[None, None, :]).astype(jnp.bfloat16)
    b = jnp.zeros((S, bytep.shape[1], 32), jnp.bfloat16)
    su = shifted.astype(jnp.uint32)
    for k in range(4):
        byte_k = ((su >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(
            jnp.bfloat16)
        rk = r + k
        b = b + (rk[:, :, None] == qcols[None, None, :]).astype(jnp.bfloat16) \
            * byte_k[:, :, None]
    out = jnp.einsum("sfq,sfr->sqr", a, b,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)
