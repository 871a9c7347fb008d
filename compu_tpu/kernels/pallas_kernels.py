"""Pallas (Mosaic) kernels for block primitives.

Hand-written counterparts of the XLA-level kernels: per-tile adler32
partials and byte histograms (the entropy stage's first input), expressed
as grid pipelines with VMEM-resident tiles. They anchor the Pallas layer
the v3 codec kernels grow into (PLAN.md); the jnp/numpy implementations
remain the oracles.

On CPU (tests) they run in interpreter mode; on TPU through Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..ops.checksum import ADLER_MOD

TILE = 1024          # bytes per grid step: (8, 128) uint8 tile
_ROWS = TILE // 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# adler32 partials
# ---------------------------------------------------------------------------
def _adler_tile_kernel(x_ref, out_ref):
    tile = x_ref[...].astype(jnp.int32)
    rows, cols = tile.shape
    n = rows * cols
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    k = row_ids * cols + col_ids
    # int32-exact: 255 * 1024 * 1024 < 2^31.
    s = jnp.sum(tile)
    w = jnp.sum(tile * (n - k))
    # Mosaic has no scatter; place the two scalars with iota masks.
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    out_ref[...] = jnp.where((r == 0) & (c == 0), s, 0) + jnp.where(
        (r == 0) & (c == 1), w, 0
    )


def adler32_partials(block: jnp.ndarray) -> jnp.ndarray:
    """(num_tiles, 8, 128) int32; [t, 0, 0/1] hold [byte_sum, weighted_sum]
    (the page shape satisfies Mosaic's (8, 128) minimum output tile)."""
    n = block.shape[0]
    assert n % TILE == 0
    grid = n // TILE
    return pl.pallas_call(
        _adler_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((_ROWS, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        interpret=_interpret(),
    )(block.reshape(n // 128, 128))


def adler32_pallas(block, n: int) -> int:
    """adler32 of block[:n] from device tile partials (block zero-padded
    past n; padding's only effect — the per-tile length advance of B — is
    corrected algebraically)."""
    import numpy as np

    parts = np.asarray(adler32_partials(block)).astype(np.int64)
    total = block.shape[0]
    a, b = 1, 0
    for t in range(total // TILE):
        s = int(parts[t, 0, 0])
        w = int(parts[t, 0, 1])
        b = (b + TILE * a + w) % ADLER_MOD
        a = (a + s) % ADLER_MOD
    pad = total - n
    if pad:
        b = (b - pad * a) % ADLER_MOD
    return ((b << 16) | a) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Byte histogram via one-hot MXU matmul (jnp level: Mosaic currently lacks
# the (8,128)->(1024,1) shape cast the in-kernel form needs).
# ---------------------------------------------------------------------------
@jax.jit
def byte_histogram(block: jnp.ndarray) -> jnp.ndarray:
    """256-bin byte histogram of a block (float32 counts, exact: one-hot
    0/1 values accumulate in f32 below 2^24)."""
    oh = (
        block[:, None].astype(jnp.int32)
        == jax.lax.broadcasted_iota(jnp.int32, (block.shape[0], 256), 1)
    ).astype(jnp.bfloat16)
    ones = jnp.ones((block.shape[0], 1), dtype=jnp.bfloat16)
    return jnp.dot(oh.T, ones, preferred_element_type=jnp.float32).reshape(256)
