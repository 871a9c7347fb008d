"""Pallas TPU kernel for the exact greedy token cover.

Computes the same transitive-closure-of-a-jump-matrix cover as
deflate_jax_v2.parse_cover_mxu, but with the one-hot matrices built and
squared entirely in VMEM: the XLA einsum form materializes every
(S, 128, 128) squaring round trip through HBM (~1.9 GB per 256 KiB block,
measured ~40 ms per 16-block batch); here HBM sees only the (S, 128) i32
jump targets in and the (S, 128) cover mask out (~2 MB), leaving the MXU
compute (~30 GMAC per block) as the only cost.

Each grid step processes G=8 segments as independent unrolled
square-and-hop chains, giving the scheduler independent matmuls to
pipeline (a single 128^3 matmul is only ~130 MXU cycles — far too small
to keep the array busy alone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 128
_ITERS = 7  # log2(SEG)


def _bmm(a, b):
    """Batched (G, M, K) @ (G, K, N) matmul with f32 accumulation (Mosaic
    requires 32-bit acc; function-matrix entries are 0/1 so bf16 round
    trips are exact)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _parse_kernel(nl_ref, out_ref, *, g: int):
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, SEG, SEG), 2)
    jm = (nl_ref[:, :][:, :, None] == cols).astype(jnp.bfloat16)
    r_rows = jax.lax.broadcasted_iota(jnp.int32, (g, 8, SEG), 1)
    r_cols = jax.lax.broadcasted_iota(jnp.int32, (g, 8, SEG), 2)
    reach = ((r_rows == 0) & (r_cols == 0)).astype(jnp.float32)
    for it in range(_ITERS):
        hop = _bmm(reach.astype(jnp.bfloat16), jm)
        reach = jnp.minimum(reach + hop, 1.0)
        if it + 1 < _ITERS:  # the last squaring would be unused
            jm = _bmm(jm, jm).astype(jnp.bfloat16)
    out_ref[:, :] = (reach[:, 0, :] > 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def parse_cover_pallas(step_arr: jnp.ndarray) -> jnp.ndarray:
    """Greedy cover mask (bool[N]) from per-position advances (i32[N]).

    Semantically identical to parse_cover_mxu; steps must already be
    clipped at SEG boundaries (callers guarantee)."""
    N = step_arr.shape[0]
    S = N // SEG
    pos = jnp.arange(N, dtype=jnp.int32)
    local = pos & (SEG - 1)
    nl = jnp.minimum(local + jnp.maximum(step_arr, 1), SEG).reshape(S, SEG)
    g = 64
    while S % g:
        g //= 2
    out = pl.pallas_call(
        functools.partial(_parse_kernel, g=g),
        grid=(S // g,),
        in_specs=[pl.BlockSpec((g, SEG), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, SEG), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, SEG), jnp.int32),
    )(nl)
    return out.reshape(N) > 0
