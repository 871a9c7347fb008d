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

SEG = 128  # default cover segment (callers may pass smaller seg)


def _bmm(a, b, acc):
    """Batched (G, M, K) @ (G, K, N) matmul with 32-bit accumulation
    (Mosaic requires it; function-matrix entries are 0/1 so bf16/int8
    round trips are exact)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc,
    )


def _parse_kernel(nl_ref, out_ref, *, g: int, dtype, seg: int):
    """One-hot jump-matrix squaring. ``dtype`` is the matmul operand type:
    int8 runs the MXU at 2x the bf16 rate on v5e (values are 0/1; i32
    accumulation is exact either way)."""
    import numpy as _np

    iters = int(_np.ceil(_np.log2(seg)))
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, seg, seg), 2)
    jm = (nl_ref[:, :][:, :, None] == cols).astype(dtype)
    r_rows = jax.lax.broadcasted_iota(jnp.int32, (g, 8, seg), 1)
    r_cols = jax.lax.broadcasted_iota(jnp.int32, (g, 8, seg), 2)
    reach = ((r_rows == 0) & (r_cols == 0)).astype(acc)
    one = acc(1) if acc == jnp.int32 else 1.0
    for it in range(iters):
        hop = _bmm(reach.astype(dtype), jm, acc)
        reach = jnp.minimum(reach + hop, one)
        if it + 1 < iters:  # the last squaring would be unused
            # jm is a (sub)function matrix — at most one 1 per row — and
            # composition preserves that, so the square needs no clamp.
            jm = _bmm(jm, jm, acc).astype(dtype)
    out_ref[:, :] = (reach[:, 0, :] > 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("use_int8", "seg"))
def parse_cover_pallas(step_arr: jnp.ndarray, *,
                       use_int8: bool = True, seg: int = SEG) -> jnp.ndarray:
    """Greedy cover mask (bool[N]) from per-position advances (i32[N]).

    Semantically identical to parse_cover_mxu; steps must already be
    clipped at ``seg`` boundaries (callers guarantee). ``use_int8`` squares
    the one-hot matrices in int8 (2x MXU rate on v5e, exact for 0/1).
    Squaring cost scales as seg^2 * log(seg) per position, so a 64-byte
    cover segment runs ~5x cheaper than 128; the boundary merge stitches
    the extra clips back (deflate_jax_v2._merge_seg_boundaries)."""
    N = step_arr.shape[0]
    S = N // seg
    pos = jnp.arange(N, dtype=jnp.int32)
    local = pos & (seg - 1)
    nl = jnp.minimum(local + jnp.maximum(step_arr, 1), seg).reshape(S, seg)
    g = 8192 // seg
    while S % g:
        g //= 2
    dtype = jnp.int8 if use_int8 else jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_parse_kernel, g=g, dtype=dtype, seg=seg),
        grid=(S // g,),
        in_specs=[pl.BlockSpec((g, seg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, seg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, seg), jnp.int32),
    )(nl)
    return out.reshape(N) > 0
