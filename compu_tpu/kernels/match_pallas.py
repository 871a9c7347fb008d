"""Pallas TPU kernel for sorted-neighbor match candidates.

The XLA form of the candidate stage (deflate_jax_v2.match_and_parse step
2) materializes ~depth x (wcap/4) rolled copies of the sort-carried
window arrays through HBM (~2 GB per 16x256 KiB batch, measured ~15 ms).
This kernel streams each array through VMEM once: the grid walks C-element
chunks, a 128-element front halo makes every shift-by-d (d <= 128) a
STATIC lane-window slice of a 256-wide row array (wide[r] = [prev row |
row]), and the whole depth x words XOR/ctz reduction runs on VMEM tiles.
HBM traffic drops to one read of the input arrays plus one write of the
two outputs.

Two measured revisions (TPU v5e, chained timing):

* wide-slice shifts: one static lane slice per (depth, word) unit instead
  of two pltpu.rolls + an iota select — ~25% off the kernel.
* r3: VMEM BlockSpecs + a scratch-carried halo row instead of manual
  make_async_copy/wait per grid step. The manual form serialized every
  chunk's 6 DMAs with its compute (no overlap); BlockSpec pipelining
  double-buffers the transfers behind the compute automatically. The
  128-element halo that motivated the manual copies is carried in a tiny
  (nin, 1, 128) VMEM scratch instead — TPU grids run sequentially, so
  chunk i reads the last row chunk i-1 wrote there.

Inputs are the SORT-ORDER arrays (hash, position, wcap/4 window words);
outputs are best match length/distance per sorted lane, identical to the
XLA loop (cross-checked in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 8192            # chunk elements per grid step
ROWS = C // 128     # 64
HALO = 128          # front halo (covers shifts up to depth <= 128)


def _ctz_bytes(x):
    low = x & (jnp.uint32(0) - x)
    cnt = (jax.lax.population_count(low - jnp.uint32(1)) >> 3).astype(jnp.int32)
    return jnp.where(x == 0, jnp.int32(4), cnt)


def _match_kernel(*refs, depth: int, words: int, max_dist: int,
                  block_elems: int):
    nin = 2 + words
    ins = refs[:nin]                       # VMEM (ROWS, 128) blocks
    bl_ref, bd_ref = refs[nin], refs[nin + 1]
    carry = refs[nin + 2]                  # VMEM (nin, 1, 128) halo rows
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry[...] = jnp.zeros((nin, 1, 128), jnp.uint32)

    # wide[j][r] = [row r-1 | row r] (ROWS, 256): the value at flat chunk
    # position p - d is wide[j][p >> 7, 128 + (p & 127) - d], so a shift by
    # the Python-constant d is ONE static lane slice. Row -1 of this chunk
    # is the previous chunk's last row, carried in scratch (zeros for the
    # first chunk).
    vals = [ins[j][:, :] for j in range(nin)]
    wide = []
    for j in range(nin):
        prev_rows = jnp.concatenate([carry[j], vals[j][:-1, :]], axis=0)
        wide.append(jnp.concatenate([prev_rows, vals[j]], axis=1))
    for j in range(nin):
        carry[j] = vals[j][ROWS - 1:ROWS, :]

    hs = vals[0]
    ps = vals[1].astype(jnp.int32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
    gpos = i * C + row_i * 128 + lane_i
    # sorted-lane index WITHIN the logical block (batched calls flatten
    # blocks; block boundaries are chunk-aligned, so masking the first
    # `d` lanes of each block removes every cross-block candidate)
    lpos = gpos & (block_elems - 1)

    best_len = jnp.zeros((ROWS, 128), jnp.int32)
    best_dist = jnp.zeros((ROWS, 128), jnp.int32)
    for d in range(1, depth + 1):
        sl = slice(128 - d, 256 - d)
        same = (hs == wide[0][:, sl]) & (lpos >= d)
        dist = ps - wide[1][:, sl].astype(jnp.int32)
        ok = same & (dist > 0) & (dist <= max_dist)
        l = _ctz_bytes(vals[2] ^ wide[2][:, sl])
        for k in range(1, words):
            lk = _ctz_bytes(vals[2 + k] ^ wide[2 + k][:, sl])
            l = l + jnp.where(l == 4 * k, lk, 0)
        l = jnp.where(ok, l, 0)
        better = l > best_len
        best_len = jnp.where(better, l, best_len)
        best_dist = jnp.where(better, dist, best_dist)
    bl_ref[:, :] = best_len
    bd_ref[:, :] = best_dist


@functools.partial(jax.jit, static_argnames=("depth", "max_dist",
                                              "block_elems", "interpret"))
def match_candidates_pallas(hs, ps, sw, *, depth: int, max_dist: int,
                            block_elems: int, interpret: bool = False):
    """Best (length, distance) per sorted lane from the sorted hash /
    position / window-word arrays. Semantically identical to the XLA
    candidate loop; `sw` is a tuple of wcap//4 uint32 arrays."""
    N = hs.shape[0]
    assert N % C == 0, "block sizes are powers of two >= 8192"
    assert block_elems % C == 0 and block_elems & (block_elems - 1) == 0
    # The kernel's static window slices cover shifts of at most HALO lanes;
    # a larger depth would wrap slice(128-d, 256-d) negative and silently
    # read the wrong lanes (ADVICE r3).
    assert depth <= HALO, f"depth {depth} exceeds the {HALO}-lane halo"
    words = len(sw)

    def prep(x):
        return x.astype(jnp.uint32).reshape(-1, 128)

    ins = [prep(hs), prep(ps)] + [prep(w) for w in sw]
    grid = (N // C,)
    in_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    bl, bd = pl.pallas_call(
        functools.partial(_match_kernel, depth=depth, words=words,
                          max_dist=max_dist, block_elems=block_elems),
        grid=grid,
        in_specs=[in_spec] * len(ins),
        out_specs=[
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((len(ins), 1, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(*ins)
    return bl.reshape(N), bd.reshape(N)
