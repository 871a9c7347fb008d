"""Jittable DEFLATE block encoder, v2 — the gather-minimal formulation.

v1 (deflate_jax.py) is algorithmically faithful to the host pipeline but
gather-bound: random-index gathers cost ~7 ns/element on TPU and the chain
walk + match measurement + pointer doubling issue hundreds of them
(~0.5 s per 256 KiB block). v2 restructures every hot stage into forms the
hardware likes (PLAN.md records the microbenchmarks):

1. *Sort-carried windows*: `lax.sort` with payload operands carries each
   position's 16-byte window THROUGH the sort network, so candidate
   generation needs no gathers at all — sorted-order neighbors (depth d =
   rolled arrays) are the hash-chain candidates, and match lengths are
   dense u32 XOR/ctz compares, capped at 16 bytes.
2. *Run extension*: distance-1 runs (the long-match case that matters)
   are recovered with log-doubling on dense ops, capped at 255.
3. *Sort-back*: results return to position order by a second payload sort
   (cheaper than scatter).
4. *MXU segment parse*: greedy-cover pointer doubling becomes batched 0/1
   matrix squaring over 256-byte segments (one-hot jump matrices are
   function matrices — exact in bf16; reach vectors accumulate in f32 and
   clamp). Matches clip at segment ends.
5. Fixed-Huffman field mapping via one-hot MXU lookups; bit packing keeps
   the 4-pass scatter-add (bit partition ⇒ add == or).

Output format is identical to v1: an RFC1951 raw-deflate byte run ending
with an empty stored block (sync flush), byte-aligned, window ≤ block.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..formats.deflate import consts
from .deflate_jax import (
    _FIXED_DIST_LEN,
    _FIXED_DIST_REV,
    _FIXED_LIT_LEN,
    _FIXED_LIT_REV,
    _DIST_BASE,
    _DIST_CODE,
    _DIST_EXTRA,
    _LENGTH_BASE,
    _LENGTH_CODE,
    _LENGTH_EXTRA,
    ADLER_MOD,
)

SEG = 128          # parse segment (matches clip here; MXU-sized)
WCAP = 16          # bytes measured per hash-chain candidate
RUN_CAP = 255      # distance-1 run match cap


def _u32_words(data: jnp.ndarray, k: int) -> jnp.ndarray:
    """w[i] = little-endian 4 bytes at i+4k (dense rolls, no gathers)."""
    u = data.astype(jnp.uint32)
    return (
        jnp.roll(u, -(4 * k))
        | (jnp.roll(u, -(4 * k + 1)) << 8)
        | (jnp.roll(u, -(4 * k + 2)) << 16)
        | (jnp.roll(u, -(4 * k + 3)) << 24)
    )


def _ctz_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Matching byte count from a u32 XOR (0..4)."""
    low = x & (jnp.uint32(0) - x)
    cnt = (jax.lax.population_count(low - jnp.uint32(1)) >> 3).astype(jnp.int32)
    return jnp.where(x == 0, jnp.int32(4), cnt)


def match_and_parse(data: jnp.ndarray, n: jnp.ndarray, *, depth: int = 8,
                    max_dist: int = consts.WINDOW_SIZE, max_len: int = consts.MAX_MATCH,
                    parse_iters: int = 0):
    """Shared device LZ stage: sort-carried matching + run extension + MXU
    segment parse. Returns (is_tok bool[N], best_len i32[N], best_dist
    i32[N]) — the token cover all three formats consume (DEFLATE directly
    on device; zstd/brotli through their host entropy stages)."""
    N = data.shape[0]
    pos_all = jnp.arange(N, dtype=jnp.int32)
    in_range = pos_all < n

    # --- 1. hash + sort-carried windows --------------------------------
    d0 = data.astype(jnp.uint32)
    v3 = d0 | (jnp.roll(d0, -1) << 8) | (jnp.roll(d0, -2) << 16)
    h = (v3 * jnp.uint32(2654435761)) >> jnp.uint32(16)
    h = jnp.where(pos_all < n - 2, h, jnp.uint32(0x10000) + pos_all.astype(jnp.uint32))
    w0 = _u32_words(data, 0)
    w1 = _u32_words(data, 1)
    w2 = _u32_words(data, 2)
    w3 = _u32_words(data, 3)
    hs, ps, s0, s1, s2, s3 = jax.lax.sort(
        (h, pos_all, w0, w1, w2, w3), num_keys=1, is_stable=True
    )

    # --- 2. sorted-neighbor candidates (dense) -------------------------
    best_len_s = jnp.zeros(N, dtype=jnp.int32)
    best_dist_s = jnp.zeros(N, dtype=jnp.int32)
    for d in range(1, depth + 1):
        same = hs == jnp.roll(hs, d)
        same = same & (pos_all >= d)
        dist = ps - jnp.roll(ps, d)
        ok = same & (dist > 0) & (dist <= max_dist)
        l = _ctz_bytes(s0 ^ jnp.roll(s0, d))
        l4 = _ctz_bytes(s1 ^ jnp.roll(s1, d))
        l8 = _ctz_bytes(s2 ^ jnp.roll(s2, d))
        l12 = _ctz_bytes(s3 ^ jnp.roll(s3, d))
        l = l + jnp.where(l == 4, l4, 0)
        l = l + jnp.where(l == 8, l8, 0)
        l = l + jnp.where(l == 12, l12, 0)
        l = jnp.where(ok, l, 0)
        better = l > best_len_s
        best_len_s = jnp.where(better, l, best_len_s)
        best_dist_s = jnp.where(better, dist, best_dist_s)

    # --- 3. sort back to position order --------------------------------
    _, best_len, best_dist = jax.lax.sort(
        (ps, best_len_s, best_dist_s), num_keys=1, is_stable=True
    )

    # --- run extension: distance-1 matches via log-doubling ------------
    e = (data == jnp.roll(data, -1)) & (pos_all < n - 1)
    run = e.astype(jnp.int32)
    step = 1
    while step < RUN_CAP:
        run = run + jnp.where(run == step, jnp.roll(run, -step), 0)
        step *= 2
    run = jnp.minimum(run, RUN_CAP)
    # match at i with dist 1 has length run[i-1]; express via roll.
    run_len = jnp.roll(run, 1).at[0].set(0)
    use_run = run_len > best_len
    best_len = jnp.where(use_run, run_len, best_len)
    best_dist = jnp.where(use_run, 1, best_dist)

    # --- heuristics ----------------------------------------------------
    limit = jnp.minimum(n - pos_all, jnp.int32(max_len))
    # clip to segment end (parse is segment-local)
    seg_rem = SEG - (pos_all & (SEG - 1))
    best_len = jnp.minimum(jnp.minimum(best_len, limit), seg_rem)
    best_len = jnp.where(in_range, best_len, 0)
    drop = (best_len == consts.MIN_MATCH) & (best_dist > 4096)
    best_len = jnp.where(drop, 0, best_len)
    nxt_len = jnp.concatenate([best_len[1:], jnp.zeros(1, jnp.int32)])
    best_len = jnp.where(nxt_len > best_len, 0, best_len)  # lazy demote
    take = best_len >= consts.MIN_MATCH

    # --- 4. MXU segment parse ------------------------------------------
    S = N // SEG
    step_arr = jnp.where(take, best_len, 1)
    local = pos_all & (SEG - 1)
    nxt_local = jnp.minimum(local + step_arr, SEG)  # SEG = off the end
    nl = nxt_local.reshape(S, SEG)
    cols = jnp.arange(SEG, dtype=jnp.int32)
    jmat = (nl[:, :, None] == cols[None, None, :]).astype(jnp.bfloat16)
    reach = jnp.zeros((S, 1, SEG), dtype=jnp.float32).at[:, 0, 0].set(1.0)
    iters = parse_iters if parse_iters else int(np.ceil(np.log2(SEG)))
    for _ in range(iters):
        hop = jnp.einsum(
            "sij,sjk->sik", reach.astype(jnp.bfloat16), jmat,
            preferred_element_type=jnp.float32,
        )
        reach = jnp.minimum(reach + hop, 1.0)
        jmat = jnp.einsum(
            "sij,sjk->sik", jmat, jmat, preferred_element_type=jnp.bfloat16
        )
    is_tok = (reach[:, 0, :] > 0.5).reshape(N) & in_range
    return is_tok, best_len, best_dist


@functools.partial(jax.jit, static_argnames=("depth", "max_dist"))
def device_tokens(data: jnp.ndarray, n: jnp.ndarray, *, depth: int = 8,
                  max_dist: int = consts.WINDOW_SIZE):
    """Jitted export of the shared LZ stage for the zstd/brotli hybrid
    pipelines (device match+parse, host entropy coding)."""
    return match_and_parse(data, n, depth=depth, max_dist=max_dist)


@functools.partial(jax.jit, static_argnames=("depth", "cap", "parse_iters", "with_index"))
def encode_block_fixed_v2(data: jnp.ndarray, n: jnp.ndarray, *, depth: int = 8,
                          cap: int = 0, parse_iters: int = 0,
                          with_index: bool = False):
    """v2 block encode. Returns (out_u8[cap], meta_i32[2]=[len, adler]) and,
    with ``with_index``, the per-segment bit offsets (every SEG-byte output
    segment starts at a token boundary — the parse restarts per segment —
    so the offsets make self-produced blocks segment-parallel to decode).
    ``parse_iters`` overrides the parse-doubling iteration count (timing
    experiments only; fewer than log2(SEG) yields an invalid parse)."""
    N = data.shape[0]
    if cap == 0:
        cap = N + N // 4 + 64
    pos_all = jnp.arange(N, dtype=jnp.int32)
    in_range = pos_all < n
    is_tok, best_len, best_dist = match_and_parse(
        data, n, depth=depth, parse_iters=parse_iters
    )
    take = best_len >= consts.MIN_MATCH

    # --- 5. fixed-Huffman fields (one-hot MXU lookups) ------------------
    lit_len_t = jnp.asarray(_FIXED_LIT_LEN)
    lit_rev_t = jnp.asarray(_FIXED_LIT_REV)
    dist_len_t = jnp.asarray(_FIXED_DIST_LEN)
    dist_rev_t = jnp.asarray(_FIXED_DIST_REV)

    is_match_tok = is_tok & take
    mlen = jnp.clip(best_len, consts.MIN_MATCH, consts.MAX_MATCH)
    lsym = jnp.asarray(_LENGTH_CODE)[mlen]
    lsym_idx = lsym - 257
    lcode_bits = lit_len_t[lsym]
    lextra_bits = jnp.asarray(_LENGTH_EXTRA)[lsym_idx]
    lextra_val = (mlen - jnp.asarray(_LENGTH_BASE)[lsym_idx]).astype(jnp.uint32)

    dclip = jnp.clip(best_dist, 1, consts.WINDOW_SIZE)
    dsym = jnp.asarray(_DIST_CODE)[dclip]
    dcode_bits = dist_len_t[dsym]
    dextra_bits = jnp.asarray(_DIST_EXTRA)[dsym]
    dextra_val = (dclip - jnp.asarray(_DIST_BASE)[dsym]).astype(jnp.uint32)

    lit_field_val = lit_rev_t[data.astype(jnp.int32)]
    lit_field_bits = lit_len_t[data.astype(jnp.int32)]

    f0_val = jnp.where(
        is_match_tok,
        lit_rev_t[lsym] | (lextra_val << lcode_bits.astype(jnp.uint32)),
        lit_field_val,
    )
    f0_bits = jnp.where(
        is_match_tok, lcode_bits + lextra_bits,
        jnp.where(is_tok & ~take, lit_field_bits, 0),
    )
    f1_val = dist_rev_t[dsym] | (dextra_val << dcode_bits.astype(jnp.uint32))
    f1_bits = jnp.where(is_match_tok, dcode_bits + dextra_bits, 0)

    # --- assemble + pack (same layout as v1) ----------------------------
    hdr_val = jnp.asarray([2], dtype=jnp.uint32)  # bfinal=0, btype=01
    hdr_bits = jnp.asarray([3], dtype=jnp.int32)
    eob_val = jnp.asarray([_FIXED_LIT_REV[256]], dtype=jnp.uint32)
    eob_bits = jnp.asarray([int(_FIXED_LIT_LEN[256])], dtype=jnp.int32)

    per_pos = f0_bits + f1_bits
    base = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(per_pos)])
    off_f0 = 3 + base[:N]
    off_f1 = off_f0 + f0_bits
    off_eob = 3 + base[N]
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), off_f0, off_f1, off_eob[None]]
    )
    vals = jnp.concatenate([hdr_val, f0_val.astype(jnp.uint32), f1_val.astype(jnp.uint32), eob_val])
    bits = jnp.concatenate([hdr_bits, f0_bits, f1_bits, eob_bits])

    total_bits = off_eob + eob_bits[0]
    total_bytes = (total_bits + 3 + 7) // 8
    out = jnp.zeros(cap, dtype=jnp.int32)
    shifted = vals << (offsets % 8).astype(jnp.uint32)
    bytepos = offsets // 8
    valid_field = bits > 0
    for k in range(4):
        contrib = ((shifted >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
        idx = jnp.where(valid_field, bytepos + k, cap - 1)
        contrib = jnp.where(valid_field, contrib, 0)
        out = out.at[jnp.clip(idx, 0, cap - 1)].add(contrib)
    out = out.at[total_bytes].set(0)
    out = out.at[total_bytes + 1].set(0)
    out = out.at[total_bytes + 2].set(0xFF)
    out = out.at[total_bytes + 3].set(0xFF)
    out_len = total_bytes + 4
    out_u8 = (out & 0xFF).astype(jnp.uint8)

    # --- adler32 (int32-safe two-level reduction) -----------------------
    db = jnp.where(in_range, data.astype(jnp.int32), 0)
    s = jnp.sum(db)
    wmod = (jnp.maximum(n - pos_all, 0) % ADLER_MOD).astype(jnp.int32)
    group = jnp.sum((db * wmod).reshape(-1, 64), axis=1) % ADLER_MOD
    w = jnp.sum(group) % ADLER_MOD
    a = (1 + s) % ADLER_MOD
    b = (n % ADLER_MOD + w) % ADLER_MOD
    adler = (b.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)
    meta = jnp.stack([out_len.astype(jnp.int32), adler.astype(jnp.int32)])
    if with_index:
        seg_bits = off_f0.reshape(-1, SEG)[:, 0]  # bit offset of each segment
        return out_u8, meta, seg_bits
    return out_u8, meta
