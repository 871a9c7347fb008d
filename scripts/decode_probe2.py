"""Fine-grained timing of _expand_and_resolve's stages on real hardware."""

import sys
import time
import pathlib
import functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from compu_tpu.kernels.deflate_jax_v2 import SEG
from compu_tpu.kernels import inflate_jax_lut as LUT
from decode_probe import build_inputs, scan_only, BLOCK


@functools.partial(jax.jit, static_argnames=("n_out",))
def expansion_only(t_rec_T, ns, *, n_out):
    """Phase 1 of _expand_and_resolve: per-position root map."""
    B = ns.shape[0]
    N = n_out
    S = N // SEG
    L = B * S
    R = LUT.R
    lane = jnp.arange(L, dtype=jnp.int32)
    t_rec = t_rec_T
    t_start = (t_rec & jnp.uint32(0x1FF)).astype(jnp.int32)
    lane_out_base = lane * SEG
    NT = B * N
    flat_start = (lane_out_base[:, None] + t_start).reshape(-1)
    valid_tok = t_start.reshape(-1) < 511
    slot = jnp.arange(L * R, dtype=jnp.int32) + 1
    slot_at = jnp.zeros(NT + SEG + 512, jnp.int32).at[
        jnp.clip(flat_start, 0, NT + SEG + 511)
    ].max(jnp.where(valid_tok, slot, 0))[:NT]
    tokid_flat = jnp.clip(jax.lax.cummax(slot_at) - 1, 0, L * R - 1)
    rec_of = t_rec.reshape(-1)[tokid_flat]
    is_lit_pos = ((rec_of >> 9) & jnp.uint32(1)) > 0
    payload_of = ((rec_of >> 10) & jnp.uint32(0x7FFF)).astype(jnp.int32)
    pack_of = jnp.where(is_lit_pos, payload_of + 1, 0)
    dist_of = payload_of + 1
    gp = jnp.arange(NT, dtype=jnp.int32)
    start_of = ((tokid_flat // R) * SEG
                + (rec_of & jnp.uint32(0x1FF)).astype(jnp.int32))
    rel = gp - start_of
    q = jnp.floor(rel.astype(jnp.float32) / dist_of.astype(jnp.float32))
    relmod = rel - q.astype(jnp.int32) * dist_of
    src = start_of - dist_of + relmod
    root = jnp.where(is_lit_pos, -pack_of, jnp.clip(src, 0, NT - 1))
    return root


@functools.partial(jax.jit, static_argnames=("n_out", "rounds"))
def doubling_only(root, ns, *, n_out, rounds):
    for _ in range(rounds):
        hop = root[jnp.maximum(root, 0)]
        root = jnp.where(root >= 0, hop, root)
    return root


@functools.partial(jax.jit, static_argnames=())
def argsort_only(root):
    NT = root.shape[0]
    order = jnp.argsort(jnp.where(root >= 0, 0, 1).astype(jnp.int8),
                        stable=True)
    return order[:NT // 8]


def chain(fn, k=4):
    r = fn(); jax.block_until_ready(r)
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter(); jax.block_until_ready(fn()); t1 = time.perf_counter()
    t2 = time.perf_counter()
    for _ in range(k):
        r = fn()
    jax.block_until_ready(r)
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (k - 1)


def main():
    batch = 16
    comps, segs, ns, lit, dist, cap = build_inputs(batch)
    dev = jax.device_put(comps)
    segs_d = jnp.asarray(segs)
    ns_d = jnp.asarray(ns)
    ll_d = jnp.asarray(lit)
    dl_d = jnp.asarray(dist)
    total = batch * BLOCK

    t_rec, _ = scan_only(dev, segs_d, ns_d, ll_d, dl_d, n_out=BLOCK)
    t_rec = jax.device_put(np.asarray(t_rec)).T  # (L, R)

    # NOTE: block_until_ready timing is known optimistic here (r2), but
    # RELATIVE stage ratios are what we need.
    per = chain(lambda: expansion_only(t_rec, ns_d, n_out=BLOCK))
    print("expansion: %.1f ms (%.1f MB/s)" % (per * 1e3, total / per / 1e6), flush=True)

    root = expansion_only(t_rec, ns_d, n_out=BLOCK)
    root = jax.device_put(np.asarray(root))
    nroot = np.asarray(root)
    unresolved = int((nroot >= 0).sum())
    print("positions:", nroot.shape[0], "unresolved after expansion:", unresolved, flush=True)
    for rounds in (1, 4):
        per = chain(lambda: doubling_only(root, ns_d, n_out=BLOCK, rounds=rounds))
        r2 = np.asarray(doubling_only(root, ns_d, n_out=BLOCK, rounds=rounds))
        print("doubling x%d: %.1f ms, unresolved -> %d"
              % (rounds, per * 1e3, int((r2 >= 0).sum())), flush=True)


if __name__ == "__main__":
    main()
