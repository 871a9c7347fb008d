"""Component-wise timing of the indexed LUT decode on real hardware:
scan phase vs expansion/resolution. Chained dispatch timing (PLAN.md
measurement hygiene). Clean exits only (axon)."""

import os
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# terminal-side compile + persistent cache (bench.py environment facts)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "0")

import numpy as np
import jax
import jax.numpy as jnp
import functools

from compu_tpu.kernels.inflate_jax_dyn import parse_block_tables
from compu_tpu.kernels import inflate_jax_lut as LUT
from compu_tpu.kernels.inflate_jax import _expand_and_resolve
from compu_tpu.kernels.deflate_jax_v2 import SEG
from compu_tpu.kernels.block_codec import make_block_encode_fn
from compu_tpu.parallel.scheduler import BlockParallelEncoder

BLOCK = 1 << 18


def build_inputs(batch=16):
    import pathlib as _p

    cache = _p.Path("/tmp/decode_probe_inputs_%d.npz" % batch)
    if cache.exists():
        z = np.load(cache)
        return (z["comps"], z["segs"], z["ns"], z["lit"], z["dist"],
                int(z["cap"]))
    from bench import build_corpus
    from compu_tpu.formats.deflate.options import ZlibMode

    corpus = build_corpus(batch * BLOCK + BLOCK)
    fn = make_block_encode_fn(ZlibMode.Gzip, level=6, segment_index=True,
                              pipeline_groups=4)
    enc = BlockParallelEncoder(fn, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(corpus)
    cap = BLOCK + BLOCK // 4 + 64 + 16
    comps = np.zeros((batch, cap), dtype=np.uint8)
    segs = np.zeros((batch, BLOCK // SEG), dtype=np.int32)
    ns = np.zeros(batch, dtype=np.int32)
    lit_lens = np.zeros((batch, 288), dtype=np.int32)
    dist_lens = np.zeros((batch, 30), dtype=np.int32)
    j = 0
    for b in range(len(index.raw_lengths)):
        if j == batch:
            break
        off = index.compressed_offsets[b]
        clen = index.compressed_lengths[b]
        blob = stream[off: off + clen]
        kind, lit, dist, _ = parse_block_tables(blob[:4096])
        if kind == 0 or int(np.asarray(index.segment_bits[b])[0]) < 0:
            continue
        comps[j, :clen] = np.frombuffer(blob, dtype=np.uint8)
        segs[j] = np.asarray(index.segment_bits[b], dtype=np.int32)
        ns[j] = index.raw_lengths[b]
        lit_lens[j] = lit
        dist_lens[j] = dist
        j += 1
    assert j == batch, j
    np.savez(cache, comps=comps, segs=segs, ns=ns, lit=lit_lens,
             dist=dist_lens, cap=np.int64(cap))
    return comps, segs, ns, lit_lens, dist_lens, cap


# --- scan-only variant (phase 1), copied call into module internals ------
@functools.partial(jax.jit, static_argnames=("n_out",))
def scan_only(comps, seg_bits, ns, lit_lens, dist_lens, *, n_out):
    B, CAP = comps.shape
    N = n_out
    S = N // SEG
    L = B * S
    lit_lut = jax.vmap(LUT._lit_lut_block)(lit_lens).reshape(-1)
    dist_lut = jax.vmap(LUT._dist_lut_block)(dist_lens).reshape(-1)
    c4 = comps.reshape(B * CAP // 4, 4).astype(jnp.uint32)
    comp32 = c4[:, 0] | (c4[:, 1] << 8) | (c4[:, 2] << 16) | (c4[:, 3] << 24)
    A = comp32.reshape(-1, 4)
    A1 = jnp.concatenate([A[1:], jnp.zeros((1, 4), jnp.uint32)])
    A2 = jnp.concatenate([A[2:], jnp.zeros((2, 4), jnp.uint32)])
    comp12 = jnp.concatenate([A, A1, A2], axis=1)
    lane = jnp.arange(L, dtype=jnp.int32)
    blk = lane // S
    seg = lane % S
    seg_flat = seg_bits.reshape(L).astype(jnp.int32)
    ov = (seg_flat >> 24) & 0xFF
    bit0 = seg_flat & 0xFFFFFF
    ov_next = jnp.where(
        seg + 1 < S,
        (jnp.concatenate([seg_flat[1:], jnp.zeros(1, jnp.int32)]) >> 24) & 0xFF,
        0,
    )
    target = jnp.clip(
        jnp.minimum((seg + 1) * SEG + ov_next, ns[blk]) - seg * SEG,
        0, SEG + 255,
    )
    word_base = blk * (CAP // 4)
    lut_base = blk * LUT.LUT

    def step(carry):
        t, bit, outp, t_rec, bad = carry
        gword = word_base + (bit >> 5)
        row = gword >> 2
        w = jnp.take(comp12, row, axis=0)
        ph = ((bit & 31) + ((gword & 3) << 5)).astype(jnp.int32)
        active = outp < target
        recs = []
        for _ in range(LUT.K):
            fits = ph <= 319
            live = active & fits
            q = ph >> 5
            sh = (ph & 31).astype(jnp.uint32)
            w0 = LUT._mux12(w, q)
            w1 = LUT._mux12(w, q + 1)
            w2 = LUT._mux12(w, q + 2)
            nz = sh > 0
            inv = (jnp.uint32(32) - sh) & jnp.uint32(31)
            lo = (w0 >> sh) | jnp.where(nz, w1 << inv, jnp.uint32(0))
            hi = (w1 >> sh) | jnp.where(nz, w2 << inv, jnp.uint32(0))
            a = lit_lut[lut_base + (lo & (LUT.LUT - 1)).astype(jnp.int32)]
            kind = a & 3
            clen = (a >> 2) & 15
            lxb = (a >> 6) & 7
            arg = (a >> 9) & 0xFF
            is_lit = live & (kind == 0)
            is_m = live & (kind == 1)
            bad = bad | (live & (kind >= 2))
            lextra = ((lo >> clen.astype(jnp.uint32)).astype(jnp.int32)
                      & ((1 << lxb) - 1))
            mlen = 3 + arg + lextra
            dsh = (clen + lxb).astype(jnp.uint32)
            wB = (lo >> dsh) | jnp.where(
                dsh > 0, hi << ((jnp.uint32(32) - dsh) & jnp.uint32(31)),
                jnp.uint32(0))
            d = dist_lut[lut_base + (wB & (LUT.LUT - 1)).astype(jnp.int32)]
            dvalid = d & 1
            dlen = (d >> 1) & 15
            dxb = (d >> 5) & 15
            dist = 1 + ((d >> 9) & 0x7FFF) + (
                (wB >> dlen.astype(jnp.uint32)).astype(jnp.int32)
                & ((1 << dxb) - 1))
            bad = bad | (is_m & (dvalid == 0))
            adv = jnp.where(is_lit, clen,
                            jnp.where(is_m, clen + lxb + dlen + dxb, 0))
            outlen = jnp.where(is_lit, 1, jnp.where(is_m, mlen, 0))
            emit = is_lit | is_m
            payload = jnp.where(is_lit, arg, dist - 1)
            recs.append(
                jnp.where(emit, outp, 511).astype(jnp.uint32)
                | (is_lit.astype(jnp.uint32) << 9)
                | (payload.astype(jnp.uint32) << 10)
            )
            ph = ph + adv
            bit = bit + adv
            outp = outp + outlen
            active = active & (outp < target)
        t_rec = jax.lax.dynamic_update_slice(
            t_rec, jnp.stack(recs), (t * LUT.K, 0))
        return (t + 1, bit, outp, t_rec, bad)

    def not_done(carry):
        t, bit, outp, t_rec, bad = carry
        return (t < LUT.RSTEPS) & jnp.any(outp < target)

    init = (
        jnp.int32(0), bit0, jnp.minimum(ov, target),
        jnp.full((LUT.R, L), 511, jnp.uint32), jnp.zeros(L, dtype=bool),
    )
    _, bit, outp, t_rec, bad = jax.lax.while_loop(not_done, step, init)
    return t_rec, outp


@functools.partial(jax.jit, static_argnames=("n_out",))
def resolve_only(t_rec, ns, *, n_out):
    B = ns.shape[0]
    N = n_out
    S = N // SEG
    L = B * S
    lane = jnp.arange(L, dtype=jnp.int32)
    return _expand_and_resolve(t_rec.T, lane, ns, jnp.bool_(True),
                               B=B, N=N, S=S, R=LUT.R)


def chain_time(fn, feedback, k=5):
    """fn() -> device array; feedback mixes output into next input."""
    fn()
    fn()
    t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
    t2 = time.perf_counter()
    for _ in range(k):
        fn()
    t3 = time.perf_counter()
    del feedback
    return ((t3 - t2) - (t1 - t0)) / (k - 1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    comps, segs, ns, lit, dist, cap = build_inputs(batch)
    dev = jax.device_put(comps)
    segs_d = jnp.asarray(segs)
    ns_d = jnp.asarray(ns)
    ll_d = jnp.asarray(lit)
    dl_d = jnp.asarray(dist)
    total = batch * BLOCK

    # full decode (chained like bench)
    def run_full(kk):
        c = dev
        out = None
        for _ in range(kk):
            if out is not None:
                c = dev.at[0, cap - 1].set(out[0] & 1)
            out, ok = LUT.decode_blocks_indexed_lut(
                c, segs_d, ns_d, ll_d, dl_d, n_out=BLOCK)
        return np.asarray(out[:1]), np.asarray(ok)

    run_full(1); run_full(2)
    t0 = time.perf_counter(); run_full(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run_full(5); t3 = time.perf_counter()
    per = ((t3 - t2) - (t1 - t0)) / 4
    print("full decode: %.1f ms -> %.1f MB/s" % (per * 1e3, total / per / 1e6))

    # scan only
    def run_scan(kk):
        c = dev
        out = None
        for _ in range(kk):
            if out is not None:
                c = dev.at[0, cap - 1].set((out[0, 0] & 1).astype(jnp.uint32).astype(jnp.uint8))
            out, outp = scan_only(c, segs_d, ns_d, ll_d, dl_d, n_out=BLOCK)
        return np.asarray(out[:1, :1]), np.asarray(outp[:1])

    run_scan(1); run_scan(2)
    t0 = time.perf_counter(); run_scan(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run_scan(5); t3 = time.perf_counter()
    per_scan = ((t3 - t2) - (t1 - t0)) / 4
    print("scan only: %.1f ms -> %.1f MB/s" % (per_scan * 1e3, total / per_scan / 1e6))

    # resolve only (feed scan output once, then chain)
    t_rec, _ = scan_only(dev, segs_d, ns_d, ll_d, dl_d, n_out=BLOCK)
    t_rec = jax.device_put(np.asarray(t_rec))

    def run_res(kk):
        tr = t_rec
        out = None
        for _ in range(kk):
            if out is not None:
                tr = t_rec.at[0, 0].set(t_rec[0, 0] | (out[0] & 1).astype(jnp.uint32))
            out, ok = resolve_only(tr, ns_d, n_out=BLOCK)
        return np.asarray(out[:1]), np.asarray(ok)

    run_res(1); run_res(2)
    t0 = time.perf_counter(); run_res(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run_res(5); t3 = time.perf_counter()
    per_res = ((t3 - t2) - (t1 - t0)) / 4
    print("resolve only: %.1f ms -> %.1f MB/s" % (per_res * 1e3, total / per_res / 1e6))
    print("devices:", jax.devices())


if __name__ == "__main__":
    main()
