"""Stage-level chained timing of the v3 device encoder on the real TPU.

block_until_ready returns before remote completion on this runtime
(PLAN.md), so every number comes from chained dispatches: run k+1's input
xors in one bit of run k's output, forcing serial device execution; the
(K-1) delta between a 1-dispatch and K-dispatch wall time cancels tunnel
costs. Stages are measured as cumulative prefixes of the v3 pipeline and
differenced:

  sort      : the 10-operand lax.sort of stage 1 alone
  stage1    : tokens + histograms (sort + neighbor match + run ext + parse)
  +tables   : stage1 + vmapped tree build
  full      : stage1 + tables + emit (scatter pack) + checksum
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.formats.deflate import consts  # noqa: E402
from compu_tpu.kernels import deflate_jax_v3 as v3  # noqa: E402
from compu_tpu.kernels import deflate_jax_v2 as v2  # noqa: E402

BLOCK = 1 << 18
B = 16
DEPTH = 8
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])
dev = jax.device_put(blocks)


def probe_sort(data_b, lens_b):
    def one(data):
        pos = jnp.arange(BLOCK, dtype=jnp.int32)
        d0 = data.astype(jnp.uint32)
        v3w = d0 | (jnp.roll(d0, -1) << 8) | (jnp.roll(d0, -2) << 16)
        h = (v3w * jnp.uint32(2654435761)) >> jnp.uint32(16)
        words = [v2._u32_words(data, k) for k in range(v2.WCAP // 4)]
        s = jax.lax.sort((h, pos, *words), num_keys=1, is_stable=True)
        return s[1][0] ^ s[2][0]
    return jax.vmap(one)(data_b).astype(jnp.int32)


def probe_stage1(data_b, lens_b):
    def one(data, n):
        tok, lf, df, xl, xd = v3._tokens_and_hist(data, n, depth=DEPTH)
        return lf[0] ^ df[0] ^ jnp.sum(tok["sym"])
    return jax.vmap(one)(data_b, lens_b)


def probe_tables(data_b, lens_b):
    def s1(data, n):
        return v3._tokens_and_hist(data, n, depth=DEPTH)
    tok, lf, df, xl, xd = jax.vmap(s1)(data_b, lens_b)
    tables = jax.vmap(v3._build_tables)(lf, df, xl, xd, lens_b)
    return (tables["header_total"]
            ^ jnp.sum(tables["lit_code"], axis=1).astype(jnp.int32))


def probe_full(data_b, lens_b):
    _, metas = v3.encode_blocks_dyn(data_b, lens_b, depth=DEPTH, cap=cap)
    return metas[:, 0] ^ metas[:, 1]


def probe_parse_lift(data_b, lens_b):
    """match_and_parse only (current einsum parse)."""
    def one(data, n):
        is_tok, bl, bd = v2.match_and_parse(data, n, depth=DEPTH)
        return jnp.sum(is_tok.astype(jnp.int32)) ^ bl[0] ^ bd[0]
    return jax.vmap(one)(data_b, lens_b)


def chained(probe, chain=5):
    f = jax.jit(probe)

    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev ^ (sig[:, None] & 1).astype(jnp.uint8)
            sig = f(b, lens_dev).astype(jnp.int32)
        return np.asarray(sig)

    run(1); run(2)  # compile both variants
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    per = ((t3 - t2) - (t1 - t0)) / (chain - 1)
    return per


def probe_match_noparse(data_b, lens_b):
    """stage-1 without the cover (sort + neighbor match + extensions)."""
    def one(data, n):
        N = data.shape[0]
        pos = jnp.arange(N, dtype=jnp.int32)
        d0 = data.astype(jnp.uint32)
        v3w = d0 | (jnp.roll(d0, -1) << 8) | (jnp.roll(d0, -2) << 16)
        h = (v3w * jnp.uint32(2654435761)) >> jnp.uint32(16)
        h = jnp.where(pos < n - 2, h, jnp.uint32(0x10000) + pos.astype(jnp.uint32))
        words = [v2._u32_words(data, k) for k in range(v2.WCAP // 4)]
        s = jax.lax.sort((h, pos, *words), num_keys=1, is_stable=True)
        hs, ps, sw = s[0], s[1], s[2:]
        bl = jnp.zeros(N, jnp.int32); bd = jnp.zeros(N, jnp.int32)
        for d in range(1, DEPTH + 1):
            same = (hs == jnp.roll(hs, d)) & (pos >= d)
            dist = ps - jnp.roll(ps, d)
            ok = same & (dist > 0) & (dist <= consts.WINDOW_SIZE)
            l = v2._ctz_bytes(sw[0] ^ jnp.roll(sw[0], d))
            for k in range(1, v2.WCAP // 4):
                lk = v2._ctz_bytes(sw[k] ^ jnp.roll(sw[k], d))
                l = l + jnp.where(l == 4 * k, lk, 0)
            l = jnp.where(ok, l, 0)
            better = l > bl
            bl = jnp.where(better, l, bl)
            bd = jnp.where(better, dist, bd)
        _, bl2, bd2 = jax.lax.sort((ps, bl, bd), num_keys=1, is_stable=True)
        return bl2[0] ^ bd2[0]
    return jax.vmap(one)(data_b, lens_b)


def probe_hist(data_b, lens_b):
    """scatter-add histograms on synthetic symbols (stage-1 tail cost)."""
    def one(data, n):
        sym = (data.astype(jnp.int32) + 17) % 286
        is_tok = data > 64
        lf = jnp.zeros(286, jnp.int32).at[
            jnp.where(is_tok, sym, 285)].add(jnp.where(is_tok, 1, 0))
        df = jnp.zeros(30, jnp.int32).at[sym % 30].add(1)
        return lf[0] ^ df[0]
    return jax.vmap(one)(data_b, lens_b)


probes = [
    ("sort", probe_sort),
    ("match_noparse(sort+cand)", probe_match_noparse),
    ("parse_only(match_and_parse)", probe_parse_lift),
    ("hist_scatter_only", probe_hist),
    ("stage1(match+parse+hist)", probe_stage1),
    ("+tables", probe_tables),
    ("full v3", probe_full),
]
results = {}
for name, p in probes:
    per = chained(p)
    results[name] = per
    mbps = B * BLOCK / per / 1e6
    print(f"{name:32s} {per*1000:8.1f} ms/batch({B} blk)  {mbps:8.1f} MB/s")
