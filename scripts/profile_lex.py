"""Stage-level chained timing of the lex-matcher encode path."""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels import deflate_jax_v2 as v2  # noqa: E402
from compu_tpu.kernels import deflate_jax_v3 as v3  # noqa: E402
from compu_tpu.kernels.lcp_match import (  # noqa: E402
    lcp_candidates_pallas, sort_stage_lex)

BLOCK = 1 << 18
B = 16
DEPTH = int(os.environ.get("PROF_DEPTH", "16"))
WCAP = int(os.environ.get("PROF_WCAP", "16"))
CSEG = int(os.environ.get("PROF_CSEG", "128"))
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print(f"device: {jax.devices()[0]}  wcap={WCAP} depth={DEPTH} cseg={CSEG}")
dev = jax.device_put(blocks)


def _sorted(data_b):
    fn = functools.partial(sort_stage_lex, wcap=WCAP)
    return jax.vmap(fn)(data_b, lens_dev)


def _cands(data_b):
    ops = _sorted(data_b)
    bl, bd = lcp_candidates_pallas(
        tuple(w.reshape(-1) for w in ops),
        depth=DEPTH, max_dist=32768, block_elems=BLOCK)
    return ops, bl.reshape(B, BLOCK), bd.reshape(B, BLOCK)


def probe_sort(data_b):
    s = _sorted(data_b)
    return (s[-1][:, 0] ^ s[0][:, 0].astype(jnp.int32))


def probe_cand(data_b):
    _, bl, bd = _cands(data_b)
    return bl[:, 0] ^ bd[:, 0]


def probe_post(data_b):
    ops, bl_s, bd_s = _cands(data_b)
    ps = ops[-1]
    post_fn = functools.partial(v2._post_match, max_len=258, wcap=WCAP,
                                seg=CSEG)
    step_arr, bl, bd, in_range, uncl = jax.vmap(post_fn)(
        data_b, lens_dev, ps, bl_s, bd_s)
    return step_arr[:, 0] ^ bl[:, 0] ^ bd[:, 0]


def probe_cover(data_b):
    is_tok, bl, bd = v2.match_and_parse_batch(
        data_b, lens_dev, depth=DEPTH, wcap=WCAP, cover_seg=CSEG)
    return jnp.sum(is_tok, axis=1).astype(jnp.int32) ^ bl[:, 0]


def probe_tok(data_b):
    is_tok, bl, bd = v2.match_and_parse_batch(
        data_b, lens_dev, depth=DEPTH, wcap=WCAP, cover_seg=CSEG)

    def stage1(data, n, t, l, d):
        tok, lf, df, xl, xd = v3._tok_hist_from_match(data, n, t, l, d)
        chk = v3._block_checksum(data, n, "crc")
        return lf[0] ^ df[0] ^ jnp.sum(tok["sym"]) ^ chk.astype(jnp.int32)

    return jax.vmap(stage1)(data_b, lens_dev, is_tok, bl, bd)


def probe_full(data_b):
    _, metas = v3.encode_blocks_dyn(
        data_b, lens_dev, depth=DEPTH, cap=cap, wcap=WCAP, cover_seg=CSEG,
        check="crc")
    return metas[:, 0] ^ metas[:, 1]


def chained(probe, chain=5):
    f = jax.jit(probe)

    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev ^ (sig[:, None] & 1).astype(jnp.uint8)
            sig = f(b).astype(jnp.int32)
        return np.asarray(sig)

    run(1); run(2)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (chain - 1)


probes = [
    ("sort(lex)", probe_sort),
    ("+cand(lcp)", probe_cand),
    ("+post", probe_post),
    ("+cover+merge", probe_cover),
    ("+tok_hist+chk", probe_tok),
    ("full v3", probe_full),
]
prev = 0.0
for name, p in probes:
    per = chained(p)
    mbps = B * BLOCK / per / 1e6
    print(f"{name:16s} {per*1000:8.1f} ms/batch  delta {1000*(per-prev):7.1f}"
          f" ms  {mbps:8.1f} MB/s", flush=True)
    prev = per
