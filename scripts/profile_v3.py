"""Stage-level chained timing of the v3 device encoder on the real TPU.

block_until_ready returns before remote completion on this runtime
(PLAN.md), so every number comes from chained dispatches: run k+1's input
xors in one bit of run k's output, forcing serial device execution; the
(K-1) delta between a 1-dispatch and K-dispatch wall time cancels tunnel
costs. Stages are measured as cumulative prefixes of the PRODUCTION batch
pipeline (encode_blocks_dyn's exact structure) and differenced:

  sort       : vmapped 10-operand lax.sort (stage-1 head)
  +cand      : + Pallas sorted-neighbor candidates
  +post      : + sort-back / chain+run extension / heuristics
  +cover     : + Pallas greedy cover  (== match_and_parse_batch)
  +tok_hist  : + token symbols + MXU histograms + checksum
  +tables    : + vmapped tree build
  full       : + emit (the complete encode_blocks_dyn)
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels import deflate_jax_v3 as v3  # noqa: E402
from compu_tpu.kernels import deflate_jax_v2 as v2  # noqa: E402

BLOCK = 1 << 18
B = 16
DEPTH = int(os.environ.get("PROF_DEPTH", "8"))
WCAP = int(os.environ.get("PROF_WCAP", str(v2.WCAP)))
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])
dev = jax.device_put(blocks)


def _sorted(data_b):
    sort_fn = functools.partial(v2._sort_stage, wcap=WCAP)
    return jax.vmap(sort_fn)(data_b, lens_dev)


def _cands(data_b):
    sorted_ops = _sorted(data_b)
    hs, ps = sorted_ops[0], sorted_ops[1]
    sw = sorted_ops[2:]
    from compu_tpu.kernels.match_pallas import match_candidates_pallas

    bl_f, bd_f = match_candidates_pallas(
        hs.reshape(-1), ps.reshape(-1), tuple(w.reshape(-1) for w in sw),
        depth=DEPTH, max_dist=32768, block_elems=BLOCK,
    )
    return sorted_ops, bl_f.reshape(B, BLOCK), bd_f.reshape(B, BLOCK)


def _post(data_b):
    sorted_ops, bl_s, bd_s = _cands(data_b)
    ps = sorted_ops[1]
    post_fn = functools.partial(v2._post_match, max_len=258, wcap=WCAP)
    return jax.vmap(post_fn)(data_b, lens_dev, ps, bl_s, bd_s)


def probe_sort(data_b):
    s = _sorted(data_b)
    return (s[1][:, 0] ^ s[2][:, 0]).astype(jnp.int32)


def probe_cand(data_b):
    _, bl, bd = _cands(data_b)
    return bl[:, 0] ^ bd[:, 0]


def probe_post(data_b):
    step_arr, bl, bd, in_range, uncl = _post(data_b)
    return step_arr[:, 0] ^ bl[:, 0] ^ bd[:, 0]


def probe_cover(data_b):
    is_tok, bl, bd = v2.match_and_parse_batch(data_b, lens_dev, depth=DEPTH, wcap=WCAP)
    return jnp.sum(is_tok, axis=1).astype(jnp.int32) ^ bl[:, 0]


def probe_tok_hist(data_b):
    is_tok, bl, bd = v2.match_and_parse_batch(data_b, lens_dev, depth=DEPTH, wcap=WCAP)

    def stage1(data, n, t, l, d):
        tok, lf, df, xl, xd = v3._tok_hist_from_match(data, n, t, l, d)
        chk = v3._block_checksum(data, n, "crc")
        return lf[0] ^ df[0] ^ jnp.sum(tok["sym"]) ^ chk.astype(jnp.int32)

    return jax.vmap(stage1)(data_b, lens_dev, is_tok, bl, bd)


def probe_tables(data_b):
    is_tok, bl, bd = v2.match_and_parse_batch(data_b, lens_dev, depth=DEPTH, wcap=WCAP)
    tok, lf, df, xl, xd = jax.vmap(v3._tok_hist_from_match)(
        data_b, lens_dev, is_tok, bl, bd)
    tables = jax.vmap(v3._build_tables)(lf, df, xl, xd, lens_dev)
    return (tables["header_total"]
            ^ jnp.sum(tables["lit_code"], axis=1).astype(jnp.int32))


def probe_full(data_b):
    _, metas = v3.encode_blocks_dyn(data_b, lens_dev, depth=DEPTH, cap=cap, wcap=WCAP)
    return metas[:, 0] ^ metas[:, 1]


def chained(probe, chain=5):
    f = jax.jit(probe)

    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev ^ (sig[:, None] & 1).astype(jnp.uint8)
            sig = f(b).astype(jnp.int32)
        return np.asarray(sig)

    run(1); run(2)  # compile both variants
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    per = ((t3 - t2) - (t1 - t0)) / (chain - 1)
    return per


probes = [
    ("sort", probe_sort),
    ("+cand (pallas)", probe_cand),
    ("+post (ext/heur)", probe_post),
    ("+cover (pallas)", probe_cover),
    ("+tok_hist+chk", probe_tok_hist),
    ("+tables", probe_tables),
    ("full v3", probe_full),
]
prev = 0.0
for name, p in probes:
    per = chained(p)
    mbps = B * BLOCK / per / 1e6
    print(f"{name:24s} {per*1000:8.1f} ms/batch({B} blk)  "
          f"delta {1000*(per-prev):7.1f} ms  {mbps:8.1f} MB/s", flush=True)
    prev = per
