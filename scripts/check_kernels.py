"""Correctness + chained timing for the rewritten match/parse kernels."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels import deflate_jax_v2 as v2  # noqa: E402
from compu_tpu.kernels.match_pallas import match_candidates_pallas  # noqa: E402
from compu_tpu.kernels.parse_pallas import parse_cover_pallas  # noqa: E402

BLOCK = 1 << 18
B = 16
WCAP = 8
DEPTH = 12
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
dev = jax.device_put(blocks)
print("device:", jax.devices()[0])

# --- correctness: pallas candidates vs XLA roll loop (2 blocks) ----------
sort_fn = functools.partial(v2._sort_stage, wcap=WCAP)
sorted_ops = jax.vmap(sort_fn)(dev[:2], lens_dev[:2])
hs, ps, sw = sorted_ops[0], sorted_ops[1], sorted_ops[2:]
bl_p, bd_p = match_candidates_pallas(
    hs.reshape(-1), ps.reshape(-1), tuple(w.reshape(-1) for w in sw),
    depth=DEPTH, max_dist=32768, block_elems=BLOCK)
cand = functools.partial(v2._candidates_xla, depth=DEPTH, max_dist=32768,
                         wcap=WCAP)
bl_x, bd_x = jax.vmap(cand)(hs, ps, sw)
ok_l = np.array_equal(np.asarray(bl_p).reshape(2, -1), np.asarray(bl_x))
ok_d = np.array_equal(np.asarray(bd_p).reshape(2, -1), np.asarray(bd_x))
print("match pallas == xla:", ok_l, ok_d)

# --- correctness: cover int8 vs bf16 vs einsum ---------------------------
rng = np.random.default_rng(7)
steps = rng.integers(1, 130, 4 * BLOCK).astype(np.int32)
steps[rng.random(4 * BLOCK) < 0.6] = 1
sd = jnp.asarray(steps)
c8 = np.asarray(parse_cover_pallas(sd, use_int8=True))
cb = np.asarray(parse_cover_pallas(sd, use_int8=False))
ce = np.asarray(v2.parse_cover_mxu(sd))
print("cover int8==bf16==einsum:", np.array_equal(c8, cb),
      np.array_equal(cb, ce))


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


def mk_cand_probe(wcap, depth):
    def probe(data_b):
        s = jax.vmap(functools.partial(v2._sort_stage, wcap=wcap))(
            data_b, lens_dev)
        bl, bd = match_candidates_pallas(
            s[0].reshape(-1), s[1].reshape(-1),
            tuple(w.reshape(-1) for w in s[2:]),
            depth=depth, max_dist=32768, block_elems=BLOCK)
        return bl.reshape(B, -1)[:, 0] ^ bd.reshape(B, -1)[:, 0]
    return probe


def mk_sort_probe(wcap):
    def probe(data_b):
        s = jax.vmap(functools.partial(v2._sort_stage, wcap=wcap))(
            data_b, lens_dev)
        return (s[1][:, 0] ^ s[2][:, 0]).astype(jnp.int32)
    return probe


def mk_cover_probe(use_int8):
    def probe(data_b):
        st = (data_b[:, ::1].astype(jnp.int32) % 7 + 1).reshape(-1)
        return jnp.sum(
            parse_cover_pallas(st, use_int8=use_int8).reshape(B, -1), axis=1
        ).astype(jnp.int32)
    return probe


for name, p in [
    ("sort w8", mk_sort_probe(8)),
    ("sort+cand w8 d12", mk_cand_probe(8, 12)),
    ("sort+cand w8 d8", mk_cand_probe(8, 8)),
    ("sort+cand w32 d8", mk_cand_probe(32, 8)),
    ("cover bf16", mk_cover_probe(False)),
    ("cover int8", mk_cover_probe(True)),
]:
    per = chained(p)
    print(f"{name:20s} {per*1000:8.1f} ms/batch", flush=True)
