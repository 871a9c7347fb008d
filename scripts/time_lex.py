"""Chained timing of the full v3 batch kernel across matcher configs."""
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

BLOCK = 1 << 18
B = 16
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])
dev = jax.device_put(blocks)


def chained(f, chain=5):
    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev ^ (sig[:, None] & 1).astype(jnp.uint8)
            m = f(b)
            sig = (m[:, 0] ^ m[:, 1]).astype(jnp.int32)
        return np.asarray(sig)

    run(1); run(2)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (chain - 1)


configs = [
    ("hash", 16, 32),
    ("lex", 16, 16),
    ("lex", 16, 8),
    ("lex", 16, 24),
    ("lex", 8, 8),
]
if len(sys.argv) > 1:
    configs = [tuple(c.split(":")) for c in sys.argv[1:]]
    configs = [(m, int(w), int(d)) for m, w, d in configs]

for matcher, wcap, depth in configs:
    def f(b, matcher=matcher, wcap=wcap, depth=depth):
        _, metas = v3.encode_blocks_dyn(
            b, lens_dev, depth=depth, cap=cap, wcap=wcap, matcher=matcher,
            check="crc")
        return metas

    per = chained(jax.jit(f))
    mbps = B * BLOCK / per / 1e6
    print(f"{matcher} wcap{wcap} d{depth}: {per*1000:7.1f} ms/batch  "
          f"{mbps:7.1f} MB/s", flush=True)
