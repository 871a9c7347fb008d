"""Sweep (wcap, depth) for the v3 kernel: chained on-chip time vs ratio.

wcap controls the bytes carried through the sort per element (sort payload
count AND the XOR/ctz unit count in the Pallas candidate kernel — the two
dominant stages at 5.4 + 18.6 ms/batch of the 41.9 ms total).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels.deflate_jax_v3 import encode_blocks_dyn  # noqa: E402

BLOCK = 1 << 18
B = 16
corpus = build_corpus(4 * B * BLOCK)  # the full 16 MB bench corpus
all_blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(-1, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])
dev0 = jax.device_put(all_blocks[:B])


def timing(wcap, depth, chain=5):
    def probe(data_b):
        _, metas = encode_blocks_dyn(
            data_b, lens_dev, depth=depth, cap=cap, wcap=wcap)
        return metas[:, 0] ^ metas[:, 1]

    f = jax.jit(probe)

    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev0 ^ (sig[:, None] & 1).astype(jnp.uint8)
            sig = f(b).astype(jnp.int32)
        return np.asarray(sig)

    run(1); run(2)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (chain - 1)


def ratio(wcap, depth):
    total = 0
    for g in range(all_blocks.shape[0] // B):
        blocks = jax.device_put(all_blocks[g * B : (g + 1) * B])
        _, metas = encode_blocks_dyn(
            blocks, lens_dev, depth=depth, cap=cap, wcap=wcap)
        total += int(np.asarray(metas)[:, 0].sum())
    return len(corpus) / total


import sys as _sys
CONFIGS = [tuple(map(int, a.split(','))) for a in _sys.argv[1:]] or [(8, 12), (16, 8)]
for wcap, depth in CONFIGS:
    per = timing(wcap, depth)
    r = ratio(wcap, depth)
    mbps = B * BLOCK / per / 1e6
    print(f"wcap={wcap:2d} depth={depth:2d}  {per*1000:7.1f} ms/batch "
          f"{mbps:8.1f} MB/s  ratio {r:.3f}", flush=True)
