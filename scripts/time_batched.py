"""A/B: per-block dispatch vs batched lax.map encode on the real TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels.block_codec import (  # noqa: E402
    _compact, _encode_blocks_batched,
)
from compu_tpu.kernels.deflate_jax_v2 import encode_block_fixed_v2  # noqa: E402

BLOCK = 1 << 18
B = 64
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens = np.full(B, BLOCK, dtype=np.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])

blocks_dev = jax.device_put(blocks)
lens_dev = jnp.asarray(lens)


def per_block():
    outs, metas, segs = [], [], []
    for i in range(B):
        o, m, s = encode_block_fixed_v2(
            blocks_dev[i], jnp.int32(BLOCK), depth=8, cap=cap,
            with_index=True, check="crc",
        )
        outs.append(o); metas.append(m); segs.append(s)
    meta = jnp.stack(metas)
    packed = _compact(jnp.stack(outs), meta[:, 0], cap=cap)
    return packed, meta


def batched():
    packed, metas, segs = _encode_blocks_batched(
        blocks_dev, lens_dev, depth=8, cap=cap, with_index=True, check="crc")
    return packed, metas


for name, f in [("per_block", per_block), ("batched", batched)]:
    t0 = time.time()
    p, m = f()
    m.block_until_ready()
    print(f"{name} compile+run: {time.time()-t0:.2f}s")
    for _ in range(2):
        t0 = time.time()
        p, m = f()
        p.block_until_ready()
        dt = time.time() - t0
        print(f"  {name}: {dt*1000:.1f} ms for {B} blocks "
              f"({B*BLOCK/dt/1e6:.1f} MB/s)")
