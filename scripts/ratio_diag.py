"""Per-block device-vs-gzip ratio diagnostic on the bench corpus.

Runs on CPU: ratio is device-independent and the axon sitecustomize
overrides JAX_PLATFORMS, so the platform is forced via jax.config
(PLAN.md round-3 environment facts)."""
import sys
import zlib

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels.deflate_jax_v3 import encode_blocks_dyn  # noqa: E402

BLOCK = 1 << 18
B = 16
WCAP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 12
corpus = build_corpus(16 << 20)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(-1, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64

dev_lens = []
for g in range(blocks.shape[0] // B):
    dd = jax.device_put(blocks[g * B : (g + 1) * B])
    _, metas = encode_blocks_dyn(dd, lens_dev, depth=DEPTH, cap=cap, wcap=WCAP)
    dev_lens.extend(np.asarray(metas)[:, 0].tolist())

total_dev = total_gz = 0
rows = []
for i in range(blocks.shape[0]):
    gz = len(zlib.compress(blocks[i].tobytes(), 6))
    total_dev += dev_lens[i]
    total_gz += gz
    rows.append((i, dev_lens[i], gz, dev_lens[i] / gz))
rows.sort(key=lambda r: r[1] - r[2], reverse=True)
print(f"wcap={WCAP} depth={DEPTH} total dev {total_dev} gz {total_gz} "
      f"ratio dev {len(corpus)/total_dev:.3f} gz {len(corpus)/total_gz:.3f}")
print("worst blocks (dev - gz bytes):")
for i, d, g, r in rows[:10]:
    print(f"  blk {i:2d} dev {d:7d} gz {g:7d}  excess {d-g:7d}  x{r:.3f}")
