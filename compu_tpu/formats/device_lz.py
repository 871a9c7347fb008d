"""Hybrid pipelines: device LZ stage feeding the host entropy coders.

All three formats consume the same token-cover contract
(tok_pos, tok_len, tok_dist). DEFLATE's device path stays fully on device
(kernels/deflate_jax_v2.py); zstd and brotli run the shared device
match+parse kernel and keep their entropy stages (FSE / prefix codes) on
the host. Enable per-encoder via the ``device_lz`` option.
"""

from __future__ import annotations

import numpy as np


class DeviceTokenizer:
    """Pads chunks to a fixed block shape and runs the jitted LZ stage.

    One compiled executable per (block_size, max_dist, depth); falls back
    to the host tokenizer transparently if JAX is unavailable.
    """

    def __init__(self, block_size: int, max_dist: int, depth: int = 8) -> None:
        self.block_size = block_size
        self.max_dist = min(max_dist, block_size)
        self.depth = depth

    def __call__(self, data: bytes):
        import jax.numpy as jnp

        from ..kernels.deflate_jax_v2 import device_tokens

        n = len(data)
        padded = np.zeros(self.block_size, dtype=np.uint8)
        padded[:n] = np.frombuffer(data, dtype=np.uint8)
        is_tok, lens, dists = device_tokens(
            jnp.asarray(padded), jnp.int32(n),
            depth=self.depth, max_dist=self.max_dist,
        )
        is_tok = np.asarray(is_tok)[:n]
        lens = np.asarray(lens)[:n]
        dists = np.asarray(dists)[:n]
        tok_pos = np.nonzero(is_tok)[0].astype(np.int64)
        take = lens[tok_pos] >= 3
        tok_len = np.where(take, lens[tok_pos], 0).astype(np.int64)
        tok_dist = np.where(take, dists[tok_pos], 0).astype(np.int64)
        return tok_pos, tok_len, tok_dist
