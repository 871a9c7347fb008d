"""Benchmark: block-parallel gzip encode on the device compute path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md); the bar is
the driver north star: ~1 GB/s/chip on a Silesia-like corpus.
``vs_baseline`` is therefore the ratio against 1.0 GB/s/chip.

The measured path is the real product path: BlockParallelEncoder →
per-block jitted DEFLATE kernel on the device + host framing/assembly,
output validated as a stock-tool-decodable gzip stream.
"""

from __future__ import annotations

import json
import sys
import time
import zlib

import numpy as np

BLOCK = 1 << 18  # 256 KiB device blocks
TARGET_GBPS = 1.0


def build_corpus(total: int = 16 << 20) -> bytes:
    """Deterministic Silesia-like mix: text, structured records, binary."""
    rng = np.random.default_rng(1234)
    pieces = []
    try:
        text = open("tests/data/alice29.txt", "rb").read()
    except OSError:
        text = b"A mad tea party. " * 10000
    # text with small mutations (so blocks differ)
    while sum(map(len, pieces)) < total // 3:
        t = bytearray(text)
        for _ in range(32):
            t[int(rng.integers(0, len(t)))] = int(rng.integers(32, 127))
        pieces.append(bytes(t))
    # structured: repetitive records with counters
    rec = b"".join(
        b'{"id": %08d, "name": "item-%d", "flags": [1,2,3]}\n' % (i, i % 977)
        for i in range(20000)
    )
    while sum(map(len, pieces)) < 2 * total // 3:
        pieces.append(rec)
    # binary: low-entropy bytes + some noise
    lowent = rng.integers(0, 16, total // 6, dtype=np.uint8).tobytes()
    noise = rng.integers(0, 256, total // 6, dtype=np.uint8).tobytes()
    pieces.append(lowent)
    pieces.append(noise)
    return b"".join(pieces)[:total]


def main() -> None:
    import jax

    from compu_tpu.formats.deflate.options import ZlibMode
    from compu_tpu.kernels.block_codec import make_block_encode_fn
    from compu_tpu.parallel.scheduler import BlockParallelEncoder

    corpus = build_corpus()
    n = len(corpus)

    fn = make_block_encode_fn(ZlibMode.Gzip, level=4, segment_index=True)
    enc = BlockParallelEncoder(fn, block_size=BLOCK, mode=ZlibMode.Gzip)

    # Warm: compile every graph at the exact benchmark shapes (per-block
    # kernels AND the B-ary stack/concat assembly graphs), plus first
    # transfers through the device tunnel.
    enc.encode(bytes(n))

    t0 = time.time()
    stream, index = enc.encode(corpus)
    dt = time.time() - t0

    # Validate: the emitted stream is a standard gzip member.
    decoded = zlib.decompress(stream, wbits=31)
    assert decoded == corpus, "roundtrip mismatch"

    # Secondary: segment-parallel device inflate of our own stream.
    from compu_tpu.parallel.scheduler import BlockParallelDecoder

    dec = BlockParallelDecoder(device=True, block_size=BLOCK)
    got = dec.decode(stream, index)  # compile + warm
    assert got == corpus, "device decode mismatch"
    t1 = time.time()
    got = dec.decode(stream, index)
    dt_dec = time.time() - t1
    assert got == corpus

    gbps = n / dt / 1e9
    ratio = n / len(stream)
    result = {
        "metric": "silesia_like_gzip_encode_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / TARGET_GBPS, 3),
    }
    print(json.dumps(result))
    print(
        f"# {n/1e6:.0f} MB corpus, encode {dt*1000:.0f} ms ({gbps*1000:.1f} MB/s), "
        f"device decode {dt_dec*1000:.0f} ms ({n/dt_dec/1e6:.1f} MB/s, bit-exact), "
        f"ratio {ratio:.2f}x, {len(index.raw_lengths)} blocks, "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
