"""Device 4-stream Huffman literal DECODE for zstd (RFC 8878 §3.1.1.3).

The literals section is the one stage of zstd decode that is parallel BY
FORMAT DESIGN: four independent backward bitstreams per block (that is
why the 4-stream variant exists). This kernel decodes all four streams of
many blocks as independent lanes: per step each lane extracts the next
``max_bits`` window from its stream (3 byte gathers), looks up
(symbol, nbits) in its flat table, emits one byte, and retires nbits —
the exact semantics of huff.py's HufTable.decode_stream / the C++
decoder's backward reader, vectorized across lanes.

Sequence execution stays host-side (the interleaved FSE state chain is
serial by format; PLAN r4 decode laws) — this covers VERDICT r4 item 8:
the literal stage as a device-decodable chunk, byte-identical to the
host on foreign (libzstd-produced) frames.

Throughput model: ~1 byte/lane/step; parallelism = 4 streams x blocks.
Like the deflate device decode this is latency-bound on TPU — the value
here is stage coverage and the measured number, not speed-of-light.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_steps", "out_cap"))
def _decode_lanes(streams: jnp.ndarray, bits0: jnp.ndarray,
                  counts: jnp.ndarray, sym_tab: jnp.ndarray,
                  nbits_tab: jnp.ndarray, max_bits: jnp.ndarray,
                  *, max_steps: int, out_cap: int):
    """streams u8[L, scap]; bits0 i32[L] (sentinel-stripped bit counts);
    counts i32[L]; sym/nbits u8|i32[L, 2048]; max_bits i32[L].
    Returns (out u8[L, out_cap], ok bool[L])."""
    L, scap = streams.shape
    lanes = jnp.arange(L, dtype=jnp.int32)

    def body(k, carry):
        bits, out, ok = carry
        active = k < counts
        m = max_bits
        idx_pos = bits - m  # may go negative at the tail (zero-fill)
        j = jnp.clip(idx_pos, 0, None) >> 3
        j = jnp.minimum(j, scap - 3)
        b0 = streams[lanes, j].astype(jnp.int32)
        b1 = streams[lanes, j + 1].astype(jnp.int32)
        b2 = streams[lanes, j + 2].astype(jnp.int32)
        w = b0 | (b1 << 8) | (b2 << 16)
        mask = (1 << m) - 1
        idx_pos_c = jnp.clip(idx_pos, 0, None)
        idx = jnp.where(
            idx_pos >= 0,
            (w >> (idx_pos_c - (j << 3))) & mask,
            # negative: (value << -idx_pos) & mask — low bits zero-filled
            (w << jnp.clip(-idx_pos, 0, 16)) & mask,
        )
        nb = nbits_tab[lanes, idx].astype(jnp.int32)
        sym = sym_tab[lanes, idx].astype(jnp.uint8)
        bad = active & (nb == 0)
        out = out.at[:, jnp.minimum(k, out_cap - 1)].set(
            jnp.where(active, sym, out[:, jnp.minimum(k, out_cap - 1)]))
        bits = jnp.where(active, bits - nb, bits)
        ok = ok & ~bad & (bits >= -64)
        return bits, out, ok

    out = jnp.zeros((L, out_cap), jnp.uint8)
    ok = jnp.ones(L, bool)
    bits, out, ok = jax.lax.fori_loop(0, max_steps, body, (bits0, out, ok))
    return out, ok


def decode_4stream_device(bodies: list[bytes], counts: list[int],
                          symbol: np.ndarray, nbits: np.ndarray,
                          max_bits: int) -> bytes | None:
    """Decode the 4 streams of one block on device; returns the literals
    or None on any malformed-stream signal (caller falls back to host).
    ``symbol``/``nbits`` are HufTable's flat 2^max_bits arrays."""
    L = len(bodies)
    if L == 0 or any(len(b) == 0 or b[-1] == 0 for b in bodies):
        return None
    scap = max(8, max(len(b) for b in bodies) + 3)
    streams = np.zeros((L, scap), np.uint8)
    bits0 = np.zeros(L, np.int32)
    for i, b in enumerate(bodies):
        streams[i, : len(b)] = np.frombuffer(b, np.uint8)
        bits0[i] = (len(b) - 1) * 8 + int(b[-1]).bit_length() - 1
    tab = 1 << max_bits
    sym_t = np.zeros((L, 2048), np.int32)
    nb_t = np.zeros((L, 2048), np.int32)
    sym_t[:, :tab] = symbol[None, :tab]
    nb_t[:, :tab] = nbits[None, :tab]
    cnts = np.asarray(counts, np.int32)
    max_steps = int(cnts.max())
    out, ok = _decode_lanes(
        jnp.asarray(streams), jnp.asarray(bits0), jnp.asarray(cnts),
        jnp.asarray(sym_t), jnp.asarray(nb_t),
        jnp.full(L, max_bits, jnp.int32),
        max_steps=max_steps, out_cap=max_steps)
    if not bool(np.all(np.asarray(ok))):
        return None
    outs = np.asarray(out)
    return b"".join(outs[i, : counts[i]].tobytes() for i in range(L))
