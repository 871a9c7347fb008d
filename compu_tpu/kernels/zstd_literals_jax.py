"""Device 4-stream Huffman literal encoding for zstd (RFC 8878 §3.1.1.3).

The literals section is the most parallel entropy stage in zstd: four
independent streams, each a per-byte table lookup + bit pack. The host
builds the tree (tiny: 256-symbol histogram -> 11-bit-capped lengths,
already done for the description header); the device does the per-byte
work: reversed gather (zstd Huffman streams are BACKWARD bitstreams — the
LSB-first byte layout equals the forward pack of the REVERSED symbol
sequence), code/width gathers, cumsum offsets, and a 3-scatter-add byte
pack, for all four streams in one dispatch.

Used by formats/zstd/encode.py's literals section when
ZstdOptions.device_literals is set (the device-LZ + device-literals
hybrid, VERDICT r1 item 8). Output is byte-identical to the host
BackwardBitWriter path (asserted in tests), so streams stay foreign-valid.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("cap",))
def _encode_streams(mat: jnp.ndarray, counts: jnp.ndarray, code: jnp.ndarray,
                    nbits: jnp.ndarray, *, cap: int):
    """mat: u8[4, P] symbol matrix (padded); counts: i32[4]; code/nbits:
    u32/i32[256]. Returns (out u8[4, cap], nbytes i32[4])."""
    S, P = mat.shape
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    n = counts[:, None]
    # Backward stream == forward pack of the reversed sequence.
    rev_idx = jnp.clip(n - 1 - pos, 0, P - 1)
    rev = jnp.take_along_axis(mat, rev_idx.astype(jnp.int32), axis=1)
    valid = pos < n
    nb = jnp.where(valid, nbits[rev], 0)
    cd = jnp.where(valid, code[rev], 0).astype(jnp.uint32)
    off = jnp.cumsum(nb, axis=1) - nb  # exclusive prefix per stream
    total = jnp.sum(nb, axis=1)

    shifted = cd << (off & 7).astype(jnp.uint32)
    bytep = off >> 3
    out = jnp.zeros((S, cap), dtype=jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, P))
    for k in range(3):  # fields are <= 11 bits + 7 phase = 18 bits = 3 bytes
        val = ((shifted >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
        out = out.at[rows.reshape(-1),
                     jnp.clip(bytep + k, 0, cap - 1).reshape(-1)].add(
            jnp.where(valid, val, 0).reshape(-1)
        )
    # sentinel bit on top of each stream, then pad to a byte
    srow = jnp.arange(S, dtype=jnp.int32)
    out = out.at[srow, jnp.clip(total >> 3, 0, cap - 1)].add(
        (1 << (total & 7)).astype(jnp.int32)
    )
    nbytes = (total + 8) // 8
    return (out & 0xFF).astype(jnp.uint8), nbytes


def encode_streams_device(chunks: list[bytes], code: np.ndarray,
                          nbits: np.ndarray) -> list[bytes]:
    """Encode up to 4 literal streams on device; returns the stream blobs
    (byte-identical to BackwardBitWriter). ``code``/``nbits`` may cover
    fewer than 256 symbols; they are padded."""
    S = len(chunks)
    per = max(len(c) for c in chunks)
    # pad the symbol width to 4 KiB buckets to bound jit shapes
    P = max(4096, (per + 4095) // 4096 * 4096)
    cap = (P * 11 + 7) // 8 + 8
    mat = np.zeros((4, P), dtype=np.uint8)
    counts = np.zeros(4, dtype=np.int32)
    for i, c in enumerate(chunks):
        mat[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        counts[i] = len(c)
    code_full = np.zeros(256, dtype=np.uint32)
    nbits_full = np.zeros(256, dtype=np.int32)
    code_full[: len(code)] = code
    nbits_full[: len(nbits)] = nbits
    out, nbytes = _encode_streams(
        jnp.asarray(mat), jnp.asarray(counts), jnp.asarray(code_full),
        jnp.asarray(nbits_full), cap=cap,
    )
    out = np.asarray(out)
    nbytes = np.asarray(nbytes)
    return [out[i, : int(nbytes[i])].tobytes() for i in range(S)]
