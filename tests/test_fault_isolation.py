"""Per-block failure isolation in the block-parallel scheduler: one bad
block (or a wholesale device failure) must not abort the stream — the
scheduler records per-block statuses (mirroring the Encode/Decode status
model, SURVEY §2c) and retries failed blocks on the host oracle.
Pins VERDICT r1 item 10."""

import pathlib
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu.formats.deflate.options import ZlibMode
from compu_tpu.parallel.scheduler import (
    BlockParallelEncoder,
    BlockParallelDecoder,
    BlockState,
    _host_encode_block,
)

BLOCK = 1 << 16
DATA = (open(pathlib.Path(__file__).parent / "data" / "alice29.txt", "rb").read() * 2)[
    : 4 * BLOCK + 1234
]


def _good_fn(blocks, lens):
    outs, out_lens, checks = [], [], []
    for i in range(blocks.shape[0]):
        blob, chk = _host_encode_block(blocks[i, : int(lens[i])].tobytes(), ZlibMode.Gzip)
        outs.append(np.frombuffer(blob, dtype=np.uint8))
        out_lens.append(len(blob))
        checks.append(chk)
    return outs, np.asarray(out_lens), np.asarray(checks, dtype=np.uint64)


def test_wholesale_device_failure_falls_back_to_host():
    def boom(blocks, lens):
        raise RuntimeError("injected device failure")

    enc = BlockParallelEncoder(boom, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(DATA)
    assert zlib.decompress(stream, wbits=31) == DATA
    assert all(st.state == BlockState.HostFallback for st in enc.block_statuses)
    assert all("injected" in st.error for st in enc.block_statuses)


def test_single_bad_block_is_retried_host_side():
    def one_bad(blocks, lens):
        outs, out_lens, checks = _good_fn(blocks, lens)
        out_lens = np.asarray(out_lens).copy()
        out_lens[1] = 0  # invalid: empty output for a nonempty block
        return outs, out_lens, checks

    enc = BlockParallelEncoder(one_bad, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(DATA)
    assert zlib.decompress(stream, wbits=31) == DATA
    states = [st.state for st in enc.block_statuses]
    assert states[1] == BlockState.HostFallback
    assert states[0] == BlockState.Ok and states[2] == BlockState.Ok


def test_fallback_disabled_raises():
    def boom(blocks, lens):
        raise RuntimeError("injected device failure")

    enc = BlockParallelEncoder(boom, block_size=BLOCK, mode=ZlibMode.Gzip,
                               host_fallback=False)
    with pytest.raises(RuntimeError):
        enc.encode(DATA)
    assert all(st.state == BlockState.Failed for st in enc.block_statuses)


def test_decoder_per_block_statuses():
    enc = BlockParallelEncoder(_good_fn, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(DATA)
    dec = BlockParallelDecoder()
    assert dec.decode(stream, index) == DATA
    assert all(st.state == BlockState.Ok for st in dec.block_statuses)
    # Corrupt one block: its decode fails, the status names the block.
    bad = bytearray(stream)
    off = index.compressed_offsets[2] + 10
    bad[off] ^= 0xFF
    dec2 = BlockParallelDecoder()
    with pytest.raises(Exception):
        dec2.decode(bytes(bad), index)
    states = [st.state for st in dec2.block_statuses]
    assert states[2] == BlockState.Failed
    assert states[0] == BlockState.Ok
