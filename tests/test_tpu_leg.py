"""Hardware test leg (VERDICT r3 item 6): kernel roundtrips + a scheduler
e2e executed on the REAL chip, so device numerics and layouts are
validated by tests rather than only by bench side-effects.

Run on a machine with a chip:

    COMPU_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Every test here is @pytest.mark.tpu and auto-skips in the CPU suite.
The corpus is kept small (one 256 KiB block batch) so the leg completes
in a few minutes including compiles.
"""

import pathlib
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

pytestmark = pytest.mark.tpu

BLOCK = 1 << 18


def _corpus(n: int) -> bytes:
    alice = (pathlib.Path(__file__).parent / "data" / "alice29.txt").read_bytes()
    rng = np.random.default_rng(11)
    parts = []
    total = 0
    while total < n:
        parts.append(alice)
        junk = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        parts.append(junk)
        total += len(alice) + len(junk)
    return b"".join(parts)[:n]


@pytest.fixture(scope="module")
def device():
    import jax

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        pytest.skip("no accelerator present")
    return devs[0]


def test_v3_encode_roundtrip_on_device(device):
    from compu_tpu.kernels.deflate_jax_v3 import encode_block_dyn

    data = _corpus(BLOCK)
    arr = np.frombuffer(data, dtype=np.uint8)
    import jax.numpy as jnp

    out, meta = encode_block_dyn(
        jnp.asarray(arr), jnp.int32(len(arr)), depth=8, wcap=8)
    clen = int(np.asarray(meta)[0])
    blob = bytes(np.asarray(out)[:clen].tobytes())
    d = zlib.decompressobj(wbits=-15)
    got = d.decompress(blob + b"\x01\x00\x00\xff\xff")
    assert got == data


def test_v2_fixed_encode_roundtrip_on_device(device):
    from compu_tpu.kernels.deflate_jax_v2 import encode_block_fixed_v2

    data = _corpus(BLOCK)
    arr = np.frombuffer(data, dtype=np.uint8)
    import jax.numpy as jnp

    out, meta = encode_block_fixed_v2(jnp.asarray(arr), jnp.int32(len(arr)),
                                      depth=8)
    clen = int(np.asarray(meta)[0])
    blob = bytes(np.asarray(out)[:clen].tobytes())
    got = zlib.decompressobj(wbits=-15).decompress(blob + b"\x01\x00\x00\xff\xff")
    assert got == data


def test_indexed_lut_decode_roundtrip_on_device(device):
    """Encode with the indexed v3 path, decode with the LUT device inflate:
    the full device-only loop, bit-exact."""
    import jax.numpy as jnp

    from compu_tpu.formats.deflate.options import ZlibMode
    from compu_tpu.kernels.block_codec import make_block_encode_fn
    from compu_tpu.kernels.inflate_jax_dyn import parse_block_tables
    from compu_tpu.kernels.inflate_jax_lut import decode_blocks_indexed_lut
    from compu_tpu.parallel.scheduler import BlockParallelEncoder

    batch = 4
    corpus = _corpus(batch * BLOCK)
    fn = make_block_encode_fn(ZlibMode.Gzip, level=6, segment_index=True,
                              pipeline_groups=2)
    enc = BlockParallelEncoder(fn, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(corpus)
    assert zlib.decompress(stream, wbits=31) == corpus

    cap = BLOCK + BLOCK // 4 + 64 + 16
    comps = np.zeros((batch, cap), dtype=np.uint8)
    segs = np.zeros((batch, BLOCK // 128), dtype=np.int32)
    ns = np.zeros(batch, dtype=np.int32)
    lit_lens = np.zeros((batch, 288), dtype=np.int32)
    dist_lens = np.zeros((batch, 30), dtype=np.int32)
    for j in range(batch):
        off = index.compressed_offsets[j]
        clen = index.compressed_lengths[j]
        blob = stream[off: off + clen]
        kind, lit, dist, _ = parse_block_tables(blob[:4096])
        assert kind != 0 and int(np.asarray(index.segment_bits[j])[0]) >= 0
        comps[j, :clen] = np.frombuffer(blob, dtype=np.uint8)
        segs[j] = np.asarray(index.segment_bits[j], dtype=np.int32)
        ns[j] = index.raw_lengths[j]
        lit_lens[j] = lit
        dist_lens[j] = dist
    out, ok = decode_blocks_indexed_lut(
        jnp.asarray(comps), jnp.asarray(segs), jnp.asarray(ns),
        jnp.asarray(lit_lens), jnp.asarray(dist_lens), n_out=BLOCK)
    assert int(np.asarray(ok)[0]) == 1
    got = np.asarray(out).reshape(batch, BLOCK)
    for j in range(batch):
        n = int(ns[j])
        assert got[j, :n].tobytes() == corpus[j * BLOCK: j * BLOCK + n]


def test_zstd_device_stages_on_device(device):
    """Device LZ + device literals + device sequences produce a frame the
    foreign libzstd oracle accepts."""
    import zstandard

    from compu_tpu import ByteVec, EncodeOp, EncodeStatus, encoder
    from compu_tpu.formats.zstd.options import ZstdOptions

    data = _corpus(256 * 1024)
    enc = encoder.Interface.zstd(ZstdOptions(
        level=3, checksum=True, device_lz=True, device_literals=True,
        device_sequences=True))
    vec = ByteVec()
    res = enc.encode_vec_full(data, vec, EncodeOp.Finish)
    assert res.status is EncodeStatus.Finished
    got = zstandard.ZstdDecompressor().decompress(
        vec.data(), max_output_size=len(data) + 64)
    assert got == data


def test_scheduler_e2e_on_device(device):
    """Block-parallel encode on the chip -> standard gzip stream -> device
    indexed decode through the scheduler."""
    from compu_tpu.formats.deflate.options import ZlibMode
    from compu_tpu.kernels.block_codec import make_block_encode_fn
    from compu_tpu.parallel.scheduler import (
        BlockParallelDecoder,
        BlockParallelEncoder,
    )

    corpus = _corpus(4 * BLOCK)
    fn = make_block_encode_fn(ZlibMode.Gzip, level=6, segment_index=True,
                              pipeline_groups=2)
    enc = BlockParallelEncoder(fn, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(corpus)
    assert zlib.decompress(stream, wbits=31) == corpus
    dec = BlockParallelDecoder(device=True, block_size=BLOCK)
    assert dec.decode(stream, index) == corpus
