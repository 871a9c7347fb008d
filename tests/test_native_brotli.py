"""Native (C++) brotli decoder: the second brotli decode implementation
behind the same Interface — mirroring the reference's interchangeable
brotli-C / rust-brotli pair (src/decoder/brotli_c.rs vs brotli.rs).
Foreign-oracle (system libbrotli) + driver styles + cross-implementation
equivalence."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from compu_tpu import Buffer, ByteVec, DecodeStatus, EncodeOp, EncodeStatus, decoder, encoder
from compu_tpu.formats.brotli.native_decode import native_brotli_available
from compu_tpu.formats.brotli.options import BrotliOptions

pytestmark = pytest.mark.skipif(
    not native_brotli_available(), reason="native runtime unavailable"
)

DATA = pathlib.Path(__file__).parent / "data"
ALICE = (DATA / "alice29.txt").read_bytes()


def _oracle():
    import brotli_oracle

    return brotli_oracle


def decode_all(dec, blob):
    vec = ByteVec()
    result = dec.decode_vec_full(blob, vec)
    assert result.status is DecodeStatus.Finished, result
    return vec.data()


@pytest.mark.parametrize("fixture,plain", [
    ("alice29.txt.br", "alice29.txt"),
    ("10x10y.br", "10x10y"),
])
def test_golden_fixture(fixture, plain):
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, (DATA / fixture).read_bytes()) == (DATA / plain).read_bytes()


@pytest.mark.parametrize("quality", [0, 1, 5, 9, 11])
def test_foreign_qualities(quality):
    blob = _oracle().compress(ALICE, quality=quality)
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, blob) == ALICE


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_foreign_modes(mode):
    blob = _oracle().compress(ALICE[:20000], quality=11, mode=mode)
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, blob) == ALICE[:20000]


def test_dictionary_heavy_input():
    # small text triggers static-dictionary references + word transforms
    data = b"This is a test of the static dictionary, for example the words."
    blob = _oracle().compress(data, quality=11)
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, blob) == data


@pytest.mark.parametrize("quality", [1, 5, 9, 11])
def test_own_encoder_roundtrip(quality):
    enc = encoder.Interface.brotli(BrotliOptions(quality=quality))
    vec = ByteVec()
    assert enc.encode_vec_full(ALICE, vec, EncodeOp.Finish).status is EncodeStatus.Finished
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, vec.data()) == ALICE


def test_multi_chunk_stream():
    """Multi-meta-block stream (>1 MiB through the chunking encoder): the
    distance ring must carry across meta-blocks (the r3 ring bug's oracle)."""
    data = (ALICE * 24)[: 3 * (1 << 20)]
    enc = encoder.Interface.brotli(BrotliOptions(quality=5))
    vec = ByteVec()
    assert enc.encode_vec_full(data, vec, EncodeOp.Finish).status is EncodeStatus.Finished
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, vec.data()) == data


def test_partial_output_restart():
    blob = _oracle().compress(ALICE, quality=9)
    dec = decoder.Interface.brotli_native()
    half = len(ALICE) // 2
    first = bytearray(half)
    result = dec.decode(blob, first)
    assert result.status is DecodeStatus.NeedOutput
    second = bytearray(len(ALICE) - half + 64)
    rest = blob[len(blob) - result.input_remain:]
    result = dec.decode(rest, second)
    assert result.status is DecodeStatus.Finished
    produced = len(second) - result.output_remain
    assert bytes(first) + bytes(second[:produced]) == ALICE


def test_buffer_chunked_driver():
    blob = _oracle().compress(ALICE, quality=9)
    dec = decoder.Interface.brotli_native()
    buf = Buffer(4096)
    out = bytearray()
    inp = memoryview(blob)
    while True:
        consumed, result = buf.decode(dec, inp)
        out.extend(buf.data())
        buf.consume()
        inp = inp[consumed:]
        if result.status is DecodeStatus.Finished:
            break
        assert result.status in (DecodeStatus.NeedInput, DecodeStatus.NeedOutput)
    assert bytes(out) == ALICE


def test_chunked_input_feed():
    blob = _oracle().compress(ALICE, quality=11)
    dec = decoder.Interface.brotli_native()
    vec = ByteVec()
    vec.reserve_exact(len(ALICE) + 1024)
    pos = 0
    while pos < len(blob):
        chunk = blob[pos: pos + 997]
        result = dec.decode_vec(chunk, vec)
        assert not result.is_error
        pos += len(chunk) - result.input_remain
        if result.status is DecodeStatus.Finished:
            break
    assert result.status is DecodeStatus.Finished
    assert vec.data() == ALICE


def test_reset_reuse():
    blob = _oracle().compress(ALICE, quality=5)
    dec = decoder.Interface.brotli_native()
    assert decode_all(dec, blob) == ALICE
    assert dec.reset()
    assert decode_all(dec, blob) == ALICE


def test_matches_python_impl():
    for quality in (1, 9, 11):
        blob = _oracle().compress(ALICE, quality=quality)
        a = decode_all(decoder.Interface.brotli(), blob)
        b = decode_all(decoder.Interface.brotli_native(), blob)
        assert a == b == ALICE


def test_truncated_stream_needs_input():
    blob = _oracle().compress(ALICE, quality=9)
    dec = decoder.Interface.brotli_native()
    out = bytearray(len(ALICE) + 64)
    result = dec.decode(blob[: len(blob) // 2], out)
    assert result.status is DecodeStatus.NeedInput


def test_corrupt_stream_never_false_finish():
    """Corruption must surface as a typed error or a starved NeedInput —
    never a false Finished — and must match the Python implementation's
    verdict (brotli has no checksum, so a flipped bit can also legally read
    as a longer meta-block that runs out of input)."""
    blob = bytearray(_oracle().compress(ALICE, quality=9))
    for flip in (len(blob) // 3, len(blob) // 2, 20):
        mutated = bytes(blob[:flip] + bytes([blob[flip] ^ 0xA5]) + blob[flip + 1:])
        out_n = bytearray(len(ALICE) + 64)
        out_p = bytearray(len(ALICE) + 64)
        rn = decoder.Interface.brotli_native().decode(mutated, out_n)
        rp = decoder.Interface.brotli().decode(mutated, out_p)
        assert rn.status is not DecodeStatus.Finished or bytes(out_n) == bytes(out_p)
        if rn.is_error:
            assert rp.is_error
        else:
            assert rn.status == rp.status, (rn, rp)
