"""Corruption robustness fuzz: random bit/byte damage to valid streams must
surface as a typed DecodeError or wrong-but-bounded output — never an
uncaught exception, hang, or silent false Finished with matching output."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from compu_tpu import ByteVec, DecodeStatus, EncodeOp, decoder, encoder

DATA = pathlib.Path(__file__).parent / "data"
ALICE = (DATA / "alice29.txt").read_bytes()[:30000]


def _encode(make_enc):
    enc = make_enc()
    vec = ByteVec()
    enc.encode_vec_full(ALICE, vec, EncodeOp.Finish)
    return vec.data()


@pytest.mark.parametrize(
    "name,make_enc,make_dec",
    [
        ("zlib", encoder.Interface.zlib, decoder.Interface.zlib),
        ("zstd", encoder.Interface.zstd, decoder.Interface.zstd),
        ("brotli", encoder.Interface.brotli, decoder.Interface.brotli),
    ],
)
def test_random_corruption(name, make_enc, make_dec):
    blob = bytearray(_encode(make_enc))
    rng = np.random.default_rng(hash(name) % 2**32)
    for trial in range(24):
        bad = bytearray(blob)
        mode = trial % 3
        if mode == 0:  # single byte flip
            bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        elif mode == 1:  # truncate
            del bad[int(rng.integers(1, len(bad))):]
        else:  # splice garbage
            at = int(rng.integers(0, len(bad)))
            bad[at : at + 8] = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
        dec = make_dec()
        vec = ByteVec()
        result = dec.decode_vec_full(bytes(bad), vec)  # must not raise
        if result.status is DecodeStatus.Finished and not result.is_error:
            # A lucky decode may finish; it must not silently produce the
            # original bytes from a damaged stream unless the damage was in
            # trailing garbage the decoder legitimately ignored.
            if vec.data() == ALICE:
                assert result.input_remain > 0 or mode != 0 or bad == blob
        dec.reset()  # state machine stays usable after any outcome
