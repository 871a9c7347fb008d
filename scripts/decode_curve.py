"""VERDICT r4 item 3: the measured ratio-vs-device-decode curve for
encode-time chain shortening. Variants (env COMPU_LCP_TIE / COMPU_RUN_EXT
re-trace the encode graphs per process, so each variant runs in a child):

  near     — default tie-break (closest equal-length source)
  far      — equal-length ties pick the FARTHEST in-window source, so
             back-reference chains collapse toward the earliest
             occurrence (shallow pointer-resolution graphs)
  far+norun— additionally disable the dist-1 run extension (runs are the
             deepest chains of all: depth == run length)

Prints ratio + chained device-decode rate per variant.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure() -> dict:
    sys.path.insert(0, REPO)
    import zlib

    from bench import BLOCK, build_corpus, decode_kernel_mbps
    from compu_tpu.formats.deflate.options import ZlibMode
    from compu_tpu.kernels.block_codec import make_block_encode_fn
    from compu_tpu.parallel.scheduler import BlockParallelEncoder

    corpus = build_corpus(16 << 20)
    fn = make_block_encode_fn(ZlibMode.Gzip, level=6, segment_index=True,
                              pipeline_groups=4)
    enc = BlockParallelEncoder(fn, block_size=BLOCK, mode=ZlibMode.Gzip)
    stream, index = enc.encode(corpus)
    assert zlib.decompress(stream, wbits=31) == corpus
    mbps = decode_kernel_mbps(stream, index)
    return {"variant": os.environ.get("VARIANT", "near"),
            "ratio": round(len(corpus) / len(stream), 3),
            "decode_kernel_MBps": round(mbps, 1)}


def main():
    if os.environ.get("VARIANT"):
        print(json.dumps(measure()))
        return
    rows = []
    for name, env in (
        ("near", {}),
        ("far", {"COMPU_LCP_TIE": "far"}),
        ("far+norun", {"COMPU_LCP_TIE": "far", "COMPU_RUN_EXT": "0"}),
    ):
        e = dict(os.environ, VARIANT=name, **env)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=e, capture_output=True, text=True,
                           timeout=1200)
        if r.returncode != 0:
            print(name, "FAILED", r.stderr[-800:], file=sys.stderr)
            continue
        row = json.loads(r.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
