"""Chained timing of v3 emit-stage internals (throwaway experiment)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_corpus  # noqa: E402
from compu_tpu.kernels import deflate_jax_v3 as v3  # noqa: E402
from compu_tpu.kernels.deflate_jax_v2 import SEG  # noqa: E402

BLOCK = 1 << 18
B = 16
DEPTH = 8
corpus = build_corpus(B * BLOCK)
blocks = np.frombuffer(corpus, dtype=np.uint8).reshape(B, BLOCK)
lens_dev = jnp.full(B, BLOCK, jnp.int32)
cap = BLOCK + BLOCK // 4 + 64
print("device:", jax.devices()[0])
dev = jax.device_put(blocks)


def make_emit_prefix(upto):
    """Return a probe running stage1+tables+emit-prefix `upto`."""

    def probe(data_b, lens_b):
        def s1(data, n):
            return v3._tokens_and_hist(data, n, depth=DEPTH)
        tok, lf, df, xl, xd = jax.vmap(s1)(data_b, lens_b)
        tables = jax.vmap(v3._build_tables)(lf, df, xl, xd, lens_b)

        def stage3(args):
            data, n, tok_b, tables_b = args
            N = data.shape[0]
            lit_len, lit_code = tables_b["lit_len"], tables_b["lit_code"]
            dist_len, dist_code = tables_b["dist_len"], tables_b["dist_code"]
            is_match = tok_b["is_match"]
            is_lit = tok_b["is_lit"]
            sym = tok_b["sym"]
            code_l = lit_code[sym]
            len_l = lit_len[sym]
            f0_val = jnp.where(
                is_match, code_l | (tok_b["lextra"] << len_l.astype(jnp.uint32)),
                code_l)
            f0_bits = jnp.where(is_match, len_l + tok_b["e_l"],
                                jnp.where(is_lit, len_l, 0))
            code_d = dist_code[tok_b["dsym"]]
            len_d = dist_len[tok_b["dsym"]]
            f1_val = code_d | (tok_b["dextra"] << len_d.astype(jnp.uint32))
            f1_bits = jnp.where(is_match, len_d + tok_b["e_d"], 0)
            if upto == "lookups":
                return (f0_val[0] ^ f1_val[0]).astype(jnp.int32) + f0_bits[0]
            header_total = tables_b["header_total"]
            per_pos = f0_bits + f1_bits
            base = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(per_pos)])
            off_f0 = header_total + base[:N]
            off_f1 = off_f0 + f0_bits
            if upto == "cumsum":
                return off_f1[0] + off_f0[N - 1]
            S = N // SEG
            W, W2 = 256, 512
            seg_bit0 = off_f0.reshape(S, SEG)[:, 0]
            gbyte = seg_bit0 >> 3
            fine = gbyte & (W - 1)
            qrow = gbyte >> 8
            loc_f0 = off_f0.reshape(S, SEG) - seg_bit0[:, None]
            loc_f1 = off_f1.reshape(S, SEG) - seg_bit0[:, None]
            floc = jnp.concatenate([loc_f0, loc_f1], axis=1)
            fvals = jnp.concatenate(
                [f0_val.reshape(S, SEG), f1_val.reshape(S, SEG)], axis=1
            ).astype(jnp.uint32)
            fbits = jnp.concatenate(
                [f0_bits.reshape(S, SEG), f1_bits.reshape(S, SEG)], axis=1)
            shifted = jnp.where(fbits > 0,
                                fvals << (floc & 7).astype(jnp.uint32), 0)
            bytep = jnp.clip((floc >> 3) + fine[:, None], 0, W2 - 1)
            qv = bytep >> 4
            rv = bytep & 15
            a = (qv[:, :, None]
                 == jax.lax.broadcasted_iota(jnp.int32, (S, 2 * SEG, W2 // 16), 2)
                 ).astype(jnp.bfloat16)
            val4 = jnp.stack(
                [((shifted >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                  ).astype(jnp.bfloat16) for k in range(4)], axis=-1)
            b = ((rv[:, :, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (S, 2 * SEG, 16), 2)
                  ).astype(jnp.bfloat16)[:, :, :, None] * val4[:, :, None, :]
                 ).reshape(S, 2 * SEG, 64)
            out1 = jnp.einsum("sfq,sfv->sqv", a, b,
                              preferred_element_type=jnp.float32).astype(jnp.int32)
            if upto == "pack1":
                return out1[0, 0, 0]
            out4 = out1.reshape(S, W2 // 16, 16, 4).reshape(S, W2, 4)
            row = out4[:, :, 0]
            for k in range(1, 4):
                row = row + jnp.pad(out4[:, : W2 - k, k], ((0, 0), (k, 0)))
            rphase = (seg_bit0 & 7)[:, None]
            prev = jnp.pad(row[:, :-1], ((0, 0), (1, 0)))
            row_sh = ((row << rphase) | (prev >> (8 - rphase))) & 0xFF
            QN = (cap + v3.W_SLACK) // W + 2
            oh = (qrow[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (S, QN), 1)
                  ).astype(jnp.bfloat16)
            slots = jnp.einsum("sj,sq->qj", row_sh.astype(jnp.bfloat16), oh,
                               preferred_element_type=jnp.float32).astype(jnp.int32)
            flat_lo = slots[:, :W].reshape(-1)
            flat_hi = slots[:, W:].reshape(-1)
            out = (jnp.pad(flat_lo, (0, W))
                   + jnp.pad(flat_hi, (W, 0)))[: cap + v3.W_SLACK]
            return out[0] + out[1000]

        return jax.lax.map(stage3, (data_b, lens_b, tok, tables))

    return probe


def probe_full(data_b, lens_b):
    _, metas = v3.encode_blocks_dyn(data_b, lens_b, depth=DEPTH, cap=cap)
    return metas[:, 0] ^ metas[:, 1]


def probe_full_vmap_emit(data_b, lens_b):
    """same but emit vmapped instead of lax.map."""
    def s1(data, n):
        return v3._tokens_and_hist(data, n, depth=DEPTH)
    tok, lf, df, xl, xd = jax.vmap(s1)(data_b, lens_b)
    tables = jax.vmap(v3._build_tables)(lf, df, xl, xd, lens_b)

    def stage3(data, n, tok_b, tables_b):
        out_u8, out_len = v3._emit(data, n, tok_b, tables_b, cap=cap,
                                   with_index=False)
        return out_len
    return jax.vmap(stage3)(data_b, lens_b, tok, tables)


def chained(probe, chain=5):
    f = jax.jit(probe)

    def run(k):
        sig = jnp.zeros(B, jnp.int32)
        for _ in range(k):
            b = dev ^ (sig[:, None] & 1).astype(jnp.uint8)
            sig = f(b, lens_dev).astype(jnp.int32).reshape(-1)[:B]
        return np.asarray(sig)

    run(1); run(2)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    t2 = time.perf_counter(); run(chain); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (chain - 1)


probes = [
    ("emit:lookups", make_emit_prefix("lookups")),
    ("emit:cumsum", make_emit_prefix("cumsum")),
    ("emit:pack1", make_emit_prefix("pack1")),
    ("emit:place", make_emit_prefix("place")),
    ("full v3", probe_full),
    ("full v3 (vmap emit)", probe_full_vmap_emit),
]
for name, p in probes:
    per = chained(p)
    print(f"{name:24s} {per*1000:8.1f} ms/batch  {B*BLOCK/per/1e6:8.1f} MB/s")
