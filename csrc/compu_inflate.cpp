// Native raw-DEFLATE decoder (RFC 1951) for the compu_tpu host runtime.
//
// Role: the reference delegates its decode hot loop to native libz
// (/root/reference/src/decoder/zlib.rs:97 -> inflate()); this is the
// equivalent native hot loop for this framework's host path — a from-
// scratch table-driven decoder, NOT a copy of zlib (different structure:
// flat 2^15 lookup tables per tree, 64-bit bit accumulator, token-boundary
// resumability). Framing (zlib/gzip headers + checksums) stays in Python;
// this handles raw deflate blocks only.
//
// Resumable contract (mirrors the streaming state machine the Python
// backends implement, reference src/decoder/mod.rs:150-157):
//   compu_inflate_run(state, in, in_len, out, out_cap, &consumed, &written)
//     -> 0 NEED_INPUT (consumed bytes up to the last complete token)
//        1 NEED_OUTPUT (out full; feed the SAME remaining input again)
//        2 DONE (final block's EOB reached; consumed includes byte align)
//       <0 error (COMPU_EBLOCK/.../COMPU_EDIST)
//
// Built into libcompu_runtime.so (see build line in compu_runtime.cpp).

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int WINDOW = 32768;
constexpr int MAXBITS = 15;

// status codes
constexpr int NEED_INPUT = 0;
constexpr int NEED_OUTPUT = 1;
constexpr int DONE = 2;
constexpr int EBLOCK = -1;   // bad block type
constexpr int ESTORED = -2;  // LEN/NLEN mismatch
constexpr int ECODES = -3;   // invalid code lengths / oversubscribed tree
constexpr int ESYM = -4;     // invalid symbol
constexpr int EDIST = -5;    // distance too far back

static const uint16_t LBASE[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
                                   23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115,
                                   131, 163, 195, 227, 258};
static const uint8_t LXB[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
                                3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
static const uint16_t DBASE[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
                                   97, 129, 193, 257, 385, 513, 769, 1025, 1537,
                                   2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577};
static const uint8_t DXB[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
                                7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
static const uint8_t CLORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4,
                                    12, 3, 13, 2, 14, 1, 15};

// Flat 15-bit decode LUT: entry = (bits << 12) | sym  (sym < 320, bits <= 15).
// 2^15 u16 entries per tree; built in one pass per dynamic block (cheap:
// the fill work is exactly 2^15 stores).
struct Table {
    uint16_t lut[1 << MAXBITS];
    int max_sym;
};

static uint32_t rev_bits(uint32_t v, int n) {
    uint32_t r = 0;
    for (int i = 0; i < n; i++) r = (r << 1) | ((v >> i) & 1);
    return r;
}

// Build the flat LUT from code lengths; returns false on an invalid
// (oversubscribed or, when `strict`, incomplete) code. A single-code
// distance tree is permitted (zlib compatibility).
static bool build_table(Table& t, const uint8_t* lens, int n, bool allow_incomplete) {
    int count[MAXBITS + 1] = {0};
    for (int i = 0; i < n; i++) count[lens[i]]++;
    count[0] = 0;
    int codes[MAXBITS + 1];
    int code = 0;
    long kraft = 0;
    for (int l = 1; l <= MAXBITS; l++) {
        code = (code + count[l - 1]) << 1;
        codes[l] = code;
        kraft += (long)count[l] << (MAXBITS - l);
    }
    if (kraft > (1L << MAXBITS)) return false;  // oversubscribed
    if (kraft < (1L << MAXBITS) && !allow_incomplete) {
        // incomplete: allowed only for the degenerate <=1-code case
        int used = 0;
        for (int l = 1; l <= MAXBITS; l++) used += count[l];
        if (used > 1) return false;
    }
    memset(t.lut, 0, sizeof(t.lut));
    for (int i = 0; i < n; i++) {
        int l = lens[i];
        if (!l) continue;
        uint32_t c = rev_bits((uint32_t)codes[l]++, l);
        uint16_t entry = (uint16_t)((l << 12) | i);
        for (uint32_t k = c; k < (1u << MAXBITS); k += (1u << l)) t.lut[k] = entry;
    }
    t.max_sym = n;
    return true;
}

struct InflateState {
    // phase: 0 = block header, 1 = stored, 2 = tokens, 3 = done
    int phase;
    int final_block;
    uint32_t stored_remaining;
    Table lit, dist;
    // sliding window of the last <=32K decoded bytes (ring)
    uint8_t window[WINDOW];
    uint32_t wpos;     // next write position in the ring
    uint32_t whave;    // valid bytes in the ring
    // bit-level resume: leftover bits from the last consumed byte span
    uint64_t bitbuf;
    int bitcnt;
};

struct Reader {
    const uint8_t* in;
    size_t len;
    size_t pos;        // next byte to load
    uint64_t buf;
    int cnt;

    bool fill(int need) {
        while (cnt < need) {
            if (pos >= len) return false;
            buf |= (uint64_t)in[pos++] << cnt;
            cnt += 8;
        }
        return true;
    }
    uint32_t peek(int n) const { return (uint32_t)(buf & ((1u << n) - 1)); }
    void drop(int n) { buf >>= n; cnt -= n; }
    bool read(int n, uint32_t* v) {
        if (!fill(n)) return false;
        *v = (uint32_t)(buf & ((1ull << n) - 1));
        drop(n);
        return true;
    }
    void align() { int r = cnt & 7; buf >>= r; cnt -= r; }
    // bytes consumed if we stop now, counting unconsumed whole bytes in buf
    size_t consumed() const { return pos - (size_t)(cnt >> 3); }
};

static void window_push(InflateState* s, const uint8_t* data, size_t n) {
    if (n >= WINDOW) {
        memcpy(s->window, data + n - WINDOW, WINDOW);
        s->wpos = 0;
        s->whave = WINDOW;
        return;
    }
    size_t first = WINDOW - s->wpos;
    if (first > n) first = n;
    memcpy(s->window + s->wpos, data, first);
    if (n > first) memcpy(s->window, data + first, n - first);
    s->wpos = (s->wpos + (uint32_t)n) % WINDOW;
    s->whave = s->whave + (uint32_t)n > WINDOW ? WINDOW : s->whave + (uint32_t)n;
}

}  // namespace

extern "C" {

void* compu_inflate_new() {
    InflateState* s = (InflateState*)calloc(1, sizeof(InflateState));
    return s;
}

void compu_inflate_free(void* p) { free(p); }

void compu_inflate_reset(void* p) {
    InflateState* s = (InflateState*)p;
    memset(s, 0, sizeof(InflateState));
}

int compu_inflate_run(void* p, const uint8_t* in, size_t in_len,
                      uint8_t* out, size_t out_cap,
                      size_t* in_consumed, size_t* out_written) {
    InflateState* s = (InflateState*)p;
    Reader r{in, in_len, 0, s->bitbuf, s->bitcnt};
    size_t op = 0;  // bytes written to out

    // checkpoints for token-boundary rollback
    uint64_t ck_buf = r.buf;
    int ck_cnt = r.cnt;
    size_t ck_pos = r.pos;
    size_t ck_op = 0;
    int status = NEED_INPUT;

#define SAVE_CK() (ck_buf = r.buf, ck_cnt = r.cnt, ck_pos = r.pos, ck_op = op)
#define ROLLBACK() (r.buf = ck_buf, r.cnt = ck_cnt, r.pos = ck_pos, op = ck_op)

    for (;;) {
        if (s->phase == 3) { status = DONE; break; }
        if (s->phase == 0) {
            SAVE_CK();
            uint32_t hdr;
            if (!r.read(3, &hdr)) { ROLLBACK(); status = NEED_INPUT; break; }
            s->final_block = hdr & 1;
            int btype = hdr >> 1;
            if (btype == 0) {
                r.align();
                uint32_t len, nlen;
                if (!r.read(16, &len) || !r.read(16, &nlen)) {
                    ROLLBACK(); status = NEED_INPUT; break;
                }
                if ((len ^ 0xFFFF) != nlen) { status = ESTORED; break; }
                s->stored_remaining = len;
                s->phase = 1;
            } else if (btype == 1) {
                uint8_t ll[288], dl[30];
                for (int i = 0; i < 144; i++) ll[i] = 8;
                for (int i = 144; i < 256; i++) ll[i] = 9;
                for (int i = 256; i < 280; i++) ll[i] = 7;
                for (int i = 280; i < 288; i++) ll[i] = 8;
                for (int i = 0; i < 30; i++) dl[i] = 5;
                build_table(s->lit, ll, 288, false);
                build_table(s->dist, dl, 30, true);  // 30-code fixed tree is incomplete by spec
                s->phase = 2;
            } else if (btype == 2) {
                uint32_t hlit, hdist, hclen;
                if (!r.read(5, &hlit) || !r.read(5, &hdist) || !r.read(4, &hclen)) {
                    ROLLBACK(); status = NEED_INPUT; break;
                }
                hlit += 257; hdist += 1; hclen += 4;
                uint8_t cl[19] = {0};
                bool starved = false;
                for (uint32_t i = 0; i < hclen; i++) {
                    uint32_t v;
                    if (!r.read(3, &v)) { starved = true; break; }
                    cl[CLORDER[i]] = (uint8_t)v;
                }
                if (starved) { ROLLBACK(); status = NEED_INPUT; break; }
                Table clt;
                if (!build_table(clt, cl, 19, false)) { status = ECODES; break; }
                uint8_t lens[288 + 32] = {0};
                uint32_t i = 0;
                int err = 0;
                while (i < hlit + hdist) {
                    if (!r.fill(MAXBITS)) {
                        // may still be decodable if the remaining bits hold
                        // a short code; try with what we have
                        if (r.cnt == 0) { starved = true; break; }
                    }
                    uint16_t e = clt.lut[r.peek(MAXBITS) & ((1 << MAXBITS) - 1)];
                    int bits = e >> 12, sym = e & 0xFFF;
                    if (bits == 0) {
                        if (r.cnt >= MAXBITS) { err = ECODES; break; }
                        starved = true; break;
                    }
                    if (bits > r.cnt) { starved = true; break; }
                    r.drop(bits);
                    if (sym < 16) {
                        lens[i++] = (uint8_t)sym;
                    } else if (sym == 16) {
                        uint32_t rep;
                        if (i == 0) { err = ECODES; break; }
                        if (!r.read(2, &rep)) { starved = true; break; }
                        rep += 3;
                        if (i + rep > hlit + hdist) { err = ECODES; break; }
                        for (uint32_t k = 0; k < rep; k++) { lens[i] = lens[i - 1]; i++; }
                    } else if (sym == 17) {
                        uint32_t rep;
                        if (!r.read(3, &rep)) { starved = true; break; }
                        rep += 3;
                        if (i + rep > hlit + hdist) { err = ECODES; break; }
                        i += rep;
                    } else {
                        uint32_t rep;
                        if (!r.read(7, &rep)) { starved = true; break; }
                        rep += 11;
                        if (i + rep > hlit + hdist) { err = ECODES; break; }
                        i += rep;
                    }
                }
                if (err) { status = err; break; }
                if (starved) { ROLLBACK(); status = NEED_INPUT; break; }
                if (lens[256] == 0) { status = ECODES; break; }
                if (!build_table(s->lit, lens, (int)hlit, false)) { status = ECODES; break; }
                if (!build_table(s->dist, lens + hlit, (int)hdist, true)) { status = ECODES; break; }
                s->phase = 2;
            } else {
                status = EBLOCK;
                break;
            }
            continue;
        }
        if (s->phase == 1) {
            // stored bytes: byte-aligned copy
            r.align();
            while (s->stored_remaining) {
                if (op >= out_cap) { status = NEED_OUTPUT; goto finish; }
                // drain bits first (whole bytes live in the bit buffer)
                if (r.cnt >= 8) {
                    out[op++] = (uint8_t)(r.buf & 0xFF);
                    r.drop(8);
                    s->stored_remaining--;
                    continue;
                }
                size_t avail = r.len - r.pos;
                if (!avail) { status = NEED_INPUT; goto finish; }
                size_t take = s->stored_remaining;
                if (take > avail) take = avail;
                if (take > out_cap - op) take = out_cap - op;
                memcpy(out + op, r.in + r.pos, take);
                r.pos += take;
                op += take;
                s->stored_remaining -= (uint32_t)take;
            }
            s->phase = s->final_block ? 3 : 0;
            continue;
        }
        // phase 2: tokens
        for (;;) {
            SAVE_CK();
            if (!r.fill(MAXBITS)) {
                if (r.cnt == 0) { status = NEED_INPUT; goto finish; }
            }
            uint16_t e = s->lit.lut[r.peek(MAXBITS) & ((1 << MAXBITS) - 1)];
            int bits = e >> 12, sym = e & 0xFFF;
            if (bits == 0) {
                status = (r.pos >= r.len && r.cnt < MAXBITS) ? NEED_INPUT : ESYM;
                if (status == NEED_INPUT) ROLLBACK();
                goto finish;
            }
            if (bits > r.cnt) { ROLLBACK(); status = NEED_INPUT; goto finish; }
            r.drop(bits);
            if (sym < 256) {
                if (op >= out_cap) { ROLLBACK(); status = NEED_OUTPUT; goto finish; }
                out[op++] = (uint8_t)sym;
                continue;
            }
            if (sym == 256) {
                if (s->final_block) {
                    r.align();
                    s->phase = 3;
                    status = DONE;
                    goto finish;
                }
                s->phase = 0;
                break;  // next block header
            }
            int code = sym - 257;
            if (code >= 29) { status = ESYM; goto finish; }
            uint32_t extra;
            if (!r.read(LXB[code], &extra)) { ROLLBACK(); status = NEED_INPUT; goto finish; }
            uint32_t length = LBASE[code] + extra;
            if (!r.fill(MAXBITS)) {
                if (r.cnt == 0) { ROLLBACK(); status = NEED_INPUT; goto finish; }
            }
            uint16_t de = s->dist.lut[r.peek(MAXBITS) & ((1 << MAXBITS) - 1)];
            int dbits = de >> 12, dsym = de & 0xFFF;
            if (dbits == 0 || dbits > r.cnt) {
                if (r.pos >= r.len) { ROLLBACK(); status = NEED_INPUT; goto finish; }
                status = ESYM; goto finish;
            }
            if (dsym >= 30) { status = ESYM; goto finish; }
            r.drop(dbits);
            uint32_t dextra;
            if (!r.read(DXB[dsym], &dextra)) { ROLLBACK(); status = NEED_INPUT; goto finish; }
            uint32_t dist = DBASE[dsym] + dextra;
            if (op + length > out_cap) { ROLLBACK(); status = NEED_OUTPUT; goto finish; }
            if (dist <= op) {
                // copy within out (overlap-safe byte loop for short dists,
                // memcpy runs for non-overlapping)
                uint8_t* dst = out + op;
                const uint8_t* src = dst - dist;
                if (dist >= length) {
                    memcpy(dst, src, length);
                } else {
                    for (uint32_t k = 0; k < length; k++) dst[k] = src[k];
                }
                op += length;
            } else {
                // reaches into the saved window
                uint32_t from_window = dist - (uint32_t)op;
                if (from_window > s->whave) { status = EDIST; goto finish; }
                uint32_t remaining = length;
                uint32_t rpos = (s->wpos + WINDOW - from_window) % WINDOW;
                while (remaining && from_window) {
                    out[op++] = s->window[rpos];
                    rpos = (rpos + 1) % WINDOW;
                    remaining--;
                    from_window--;
                }
                // rest comes from out itself
                uint8_t* dst = out + op;
                const uint8_t* src = dst - dist;
                for (uint32_t k = 0; k < remaining; k++) dst[k] = src[k];
                op += remaining;
            }
        }
    }

finish:
    // persist bit-level + window state. Whole bytes still in the bit
    // accumulator are reported UNCONSUMED (the caller re-feeds them), so
    // only the sub-byte remainder may persist — keeping more would
    // double-read those bytes on the next call.
    window_push(s, out, op);
    s->bitcnt = r.cnt & 7;
    s->bitbuf = r.buf & ((1ull << s->bitcnt) - 1);
    *in_consumed = r.consumed();
    *out_written = op;
    return status;
}

}  // extern "C"
