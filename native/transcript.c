/* Native transcript core: Keccak-f[1600] + STROBE-128 absorb/squeeze.
 *
 * Host-side Fiat-Shamir is on the prover's critical path for many-proof
 * serving workloads (one transcript per proof, ~60 ops of ~200-byte
 * permutations each); this C implementation replaces the pure-Python
 * permutation (arkplonk_tpu/transcript/keccak.py) when built, loaded via
 * ctypes (arkplonk_tpu/transcript/native.py).  Mirrors the role of the
 * compiled `merlin` crate in the reference (plonk-core/src/transcript.rs).
 *
 * Build: cc -O3 -shared -fPIC -o libarkplonk_transcript.so transcript.c
 */

#include <stdint.h>
#include <string.h>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static const int RHO[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

static inline uint64_t rotl(uint64_t x, int n) {
    n &= 63;
    return n ? (x << n) | (x >> (64 - n)) : x;
}

/* state: 25 lanes, lane a[x + 5y] */
void keccak_f1600(uint64_t *a) {
    uint64_t b[25], c[5], d[5];
    for (int round = 0; round < 24; round++) {
        for (int x = 0; x < 5; x++)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
        for (int i = 0; i < 25; i++)
            a[i] ^= d[i % 5];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y],
                                                        RHO[x][y]);
        for (int i = 0; i < 25; i++) {
            int y5 = 5 * (i / 5);
            a[i] = b[i] ^ ((~b[(i + 1) % 5 + y5]) & b[(i + 2) % 5 + y5]);
        }
        a[0] ^= RC[round];
    }
}

/* byte-view wrapper (state as 200 LE bytes) */
void keccak_f1600_bytes(uint8_t *state) {
    /* state is little-endian lanes; on LE hosts this is a direct view */
    keccak_f1600((uint64_t *)state);
}

#define STROBE_R 166

typedef struct {
    uint8_t state[200];
    uint8_t pos;
    uint8_t pos_begin;
    uint8_t cur_flags;
} strobe128;

static void run_f(strobe128 *s) {
    s->state[s->pos] ^= s->pos_begin;
    s->state[s->pos + 1] ^= 0x04;
    s->state[STROBE_R + 1] ^= 0x80;
    keccak_f1600_bytes(s->state);
    s->pos = 0;
    s->pos_begin = 0;
}

void strobe_absorb(strobe128 *s, const uint8_t *data, uint64_t len) {
    for (uint64_t i = 0; i < len; i++) {
        s->state[s->pos] ^= data[i];
        if (++s->pos == STROBE_R) run_f(s);
    }
}

void strobe_squeeze(strobe128 *s, uint8_t *out, uint64_t len) {
    for (uint64_t i = 0; i < len; i++) {
        out[i] = s->state[s->pos];
        s->state[s->pos] = 0;
        if (++s->pos == STROBE_R) run_f(s);
    }
}

void strobe_begin_op(strobe128 *s, uint8_t flags, int more) {
    if (more) return; /* caller asserts flag continuity */
    uint8_t old_begin = s->pos_begin;
    s->pos_begin = s->pos + 1;
    s->cur_flags = flags;
    uint8_t hdr[2] = {old_begin, flags};
    strobe_absorb(s, hdr, 2);
    if ((flags & 0x24) && s->pos != 0) run_f(s); /* C|K force F */
}

void strobe_init(strobe128 *s, const uint8_t *label, uint64_t label_len) {
    memset(s, 0, sizeof(*s));
    static const uint8_t hdr[6] = {1, STROBE_R + 2, 1, 0, 1, 96};
    memcpy(s->state, hdr, 6);
    memcpy(s->state + 6, "STROBEv1.0.2", 12);
    keccak_f1600_bytes(s->state);
    s->pos = 0;
    s->pos_begin = 0;
    s->cur_flags = 0;
    /* meta_ad(label, false) */
    strobe_begin_op(s, 0x02 | 0x10, 0); /* A|M */
    strobe_absorb(s, label, label_len);
}
