// csyx — native bulk DX7 SysEx voice codec.
//
// The data-loader tier of dxvae_tpu: decodes/encodes whole concatenated banks
// of 128-byte DX7 voices in one call, replicating dxvae_tpu/data/sysex.py
// (which itself mirrors the reference's bit layout, dxdata.py:8-74,175-300)
// bit-for-bit on the integer side and to float32 rounding on the normalized
// features.  Built as a plain shared library (scripts/build_native.sh) and
// loaded via ctypes — no Python build machinery required.
//
// Layout contracts (must match sysex.py):
//   params: (n, 7, 21) int32   — node 0 = global, nodes 1..6 = operators
//   X:      (n, 7, 27) float32 — normalized features
//   raw:    (n, 128)   uint8   — packed voice bytes

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

static inline int32_t clampi(int32_t v, int32_t lo, int32_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Decode n voices of raw 128-byte data into params (n*7*21 int32) and
// X (n*7*27 float32).  Returns 0 on success.
int csyx_unpack(const uint8_t* raw, int64_t n, int32_t* params, float* X) {
    const float log32 = logf(32.0f);
    const float log100 = logf(100.0f);
    for (int64_t v = 0; v < n; ++v) {
        const uint8_t* b = raw + v * 128;
        int32_t* P = params + v * 7 * 21;
        float* F = X + v * 7 * 27;

        // ---- operators k = 1..6 at byte offset (6-k)*17 (dxdata.py:175-244)
        for (int k = 1; k <= 6; ++k) {
            const uint8_t* o = b + (6 - k) * 17;
            int32_t* p = P + k * 21;
            float* x = F + k * 27;

            int32_t env[8];
            for (int i = 0; i < 8; ++i) env[i] = clampi(o[i], 0, 99);
            int32_t bp = clampi(o[8], 0, 99);
            int32_t ld = clampi(o[9], 0, 99);
            int32_t rd = clampi(o[10], 0, 99);
            int32_t rc = (o[11] >> 2) % 4;
            int32_t lc = o[11] % 4;
            int32_t det = clampi(o[12] >> 3, 0, 14);
            int32_t rs = o[12] % 8;
            int32_t kvs = (o[13] >> 2) % 8;
            int32_t ams = o[13] % 4;
            int32_t lev = clampi(o[14], 0, 99);
            int32_t fc_raw = (o[15] >> 1) % 32;
            int32_t mode = o[15] % 2;
            int32_t ff = clampi(o[16], 0, 99);

            int32_t fc = mode == 0 ? fc_raw : fc_raw % 4;
            float fc_x = mode == 0 ? logf((float)fc_raw + 1.0f) / log32
                                   : (float)(fc_raw % 4) / 3.0f;
            float ff_x = mode == 0 ? logf((float)ff + 1.0f) / log100
                                   : (float)ff / 99.0f;

            p[0] = lev;
            for (int i = 0; i < 8; ++i) p[1 + i] = env[i];
            p[9] = fc;  p[10] = ff;  p[11] = det; p[12] = bp;  p[13] = ld;
            p[14] = rd; p[15] = ams; p[16] = kvs; p[17] = rs;  p[18] = mode;
            p[19] = lc; p[20] = rc;

            x[0] = (float)lev / 99.0f;
            for (int i = 0; i < 8; ++i) x[1 + i] = (float)env[i] / 99.0f;
            x[9] = fc_x;
            x[10] = ff_x;
            x[11] = (float)det / 14.0f;
            x[12] = (float)bp / 99.0f;
            x[13] = (float)ld / 99.0f;
            x[14] = (float)rd / 99.0f;
            x[15] = (float)ams / 3.0f;
            x[16] = (float)kvs / 7.0f;
            x[17] = (float)rs / 7.0f;
            x[18] = (float)mode;
            for (int i = 0; i < 4; ++i) x[19 + i] = i == lc ? 1.0f : 0.0f;
            for (int i = 0; i < 4; ++i) x[23 + i] = i == rc ? 1.0f : 0.0f;
        }

        // ---- global node 0, bytes 102..117 (dxdata.py:246-300)
        {
            int32_t* p = P;
            float* x = F;
            int32_t penv[8];
            for (int i = 0; i < 8; ++i) penv[i] = clampi(b[102 + i], 0, 99);
            int32_t alg = b[110] % 32;
            int32_t oks = (b[111] >> 3) % 2;
            int32_t fb = b[111] % 8;
            int32_t lfs = clampi(b[112], 0, 99);
            int32_t lfd = clampi(b[113], 0, 99);
            int32_t lpmd = clampi(b[114], 0, 99);
            int32_t lamd = clampi(b[115], 0, 99);
            int32_t lpms = b[116] >> 4;
            int32_t lfw = clampi((b[116] >> 1) % 8, 0, 5);
            int32_t lks = b[116] % 2;
            int32_t tsp = clampi(b[117], 0, 48);

            for (int i = 0; i < 8; ++i) p[i] = penv[i];
            p[8] = tsp;  p[9] = lfs;  p[10] = lfd;  p[11] = lpmd; p[12] = lamd;
            p[13] = fb;  p[14] = lpms; p[15] = oks; p[16] = lks;  p[17] = lfw;
            p[18] = alg; p[19] = 0;   p[20] = 0;

            for (int i = 0; i < 8; ++i) x[i] = (float)penv[i] / 99.0f;
            x[8] = (float)tsp / 48.0f;
            x[9] = (float)lfs / 99.0f;
            x[10] = (float)lfd / 99.0f;
            x[11] = (float)lpmd / 99.0f;
            x[12] = (float)lamd / 99.0f;
            x[13] = (float)fb / 7.0f;
            x[14] = (float)lpms / 7.0f;
            x[15] = (float)oks;
            x[16] = (float)lks;
            for (int i = 0; i < 6; ++i) x[17 + i] = i == lfw ? 1.0f : 0.0f;
            x[23] = x[24] = x[25] = x[26] = 0.0f;
        }
    }
    return 0;
}

// Pack n voices of params (n*7*21 int32) into raw bytes (n*128 uint8) with
// the given 10-byte voice name (dxdata.py:341-391 composition).
// Returns 0 on success, -1 if any packed byte falls outside 7-bit range.
int csyx_pack(const int32_t* params, int64_t n, const uint8_t* name10, uint8_t* raw) {
    for (int64_t v = 0; v < n; ++v) {
        const int32_t* P = params + v * 7 * 21;
        uint8_t* b = raw + v * 128;
        int32_t tmp[128];

        for (int k = 1; k <= 6; ++k) {
            const int32_t* p = P + k * 21;
            int32_t* o = tmp + (6 - k) * 17;
            for (int i = 0; i < 8; ++i) o[i] = p[1 + i];      // env
            o[8] = p[12];                                      // bp
            o[9] = p[13];                                      // ld
            o[10] = p[14];                                     // rd
            o[11] = p[20] * 4 + p[19];                         // rc<<2 | lc
            o[12] = p[11] * 8 + p[17];                         // det<<3 | rs
            o[13] = p[16] * 4 + p[15];                         // kvs<<2 | ams
            o[14] = p[0];                                      // lev
            o[15] = p[9] * 2 + p[18];                          // fc<<1 | mode
            o[16] = p[10];                                     // ff
        }
        {
            const int32_t* p = P;
            int32_t* g = tmp + 102;
            for (int i = 0; i < 8; ++i) g[i] = p[i];           // pitch env
            g[8] = p[18];                                      // alg
            g[9] = p[15] * 8 + p[13];                          // oks<<3 | fb
            g[10] = p[9];
            g[11] = p[10];
            g[12] = p[11];
            g[13] = p[12];
            g[14] = p[14] * 16 + p[17] * 2 + p[16];            // lpms<<4|lfw<<1|lks
            g[15] = p[8];                                      // tsp
        }
        for (int i = 0; i < 10; ++i) tmp[118 + i] = name10[i];

        for (int i = 0; i < 128; ++i) {
            if (tmp[i] < 0 || tmp[i] > 127) return -1;
            b[i] = (uint8_t)tmp[i];
        }
    }
    return 0;
}

// Real DX7 bulk-dump checksum over a payload.
int csyx_checksum(const uint8_t* payload, int64_t len) {
    int64_t s = 0;
    for (int64_t i = 0; i < len; ++i) s += payload[i];
    return (int)((128 - (s & 0x7F)) & 0x7F);
}

}  // extern "C"
