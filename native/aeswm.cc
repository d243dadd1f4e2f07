// Native host core: AES-128 CTR keystreams and keyed table derivation.
//
// The watermark layout derives from an AES-128-CTR keystream (the reference
// uses libgcrypt; semantics documented in audiowmark_tpu/crypto/prng.py).
// This module provides the hot host-side primitives as plain C ABI:
//   * batched AES-128 ECB encryption
//   * batched CTR keystreams expressed as big-endian uint64 words
//   * batched Fisher-Yates shuffle-table derivation (seed per row)
//
// Built as libaeswm.so via native/Makefile and loaded through ctypes
// (audiowmark_tpu/crypto/native.py); the vectorized numpy implementation
// remains as a fallback and as the test oracle.

#include <cstdint>
#include <cstring>

namespace {

const uint8_t SBOX[256] = {
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b,
    0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0,
    0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7, 0xfd, 0x93, 0x26,
    0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2,
    0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0,
    0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed,
    0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f,
    0x50, 0x3c, 0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5,
    0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14,
    0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c,
    0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79, 0xe7, 0xc8, 0x37, 0x6d,
    0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f,
    0x4b, 0xbd, 0x8b, 0x8a, 0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e,
    0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11,
    0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f,
    0xb0, 0x54, 0xbb, 0x16,
};

inline uint8_t xtime(uint8_t x) {
  return static_cast<uint8_t>((x << 1) ^ ((x & 0x80) ? 0x1b : 0));
}

struct RoundKeys {
  uint8_t rk[11][16];
};

void expand_key(const uint8_t *key, RoundKeys *out) {
  uint8_t w[44][4];
  std::memcpy(w, key, 16);
  static const uint8_t RCON[10] = {0x01, 0x02, 0x04, 0x08, 0x10,
                                   0x20, 0x40, 0x80, 0x1b, 0x36};
  for (int i = 4; i < 44; i++) {
    uint8_t t[4];
    std::memcpy(t, w[i - 1], 4);
    if (i % 4 == 0) {
      uint8_t tmp = t[0];
      t[0] = static_cast<uint8_t>(SBOX[t[1]] ^ RCON[i / 4 - 1]);
      t[1] = SBOX[t[2]];
      t[2] = SBOX[t[3]];
      t[3] = SBOX[tmp];
    }
    for (int j = 0; j < 4; j++)
      w[i][j] = w[i - 4][j] ^ t[j];
  }
  for (int r = 0; r < 11; r++)
    std::memcpy(out->rk[r], w[r * 4], 16);
}

void encrypt_block(const RoundKeys &keys, const uint8_t *in, uint8_t *out) {
  uint8_t s[16];
  for (int i = 0; i < 16; i++)
    s[i] = in[i] ^ keys.rk[0][i];
  for (int round = 1; round < 10; round++) {
    uint8_t t[16];
    // SubBytes + ShiftRows
    static const int SHIFT[16] = {0, 5, 10, 15, 4,  9, 14, 3,
                                  8, 13, 2,  7, 12, 1, 6,  11};
    for (int i = 0; i < 16; i++)
      t[i] = SBOX[s[SHIFT[i]]];
    // MixColumns + AddRoundKey
    for (int c = 0; c < 4; c++) {
      uint8_t a0 = t[4 * c], a1 = t[4 * c + 1], a2 = t[4 * c + 2],
              a3 = t[4 * c + 3];
      s[4 * c + 0] = static_cast<uint8_t>(xtime(a0) ^ (xtime(a1) ^ a1) ^ a2 ^ a3) ^ keys.rk[round][4 * c + 0];
      s[4 * c + 1] = static_cast<uint8_t>(a0 ^ xtime(a1) ^ (xtime(a2) ^ a2) ^ a3) ^ keys.rk[round][4 * c + 1];
      s[4 * c + 2] = static_cast<uint8_t>(a0 ^ a1 ^ xtime(a2) ^ (xtime(a3) ^ a3)) ^ keys.rk[round][4 * c + 2];
      s[4 * c + 3] = static_cast<uint8_t>((xtime(a0) ^ a0) ^ a1 ^ a2 ^ xtime(a3)) ^ keys.rk[round][4 * c + 3];
    }
  }
  static const int SHIFT[16] = {0, 5, 10, 15, 4,  9, 14, 3,
                                8, 13, 2,  7, 12, 1, 6,  11};
  for (int i = 0; i < 16; i++)
    out[i] = SBOX[s[SHIFT[i]]] ^ keys.rk[10][i];
}

inline uint64_t be64_load(const uint8_t *p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; i++)
    v = (v << 8) | p[i];
  return v;
}

inline void be128_add(const uint8_t *iv, uint64_t k, uint8_t *out) {
  // 128-bit big-endian add with wraparound
  uint64_t hi = be64_load(iv);
  uint64_t lo = be64_load(iv + 8);
  uint64_t nlo = lo + k;
  uint64_t nhi = hi + (nlo < lo ? 1 : 0);
  for (int i = 7; i >= 0; i--) {
    out[i] = static_cast<uint8_t>(nhi);
    out[8 + i] = static_cast<uint8_t>(nlo);
    nhi >>= 8;
    nlo >>= 8;
  }
}

}  // namespace

extern "C" {

// Encrypt n 16-byte blocks in ECB mode.
void aeswm_ecb_encrypt(const uint8_t *key, const uint8_t *in, uint8_t *out,
                       uint64_t n_blocks) {
  RoundKeys keys;
  expand_key(key, &keys);
  for (uint64_t i = 0; i < n_blocks; i++)
    encrypt_block(keys, in + 16 * i, out + 16 * i);
}

// For each of n_ivs IVs, produce the first n_u64 big-endian uint64 keystream
// words of AES-128-CTR under `key`.  out is (n_ivs * n_u64) uint64s.
void aeswm_ctr_keystreams_u64(const uint8_t *key, const uint8_t *ivs,
                              uint64_t n_ivs, uint64_t n_u64, uint64_t *out) {
  RoundKeys keys;
  expand_key(key, &keys);
  uint64_t n_blocks = (n_u64 + 1) / 2;
  for (uint64_t i = 0; i < n_ivs; i++) {
    const uint8_t *iv = ivs + 16 * i;
    uint64_t produced = 0;
    for (uint64_t b = 0; b < n_blocks; b++) {
      uint8_t ctr[16], ks[16];
      be128_add(iv, b, ctr);
      encrypt_block(keys, ctr, ks);
      for (int w = 0; w < 2 && produced < n_u64; w++, produced++)
        out[i * n_u64 + produced] = be64_load(ks + 8 * w);
    }
  }
}

// For each seed row, derive the seeded IV (AES-ECB of BE64(seed)|stream|0..)
// and Fisher-Yates shuffle arange(n) with modulo draws, exactly like the
// reference PRNG protocol.  out is (n_seeds * n) int32.
void aeswm_shuffle_tables(const uint8_t *key, const uint64_t *seeds,
                          uint64_t n_seeds, uint8_t stream, uint32_t n,
                          int32_t *out) {
  RoundKeys keys;
  expand_key(key, &keys);
  for (uint64_t s = 0; s < n_seeds; s++) {
    uint8_t plain[16] = {0};
    uint64_t seed = seeds[s];
    for (int i = 0; i < 8; i++)
      plain[i] = static_cast<uint8_t>(seed >> (56 - 8 * i));
    plain[8] = stream;
    uint8_t iv[16];
    encrypt_block(keys, plain, iv);

    int32_t *row = out + s * n;
    for (uint32_t i = 0; i < n; i++)
      row[i] = static_cast<int32_t>(i);

    uint64_t block = 0;
    uint8_t ks[16];
    int words_left = 0;
    uint64_t w0 = 0, w1 = 0;
    for (uint32_t i = 0; i < n; i++) {
      uint64_t rn;
      if (words_left == 0) {
        uint8_t ctr[16];
        be128_add(iv, block++, ctr);
        encrypt_block(keys, ctr, ks);
        w0 = be64_load(ks);
        w1 = be64_load(ks + 8);
        rn = w0;
        words_left = 1;
      } else {
        rn = w1;
        words_left = 0;
      }
      uint32_t j = i + static_cast<uint32_t>(rn % (n - i));
      int32_t tmp = row[i];
      row[i] = row[j];
      row[j] = tmp;
    }
  }
}

}  // extern "C"
