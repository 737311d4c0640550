// Native exact oracle: correctly rounded sums and dot products of doubles
// through a full-range fixed-point accumulator.
//
// This is the framework's independent, native counterpart of the
// reference's MPFR-2098-bit test oracle (reference tests/test.exsum.cpu.cpp:
// 24-38, 4196 bits for dot at test.exdot.gpu.cpp:24-43): a third
// implementation of the exact-accumulate-then-round semantics, sharing no
// code with either the JAX paths or the Python Fraction oracle, used to
// cross-check them and to run large fuzz campaigns at native speed
// (Python rationals are ~10-100x slower).
//
// Accumulator: 216 base-2^20 limbs in int64 (the dot format: bit 0 at
// 2^-2148 covers the full product underflow range; plain doubles land at
// offset 2148 - 1074 limb-bits higher).  Deposits are exact; rounding is
// round-to-nearest-even computed directly from the canonicalized digits.

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

constexpr int kLimbBits = 20;
constexpr int64_t kLimbMask = (1 << kLimbBits) - 1;
constexpr int kL = 216;          // == exblas_tpu.core.types.L_DOT
constexpr int kOffset = 2148;    // bit 0 of the accumulator == 2^-2148

struct Oracle {
  int64_t limbs[kL];
  int64_t nan_c, pinf_c, ninf_c;
};

struct Decoded {
  uint64_t mant;  // 53-bit significand (0 for zero/special)
  int e_lsb;      // exponent of the significand lsb
  int sign;       // 0/1
  bool zero, inf, nan;
};

Decoded decode(double x) {
  uint64_t u;
  std::memcpy(&u, &x, sizeof(u));
  Decoded d{};
  d.sign = static_cast<int>(u >> 63);
  const int expf = static_cast<int>((u >> 52) & 0x7FF);
  uint64_t mant = u & 0xFFFFFFFFFFFFFULL;
  if (expf == 0x7FF) {
    d.nan = mant != 0;
    d.inf = mant == 0;
    return d;
  }
  if (expf == 0 && mant == 0) {
    d.zero = true;
    return d;
  }
  if (expf != 0) mant |= 1ULL << 52;
  d.mant = mant;
  d.e_lsb = (expf == 0 ? 1 : expf) - 1075;
  return d;
}

// Deposit value * 2^(p) where value < 2^128, at accumulator bit position p
// (p >= 0), with sign s in {+1, -1}.
void deposit128(Oracle& acc, unsigned __int128 value, int p, int s) {
  int q = p / kLimbBits;
  const int r = p - q * kLimbBits;
  unsigned __int128 v = value << r;  // < 2^148
  while (v != 0 && q < kL) {
    acc.limbs[q] += s * static_cast<int64_t>(
        static_cast<uint64_t>(v) & kLimbMask);
    v >>= kLimbBits;
    ++q;
  }
}

void add_double(Oracle& acc, double x) {
  const Decoded d = decode(x);
  if (d.nan) { acc.nan_c++; return; }
  if (d.inf) { (d.sign ? acc.ninf_c : acc.pinf_c)++; return; }
  if (d.zero) return;
  deposit128(acc, d.mant, d.e_lsb + kOffset, d.sign ? -1 : 1);
}

void add_product(Oracle& acc, double a, double b) {
  const Decoded da = decode(a);
  const Decoded db = decode(b);
  if (da.nan || db.nan || (da.inf && db.zero) || (db.inf && da.zero)) {
    acc.nan_c++;
    return;
  }
  const int sign = da.sign ^ db.sign;
  if (da.inf || db.inf) {
    (sign ? acc.ninf_c : acc.pinf_c)++;
    return;
  }
  if (da.zero || db.zero) return;
  const unsigned __int128 prod =
      static_cast<unsigned __int128>(da.mant) * db.mant;  // exact, 106 bits
  deposit128(acc, prod, da.e_lsb + db.e_lsb + kOffset, sign ? -1 : 1);
}

// Round the exact accumulator value to binary64, round-to-nearest-even.
double round_acc(const Oracle& acc) {
  if (acc.nan_c > 0 || (acc.pinf_c > 0 && acc.ninf_c > 0)) return NAN;
  if (acc.pinf_c > 0) return INFINITY;
  if (acc.ninf_c > 0) return -INFINITY;

  // Canonicalize to base-2^20 digits; final carry is the sign.
  int64_t dig[kL];
  int64_t carry = 0;
  for (int j = 0; j < kL; ++j) {
    const int64_t v = acc.limbs[j] + carry;
    dig[j] = v & kLimbMask;
    carry = (v - dig[j]) >> kLimbBits;
  }
  const bool negative = carry < 0;
  if (negative) {  // two's complement -> magnitude
    int64_t borrow = 1;
    for (int j = 0; j < kL; ++j) {
      const int64_t t = (dig[j] ^ kLimbMask) + borrow;
      dig[j] = t & kLimbMask;
      borrow = t >> kLimbBits;
    }
  }

  int top = kL - 1;
  while (top >= 0 && dig[top] == 0) --top;
  if (top < 0) return 0.0;

  const int msb_in = 63 - __builtin_clzll(
      static_cast<uint64_t>(dig[top]));
  const int p_msb = top * kLimbBits + msb_in;  // accumulator bit position

  // Gather the 55-bit leading window [p_msb-54, p_msb] (bit 54 = msb) and
  // the sticky over everything strictly below.
  const int pos_low = p_msb - 54;
  int jw = pos_low / kLimbBits;  // limb containing pos_low (floor)
  if (pos_low < 0) jw = 0;
  unsigned __int128 w = 0;  // bit 0 of w = accumulator bit jw*20; <= 100 bits
  for (int j = top; j >= jw; --j) {
    w = (w << kLimbBits) | static_cast<uint64_t>(dig[j]);
  }
  const int shift = pos_low - jw * kLimbBits;
  uint64_t m55;
  bool sticky = false;
  if (shift >= 0) {
    m55 = static_cast<uint64_t>(w >> shift);
    sticky = (w & (((unsigned __int128)1 << shift) - 1)) != 0;
    for (int j = 0; j < jw; ++j) sticky |= dig[j] != 0;
  } else {
    // value has fewer than 55 bits above accumulator bit 0: zero-pad below
    m55 = static_cast<uint64_t>(w) << -shift;
  }

  // Round-to-nearest-even of m55 (bit 54 = msb) at exponent e_msb.
  const int e_msb = p_msb - kOffset;
  uint64_t m53 = m55 >> 2;
  uint64_t guard = (m55 >> 1) & 1;
  bool st = sticky || (m55 & 1);
  int e = e_msb;
  // Subnormal: shift further right.
  if (e < -1022) {
    int d = -1022 - e;
    if (d >= 60) { m53 = 0; guard = 0; st = true; }
    else {
      const uint64_t full = m55;
      const int sh = 2 + d;
      st = st || (full & ((1ULL << (sh - 1)) - 1)) != 0;
      guard = (full >> (sh - 1)) & 1;
      m53 = full >> sh;
    }
    e = -1022;
  }
  if (guard && (st || (m53 & 1))) m53 += 1;
  if (m53 == (1ULL << 53)) { m53 >>= 1; e += 1; }

  uint64_t bits;
  if (m53 == 0) {
    bits = 0;
  } else if (m53 < (1ULL << 52)) {  // subnormal
    bits = m53;
  } else {
    const int expf = e + 1023;
    if (expf >= 2047) {
      bits = 0x7FF0000000000000ULL;  // overflow -> inf
    } else {
      bits = (static_cast<uint64_t>(expf) << 52) | (m53 & 0xFFFFFFFFFFFFFULL);
    }
  }
  if (negative) bits |= 1ULL << 63;
  double out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

}  // namespace

extern "C" {

double oracle_sum(const double* x, int64_t n) {
  Oracle acc;
  std::memset(&acc, 0, sizeof(acc));
  for (int64_t i = 0; i < n; ++i) add_double(acc, x[i]);
  return round_acc(acc);
}

double oracle_dot(const double* a, const double* b, int64_t n) {
  Oracle acc;
  std::memset(&acc, 0, sizeof(acc));
  for (int64_t i = 0; i < n; ++i) add_product(acc, a[i], b[i]);
  return round_acc(acc);
}

}  // extern "C"
