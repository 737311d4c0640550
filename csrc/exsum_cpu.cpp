// Native CPU ExSUM backend: FPE fast path + base-2^20 integer
// superaccumulator, OpenMP-parallel with exact limb merging.
//
// Parity component for the reference's CPU backend (its CPU tree builds
// blas1/ExSUM only -- reference src/cpu/blas/CMakeLists.txt:61).  This is a
// from-scratch implementation sharing the *limb format* of the TPU kernels
// (112 base-2^20 limbs, bit 0 = 2^-1074) so host and device accumulators
// interoperate and one rounding implementation serves both.
//
// Algorithm: a per-thread floating-point expansion of size FPE (error-free
// TwoSum chain, as in the reference's two-level scheme) absorbs the common
// case; residuals that fall off the expansion and the final expansion
// content are deposited exactly into the integer limbs by bit slicing.
// Thread partials merge by plain limb addition (associative), so the result
// is bit-identical for any thread count or schedule.

#include <cstdint>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kLimbBits = 20;
constexpr int64_t kLimbMask = (1 << kLimbBits) - 1;
constexpr int kNumLimbs = 112;   // == exblas_tpu.core.types.L_SUM
constexpr int kFpeSize = 8;

struct Acc {
  int64_t limbs[kNumLimbs];
  int64_t nan_count;
  int64_t pinf_count;
  int64_t ninf_count;
};

inline void deposit(Acc& acc, double x) {
  uint64_t u;
  std::memcpy(&u, &x, sizeof(u));
  const uint32_t hi = static_cast<uint32_t>(u >> 32);
  const int sign = hi >> 31;
  const int expf = (hi >> 20) & 0x7FF;
  uint64_t mant = u & 0xFFFFFFFFFFFFFULL;  // 52 fraction bits
  if (expf == 0x7FF) {
    if (mant != 0) {
      acc.nan_count++;
    } else if (sign) {
      acc.ninf_count++;
    } else {
      acc.pinf_count++;
    }
    return;
  }
  if (expf == 0 && mant == 0) return;  // +-0
  if (expf != 0) mant |= 1ULL << 52;
  // significand LSB exponent E = max(expf,1)-1075; bit position p = E + 1074
  const int p = (expf == 0 ? 1 : expf) - 1;
  const int q = p / kLimbBits;
  const int r = p - q * kLimbBits;
  const uint64_t shifted = mant << r;  // <= 72 bits: use two 64-bit words
  const uint64_t lo_part = shifted;    // low 64 bits
  const uint64_t hi_part = r ? (mant >> (64 - r)) : 0;  // bits 64..71
  const int64_t s = sign ? -1 : 1;
  acc.limbs[q] += s * static_cast<int64_t>(lo_part & kLimbMask);
  acc.limbs[q + 1] += s * static_cast<int64_t>((lo_part >> 20) & kLimbMask);
  acc.limbs[q + 2] += s * static_cast<int64_t>((lo_part >> 40) & kLimbMask);
  acc.limbs[q + 3] += s * static_cast<int64_t>(
      ((lo_part >> 60) | (hi_part << 4)) & kLimbMask);
}

// Knuth TwoSum (branch-free, no magnitude precondition): s = fl(a+b),
// err = a + b - s exactly.
inline double two_sum(double a, double b, double& err) {
  const double s = a + b;
  const double bv = s - a;
  const double av = s - bv;
  err = (a - av) + (b - bv);
  return s;
}

void accumulate_range(const double* x, int64_t n, Acc& acc) {
  double fpe[kFpeSize] = {0.0};
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    if (!std::isfinite(v)) {
      deposit(acc, v);
      continue;
    }
    for (int j = 0; j < kFpeSize; ++j) {
      // fl(fpe[j]+v) can overflow to inf for huge same-sign operands, which
      // would poison the TwoSum error term with NaN.  The limb deposit is
      // exact for ANY finite double, so bypass the expansion in that case
      // (the reference instead slides the FPE to the superaccumulator).
      if (!std::isfinite(fpe[j] + v)) {
        deposit(acc, v);
        v = 0.0;
        break;
      }
      double err;
      fpe[j] = two_sum(fpe[j], v, err);
      v = err;
      if (v == 0.0) break;
    }
    if (v != 0.0) deposit(acc, v);  // expansion overflow -> exact deposit
  }
  for (int j = 0; j < kFpeSize; ++j) {
    if (fpe[j] != 0.0) deposit(acc, fpe[j]);
  }
}

void renorm(Acc& acc) {
  int64_t carry = 0;
  for (int j = 0; j < kNumLimbs; ++j) {
    const int64_t v = acc.limbs[j] + carry;
    const int64_t digit = v & kLimbMask;
    carry = (v - digit) >> kLimbBits;
    acc.limbs[j] = digit;
  }
  // headroom guarantees carry in {0,-1}; fold a negative wrap back into the
  // top limb so the int32 export below stays faithful (two's complement).
  acc.limbs[kNumLimbs - 1] += carry << kLimbBits;
}

}  // namespace

extern "C" {

// Exact sum of x[0..n) into 112 int64 limbs + 3 special counters.
// out_limbs must hold 112 int64; out_special 3 int64.
void exsum_cpu_acc(const double* x, int64_t n, int64_t* out_limbs,
                   int64_t* out_special, int num_threads) {
  Acc total;
  std::memset(&total, 0, sizeof(total));
#ifdef _OPENMP
  if (num_threads > 0) omp_set_num_threads(num_threads);
#pragma omp parallel
  {
    Acc local;
    std::memset(&local, 0, sizeof(local));
    const int t = omp_get_thread_num();
    const int nt = omp_get_num_threads();
    const int64_t chunk = (n + nt - 1) / nt;
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo < n) accumulate_range(x + lo, hi - lo, local);
#pragma omp critical
    {
      for (int j = 0; j < kNumLimbs; ++j) total.limbs[j] += local.limbs[j];
      total.nan_count += local.nan_count;
      total.pinf_count += local.pinf_count;
      total.ninf_count += local.ninf_count;
    }
  }
#else
  accumulate_range(x, n, total);
#endif
  renorm(total);
  std::memcpy(out_limbs, total.limbs, sizeof(total.limbs));
  out_special[0] = total.nan_count;
  out_special[1] = total.pinf_count;
  out_special[2] = total.ninf_count;
}

int exsum_cpu_num_limbs() { return kNumLimbs; }

}  // extern "C"
