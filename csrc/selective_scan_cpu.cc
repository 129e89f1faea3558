// Selective-scan CPU reference op as an XLA FFI custom call.
//
// Native (C++) counterpart of the reference CUDA kernels
// (/root/reference/mamba/csrc/selective_scan/): exact sequential recurrence
//   x_t = exp(dt_t * A) * x_{t-1} + dt_t * B_t * u_t
//   y_t = sum_n C_t[n] * x_t[n]  (+ D * u_t)  (* silu(z_t))
// with delta-bias + softplus fused, used as the bit-faithful CPU execution
// path (the Pallas kernel is the TPU production path).
//
// Layout (time-major, dim-last — matches ops/selective_scan.py):
//   u, delta, z: (B, L, D) f32   Bmat, Cmat: (B, L, N) f32
//   A: (D, N) f32   Dskip, bias: (D) f32
// Outputs: out (B, L, D) f32, last_state (B, D, N) f32.

#include <cmath>
#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

static inline float softplusf(float x) {
  if (x > 20.f) return x;
  return std::log1p(std::exp(x));
}

static ffi::Error SelectiveScanFwdImpl(
    ffi::Buffer<ffi::F32> u, ffi::Buffer<ffi::F32> delta,
    ffi::Buffer<ffi::F32> A, ffi::Buffer<ffi::F32> Bmat,
    ffi::Buffer<ffi::F32> Cmat, ffi::Buffer<ffi::F32> Dskip,
    ffi::Buffer<ffi::F32> z, ffi::Buffer<ffi::F32> bias,
    std::int64_t flags,  // bit0: has_D, bit1: has_z, bit2: has_bias, bit3: softplus
    ffi::ResultBuffer<ffi::F32> out, ffi::ResultBuffer<ffi::F32> last) {
  const auto dims = u.dimensions();
  const std::int64_t Bsz = dims[0], L = dims[1], D = dims[2];
  const std::int64_t N = A.dimensions()[1];
  const bool has_D = flags & 1, has_z = flags & 2, has_bias = flags & 4,
             use_softplus = flags & 8;

  const float* pu = u.typed_data();
  const float* pd = delta.typed_data();
  const float* pA = A.typed_data();
  const float* pB = Bmat.typed_data();
  const float* pC = Cmat.typed_data();
  const float* pD = Dskip.typed_data();
  const float* pz = z.typed_data();
  const float* pb = bias.typed_data();
  float* po = out->typed_data();
  float* pl = last->typed_data();

#pragma omp parallel for collapse(2)
  for (std::int64_t b = 0; b < Bsz; ++b) {
    for (std::int64_t d = 0; d < D; ++d) {
      std::vector<float> x(N, 0.f);
      for (std::int64_t t = 0; t < L; ++t) {
        float dt = pd[(b * L + t) * D + d];
        if (has_bias) dt += pb[d];
        if (use_softplus) dt = softplusf(dt);
        const float ut = pu[(b * L + t) * D + d];
        const float dtu = dt * ut;
        float y = 0.f;
        const float* Bt = pB + (b * L + t) * N;
        const float* Ct = pC + (b * L + t) * N;
        const float* Ad = pA + d * N;
        for (std::int64_t n = 0; n < N; ++n) {
          x[n] = std::exp(dt * Ad[n]) * x[n] + dtu * Bt[n];
          y += Ct[n] * x[n];
        }
        if (has_D) y += pD[d] * ut;
        if (has_z) {
          const float zt = pz[(b * L + t) * D + d];
          y *= zt / (1.f + std::exp(-zt));
        }
        po[(b * L + t) * D + d] = y;
      }
      for (std::int64_t n = 0; n < N; ++n) pl[(b * D + d) * N + n] = x[n];
    }
  }
  return ffi::Error::Success();
}

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    SelectiveScanFwd, SelectiveScanFwdImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()   // u
        .Arg<ffi::Buffer<ffi::F32>>()   // delta
        .Arg<ffi::Buffer<ffi::F32>>()   // A
        .Arg<ffi::Buffer<ffi::F32>>()   // B
        .Arg<ffi::Buffer<ffi::F32>>()   // C
        .Arg<ffi::Buffer<ffi::F32>>()   // D
        .Arg<ffi::Buffer<ffi::F32>>()   // z
        .Arg<ffi::Buffer<ffi::F32>>()   // bias
        .Attr<std::int64_t>("flags")
        .Ret<ffi::Buffer<ffi::F32>>()   // out
        .Ret<ffi::Buffer<ffi::F32>>()); // last_state
