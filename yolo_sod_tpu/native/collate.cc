// Host data-plane core: fused batch collate kernels.
//
// The training input pipeline's hottest host op is assembling the
// (B, H, W, 3) uint8 RGB batch from B decoded BGR frames: numpy's
// `ascontiguousarray(stack(items)[..., ::-1])` runs the channel reversal
// as a strided element-wise copy (~140 ms for a 640x640 batch-16 on one
// core — longer than the 89.6 ms device train step, i.e. loader-bound).
// This file fuses stack + BGR->RGB swap (+ optional crop-paste for mosaic
// compositing) into single-pass streaming kernels. Bit-exact by
// construction; parity-tested against the numpy path in
// tests/test_native.py. Parallelized with OpenMP across images — the
// single-core dev host degrades gracefully to one thread, production TPU
// hosts (dozens of cores) scale linearly.
//
// Reference analog: the torch DataLoader's C++ worker/pin-memory collate
// (reference engine/trainer.py dataloader path); this is the TPU-host
// equivalent, bound into Python via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Stack B HxWx3 uint8 BGR images into one contiguous (B,H,W,3) RGB batch.
// srcs: array of B pointers to contiguous HxWx3 uint8 BGR buffers.
void sod_stack_bgr2rgb(const uint8_t** srcs, int64_t b, int64_t hw,
                       uint8_t* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    const uint8_t* s = srcs[i];
    uint8_t* d = dst + i * hw * 3;
    for (int64_t p = 0; p < hw; ++p) {
      // Byte triple swap; gcc -O3 vectorizes this to pshufb-style shuffles.
      const uint8_t b0 = s[3 * p], g = s[3 * p + 1], r = s[3 * p + 2];
      d[3 * p] = r;
      d[3 * p + 1] = g;
      d[3 * p + 2] = b0;
    }
  }
}

// Same-layout stack without the channel swap (sources already RGB).
void sod_stack_u8(const uint8_t** srcs, int64_t b, int64_t bytes_per_img,
                  uint8_t* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < b; ++i) {
    std::memcpy(dst + i * bytes_per_img, srcs[i], bytes_per_img);
  }
}

// Paste a HxWx3 uint8 tile into a larger canvas at (y, x): the mosaic
// compositing primitive (one row-wise memcpy sweep, no numpy temporaries).
void sod_paste_u8(const uint8_t* src, int64_t sh, int64_t sw,
                  uint8_t* canvas, int64_t ch_, int64_t cw, int64_t y,
                  int64_t x) {
  if (y < 0 || x < 0 || y + sh > ch_ || x + sw > cw) return;  // caller clips
  for (int64_t r = 0; r < sh; ++r) {
    std::memcpy(canvas + ((y + r) * cw + x) * 3, src + r * sw * 3, sw * 3);
  }
}

// Fill a HxWx3 uint8 canvas with a constant BGR color (letterbox pad value).
void sod_fill_u8(uint8_t* dst, int64_t hw, uint8_t c0, uint8_t c1,
                 uint8_t c2) {
  if (c0 == c1 && c1 == c2) {
    std::memset(dst, c0, hw * 3);
    return;
  }
  for (int64_t p = 0; p < hw; ++p) {
    dst[3 * p] = c0;
    dst[3 * p + 1] = c1;
    dst[3 * p + 2] = c2;
  }
}

int sod_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
