// fastloader: native data-path kernels for the input pipeline.
//
// The reference's data layer leans on torch DataLoader workers + cv2 (C++)
// for its heavy lifting; this library is the TPU-side equivalent for the
// host: GIL-free multithreaded image preprocessing and pre-extracted-latent
// batch assembly, driven from Python via ctypes
// (pyramid_flow_tpu/data/native.py).
//
// Exposed C ABI:
//   pf_resize_bilinear_u8   - uint8 HWC bilinear resize (align_corners=False)
//   pf_u8_to_f32_norm       - uint8 -> float32 in [-1, 1] (vectorizable loop)
//   pf_crop_resize_norm     - fused resize-cover + crop + normalize
//   pf_batch_load_npy       - threaded .npy float32 loads into one batch
//                             buffer (minimal NPY v1/v2 header parser)
//
// Build: native/build.sh (g++ -O3 -march=native -shared -fPIC -pthread)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- resize
// Bilinear resize uint8 [h, w, c] -> [oh, ow, c], align_corners=False
// (same sampling convention as torch F.interpolate / our jax resampler).
void pf_resize_bilinear_u8(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                           uint8_t* dst, int64_t oh, int64_t ow) {
  const float sy = (float)h / (float)oh;
  const float sx = (float)w / (float)ow;
  for (int64_t oy = 0; oy < oh; ++oy) {
    float fy = ((float)oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > (float)(h - 1)) fy = (float)(h - 1);
    int64_t y0 = (int64_t)fy;
    int64_t y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - (float)y0;
    for (int64_t ox = 0; ox < ow; ++ox) {
      float fx = ((float)ox + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > (float)(w - 1)) fx = (float)(w - 1);
      int64_t x0 = (int64_t)fx;
      int64_t x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - (float)x0;
      const uint8_t* p00 = src + (y0 * w + x0) * c;
      const uint8_t* p01 = src + (y0 * w + x1) * c;
      const uint8_t* p10 = src + (y1 * w + x0) * c;
      const uint8_t* p11 = src + (y1 * w + x1) * c;
      uint8_t* out = dst + (oy * ow + ox) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        float top = (float)p00[ch] * (1 - wx) + (float)p01[ch] * wx;
        float bot = (float)p10[ch] * (1 - wx) + (float)p11[ch] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[ch] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// ------------------------------------------------------------- normalize
// uint8 [n] -> float32 [-1, 1]
void pf_u8_to_f32_norm(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = (float)src[i] * kScale - 1.0f;
  }
}

// ----------------------------------------------- fused cover-resize + crop
// Resize so the short side covers (th, tw), crop at (top, left) chosen by
// the caller (random or center), write normalized float32 [th, tw, c].
// Returns 0 on success.
int pf_crop_resize_norm(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                        float* dst, int64_t th, int64_t tw,
                        int64_t top, int64_t left) {
  const float scale_h = (float)th / (float)h;
  const float scale_w = (float)tw / (float)w;
  const float scale = scale_h > scale_w ? scale_h : scale_w;
  const int64_t nh = (int64_t)((float)h * scale + 0.5f);
  const int64_t nw = (int64_t)((float)w * scale + 0.5f);
  if (top < 0 || left < 0 || top + th > nh || left + tw > nw) return -1;

  std::vector<uint8_t> resized((size_t)(nh * nw * c));
  pf_resize_bilinear_u8(src, h, w, c, resized.data(), nh, nw);

  constexpr float kScale = 1.0f / 127.5f;
  for (int64_t y = 0; y < th; ++y) {
    const uint8_t* row = resized.data() + ((top + y) * nw + left) * c;
    float* out = dst + y * tw * c;
    for (int64_t i = 0; i < tw * c; ++i) {
      out[i] = (float)row[i] * kScale - 1.0f;
    }
  }
  return 0;
}

// ----------------------------------------------------------- npy loading
// Minimal NPY reader: little-endian float32/float16, C-order only.
static int load_npy_f32(const char* path, float* out, int64_t expect_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return -2;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return -3; }
    header_len = b[0] | (b[1] << 8);
  } else {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return -3; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) {
    fclose(f);
    return -4;
  }
  bool f16 = header.find("<f2") != std::string::npos;
  bool f32 = header.find("<f4") != std::string::npos;
  if ((!f16 && !f32) || header.find("'fortran_order': True") != std::string::npos) {
    fclose(f);
    return -5;
  }
  if (f32) {
    int64_t got = (int64_t)fread(out, 4, (size_t)expect_elems, f);
    fclose(f);
    return got == expect_elems ? 0 : -6;
  }
  // f16 -> f32 widening
  std::vector<uint16_t> tmp((size_t)expect_elems);
  int64_t got = (int64_t)fread(tmp.data(), 2, (size_t)expect_elems, f);
  fclose(f);
  if (got != expect_elems) return -6;
  for (int64_t i = 0; i < expect_elems; ++i) {
    uint16_t x = tmp[(size_t)i];
    uint32_t sign = (uint32_t)(x >> 15) << 31;
    uint32_t exp = (x >> 10) & 0x1f;
    uint32_t man = x & 0x3ff;
    uint32_t bits;
    if (exp == 0) {
      if (man == 0) {
        bits = sign;
      } else {  // subnormal
        exp = 127 - 15 + 1;
        while ((man & 0x400) == 0) {
          man <<= 1;
          --exp;
        }
        man &= 0x3ff;
        bits = sign | (exp << 23) | (man << 13);
      }
    } else if (exp == 0x1f) {
      bits = sign | 0x7f800000u | (man << 13);
    } else {
      bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    memcpy(out + i, &bits, 4);
  }
  return 0;
}

// Load `n` npy files concurrently into out[i * elems_per_item ...].
// paths: array of C strings. Returns number of failures.
int pf_batch_load_npy(const char** paths, int64_t n, float* out,
                      int64_t elems_per_item, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      if (load_npy_f32(paths[i], out + i * elems_per_item, elems_per_item) != 0) {
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  int t = num_threads < (int)n ? num_threads : (int)n;
  threads.reserve((size_t)t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
