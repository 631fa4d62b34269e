// lcdata — native host-side data-pipeline kernels for lc_tpu.
//
// The TPU compute path is pure XLA; the host side still decodes masks and depth
// patches per sample (the reference burns 8 fork'd DataLoader workers on this,
// dataset.py:367-491). These are the hot host loops as vectorizable C++ with
// OpenMP batch parallelism, exposed through a plain C ABI for ctypes
// (no pybind11 in this image). Python keeps numpy fallbacks (lc_tpu/data/native.py).
//
// Build: native/build.sh  ->  native/liblcdata.so

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// COCO-style column-major RLE decode: counts alternate 0-runs and 1-runs.
// out must hold h*w bytes (row-major); we write transposed from the F-order runs.
void rle_decode_u8(const int64_t* counts, int n_counts, int h, int w,
                   uint8_t* out) {
    int64_t pos = 0;
    const int64_t total = (int64_t)h * w;
    uint8_t val = 0;
    for (int i = 0; i < n_counts && pos < total; ++i) {
        int64_t run = counts[i];
        if (run > total - pos) run = total - pos;
        if (val) {
            for (int64_t k = pos; k < pos + run; ++k) {
                // F-order index k -> (row = k % h, col = k / h)
                out[(k % h) * w + (k / h)] = 1;
            }
        }
        pos += run;
        val ^= 1;
    }
}

// 3x3 median filter on uint16 (cv2.medianBlur parity for the z_crop fill,
// reference dataset.py:302). Border handling matches OpenCV: replicated edges.
void median3_u16(const uint16_t* in, int h, int w, uint16_t* out) {
    auto at = [&](int y, int x) {
        y = y < 0 ? 0 : (y >= h ? h - 1 : y);
        x = x < 0 ? 0 : (x >= w ? w - 1 : x);
        return in[y * w + x];
    };
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int y = 0; y < h; ++y) {
        uint16_t win[9];
        for (int x = 0; x < w; ++x) {
            int k = 0;
            for (int dy = -1; dy <= 1; ++dy)
                for (int dx = -1; dx <= 1; ++dx)
                    win[k++] = at(y + dy, x + dx);
            std::nth_element(win, win + 4, win + 9);
            out[y * w + x] = win[4];
        }
    }
}

// Expand a normalized uint16 z_crop patch into the full-image homo_z map:
// homo_z[v1, u1] = ((u1+0.5) z, (v1+0.5) z, z) with
// z = (z16 - 1) * (z_max - z_min) / 65534 + z_min for nonzero entries
// (reference dataset.py:287-311). homo_z (H, W, 3) and msk (H, W) must be
// zero-initialized by the caller.
void zcrop_expand_f32(const uint16_t* z16, int ch, int cw, int x1, int y1,
                      float z_min, float z_max, int H, int W,
                      float* homo_z, float* msk) {
    const float scale = (z_max - z_min) / 65534.0f;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int v = 0; v < ch; ++v) {
        const int vy = v + y1;
        if (vy < 0 || vy >= H) continue;
        for (int u = 0; u < cw; ++u) {
            const uint16_t raw = z16[v * cw + u];
            if (!raw) continue;
            const int ux = u + x1;
            if (ux < 0 || ux >= W) continue;
            const float z = (float)(raw - 1) * scale + z_min;
            float* p = homo_z + ((int64_t)vy * W + ux) * 3;
            p[0] = ((float)ux + 0.5f) * z;
            p[1] = ((float)vy + 0.5f) * z;
            p[2] = z;
            msk[(int64_t)vy * W + ux] = 1.0f;
        }
    }
}

// Batched variant: decode many z_crops in parallel (one thread per sample).
void zcrop_expand_batch_f32(int n,
                            const uint16_t* const* z16s, const int* chs,
                            const int* cws, const int* x1s, const int* y1s,
                            const float* z_mins, const float* z_maxs,
                            int H, int W, float* const* homo_zs,
                            float* const* msks) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        zcrop_expand_f32(z16s[i], chs[i], cws[i], x1s[i], y1s[i], z_mins[i],
                         z_maxs[i], H, W, homo_zs[i], msks[i]);
    }
}

}  // extern "C"
