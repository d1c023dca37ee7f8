// Native image pipeline ops for the host data loader.
//
// TPU-native counterpart of the reference's compiled data path (the reference
// leans on torchvision/PIL C extensions; its only bespoke native code is the
// CUDA ops, enhancing/losses/op/*.cu, whose TPU equivalents are Pallas
// kernels in enhancing_tpu/ops/). This library accelerates the host-side
// stages that feed HBM: bilinear resize, fused crop+flip+normalize, and
// batched uint8->float32 conversion. Exposed via ctypes (no pybind11 in this
// image).
//
// Build: see native/build.py (cc -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// PIL-compatible BILINEAR resize (separable triangle filter with adaptive
// support when downscaling), HWC uint8 -> HWC uint8. Matches
// PIL.Image.resize(..., BILINEAR) used by the numpy fallback path.
namespace {

struct FilterTable {
    // per output pixel: first source index + normalized weights
    std::vector<int64_t> first;
    std::vector<int> count;
    std::vector<float> weights;  // stride = max_count
    int max_count;
};

FilterTable build_triangle(int64_t in_size, int64_t out_size) {
    FilterTable t;
    const double scale = static_cast<double>(in_size) / out_size;
    const double support = scale < 1.0 ? 1.0 : scale;
    t.max_count = static_cast<int>(2 * support + 2);
    t.first.resize(out_size);
    t.count.resize(out_size);
    t.weights.assign(out_size * t.max_count, 0.0f);
    for (int64_t x = 0; x < out_size; ++x) {
        const double center = (x + 0.5) * scale;
        int64_t lo = static_cast<int64_t>(center - support + 0.5);
        int64_t hi = static_cast<int64_t>(center + support + 0.5);
        lo = std::max<int64_t>(lo, 0);
        hi = std::min(hi, in_size);
        const double inv = scale < 1.0 ? 1.0 : 1.0 / scale;
        double total = 0.0;
        for (int64_t s = lo; s < hi; ++s) {
            const double d = (s + 0.5 - center) * inv;
            const double w = d < 0 ? (d > -1 ? 1 + d : 0) : (d < 1 ? 1 - d : 0);
            t.weights[x * t.max_count + (s - lo)] = static_cast<float>(w);
            total += w;
        }
        if (total > 0) {
            for (int64_t s = lo; s < hi; ++s)
                t.weights[x * t.max_count + (s - lo)] /=
                    static_cast<float>(total);
        }
        t.first[x] = lo;
        t.count[x] = static_cast<int>(hi - lo);
    }
    return t;
}

}  // namespace

void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
    const FilterTable th = build_triangle(sh, dh);
    const FilterTable tw = build_triangle(sw, dw);
    // horizontal pass into a float intermediate (sh x dw x c)
    std::vector<float> tmp(sh * dw * c);
    for (int64_t y = 0; y < sh; ++y) {
        const uint8_t* row = src + y * sw * c;
        for (int64_t x = 0; x < dw; ++x) {
            float* out = tmp.data() + (y * dw + x) * c;
            std::memset(out, 0, c * sizeof(float));
            const int64_t lo = tw.first[x];
            for (int k = 0; k < tw.count[x]; ++k) {
                const float w = tw.weights[x * tw.max_count + k];
                const uint8_t* px = row + (lo + k) * c;
                for (int64_t ch = 0; ch < c; ++ch) out[ch] += w * px[ch];
            }
        }
    }
    // vertical pass
    for (int64_t y = 0; y < dh; ++y) {
        const int64_t lo = th.first[y];
        for (int64_t x = 0; x < dw; ++x) {
            uint8_t* out = dst + (y * dw + x) * c;
            for (int64_t ch = 0; ch < c; ++ch) {
                float acc = 0.0f;
                for (int k = 0; k < th.count[y]; ++k) {
                    const float w = th.weights[y * th.max_count + k];
                    acc += w * tmp[((lo + k) * dw + x) * c + ch];
                }
                acc = std::max(0.0f, std::min(acc, 255.0f));
                out[ch] = static_cast<uint8_t>(acc + 0.5f);
            }
        }
    }
}

// Fused crop + optional horizontal flip + uint8 -> float32 [0,1], HWC.
void crop_flip_normalize(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                         int64_t top, int64_t left, int64_t size, int flip,
                         float* dst) {
    const float inv = 1.0f / 255.0f;
    for (int64_t y = 0; y < size; ++y) {
        const uint8_t* row = src + ((top + y) * sw + left) * c;
        float* out = dst + y * size * c;
        if (flip) {
            for (int64_t x = 0; x < size; ++x) {
                const uint8_t* px = row + (size - 1 - x) * c;
                for (int64_t ch = 0; ch < c; ++ch)
                    out[x * c + ch] = px[ch] * inv;
            }
        } else {
            for (int64_t x = 0; x < size * c; ++x) out[x] = row[x] * inv;
        }
    }
}

// Batched uint8 -> float32 [0,1] (contiguous).
void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
    const float inv = 1.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * inv;
}

}  // extern "C"
