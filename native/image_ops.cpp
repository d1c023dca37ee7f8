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
    // horizontal pass into a float intermediate (sh x dw x c); c==3 fast
    // path keeps the accumulators in registers
    std::vector<float> tmp(sh * dw * c);
    for (int64_t y = 0; y < sh; ++y) {
        const uint8_t* row = src + y * sw * c;
        float* orow = tmp.data() + y * dw * c;
        if (c == 3) {
            for (int64_t x = 0; x < dw; ++x) {
                const int64_t lo = tw.first[x];
                const float* wp = &tw.weights[x * tw.max_count];
                const int cnt = tw.count[x];
                const uint8_t* px = row + lo * 3;
                float a0 = 0.f, a1 = 0.f, a2 = 0.f;
                for (int k = 0; k < cnt; ++k, px += 3) {
                    const float w = wp[k];
                    a0 += w * px[0];
                    a1 += w * px[1];
                    a2 += w * px[2];
                }
                orow[x * 3 + 0] = a0;
                orow[x * 3 + 1] = a1;
                orow[x * 3 + 2] = a2;
            }
        } else {
            for (int64_t x = 0; x < dw; ++x) {
                float* out = orow + x * c;
                std::memset(out, 0, c * sizeof(float));
                const int64_t lo = tw.first[x];
                for (int k = 0; k < tw.count[x]; ++k) {
                    const float w = tw.weights[x * tw.max_count + k];
                    const uint8_t* px = row + (lo + k) * c;
                    for (int64_t ch = 0; ch < c; ++ch) out[ch] += w * px[ch];
                }
            }
        }
    }
    // vertical pass as whole-row axpys (contiguous, vectorizes)
    const int64_t rowlen = dw * c;
    std::vector<float> acc(rowlen);
    for (int64_t y = 0; y < dh; ++y) {
        const int64_t lo = th.first[y];
        const int cnt = th.count[y];
        const float* wp = &th.weights[y * th.max_count];
        {
            const float w = wp[0];
            const float* trow = tmp.data() + lo * rowlen;
            for (int64_t i = 0; i < rowlen; ++i) acc[i] = w * trow[i];
        }
        for (int k = 1; k < cnt; ++k) {
            const float w = wp[k];
            const float* trow = tmp.data() + (lo + k) * rowlen;
            for (int64_t i = 0; i < rowlen; ++i) acc[i] += w * trow[i];
        }
        uint8_t* out = dst + y * rowlen;
        for (int64_t i = 0; i < rowlen; ++i) {
            float v = acc[i];
            v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
            out[i] = static_cast<uint8_t>(v + 0.5f);
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

// ---------------------------------------------------------------------------
// In-memory JPEG/PNG decode (libjpeg / libpng — both system libs in this
// image) and a persistent-thread-pool batch pipeline:
// decode -> shorter-side bilinear resize -> crop -> flip -> normalize,
// one worker per image. This replaces the loader's PIL decode (the
// reference's data path is PIL + torchvision C extensions,
// reference: enhancing/dataloader/imagenet.py:24-38); decode is the
// dominant host-CPU cost when feeding a TPU from JPEG folders.
// ---------------------------------------------------------------------------

#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>

#if defined(__has_include)
#  if __has_include(<jpeglib.h>)
#    define HAVE_LIBJPEG 1
#    include <jpeglib.h>
#  endif
#  if __has_include(<png.h>)
#    define HAVE_LIBPNG 1
#    include <png.h>
#  endif
#endif

namespace {

#ifdef HAVE_LIBJPEG
struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jmp;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jmp, 1);
}

// Header-only probe: dims without decoding pixel data.
bool jpeg_header_dims(const uint8_t* data, int64_t len, int64_t* h,
                      int64_t* w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// RGB8 decode writing scanlines straight into dst (cap = h*w*3 from the
// header probe); single decode pass, no intermediate buffer.
bool decode_jpeg_into(const uint8_t* data, int64_t len, uint8_t* dst,
                      int64_t cap, int64_t* h, int64_t* w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *h = cinfo.output_height;
    *w = cinfo.output_width;
    const int64_t stride = *w * 3;
    if (*h * stride > cap) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = dst + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_jpeg_mem(const uint8_t* data, int64_t len,
                     std::vector<uint8_t>* out, int64_t* h, int64_t* w) {
    if (!jpeg_header_dims(data, len, h, w)) return false;
    out->resize(*h * *w * 3);
    return decode_jpeg_into(data, len, out->data(),
                            static_cast<int64_t>(out->size()), h, w);
}
#endif  // HAVE_LIBJPEG

#ifdef HAVE_LIBPNG
struct PngReader {
    const uint8_t* data;
    int64_t len;
    int64_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
    PngReader* r = static_cast<PngReader*>(png_get_io_ptr(png));
    if (r->pos + static_cast<int64_t>(n) > r->len) {
        png_error(png, "eof");
        return;
    }
    std::memcpy(out, r->data + r->pos, n);
    r->pos += n;
}

// Header-only probe.
bool png_header_dims(const uint8_t* data, int64_t len, int64_t* h,
                     int64_t* w) {
    if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    PngReader reader{data, len, 0};
    png_set_read_fn(png, &reader, png_read_fn);
    png_read_info(png, info);
    *h = png_get_image_height(png, info);
    *w = png_get_image_width(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

// RGB8 decode into dst (alpha stripped, palette/gray expanded).
bool decode_png_into(const uint8_t* data, int64_t len, uint8_t* dst,
                     int64_t cap, int64_t* h, int64_t* w) {
    if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    PngReader reader{data, len, 0};
    png_set_read_fn(png, &reader, png_read_fn);
    png_read_info(png, info);
    png_set_expand(png);               // palette/gray/low-bit -> 8-bit
    png_set_strip_16(png);
    png_set_strip_alpha(png);
    png_set_gray_to_rgb(png);
    png_read_update_info(png, info);
    *h = png_get_image_height(png, info);
    *w = png_get_image_width(png, info);
    if (png_get_rowbytes(png, info) != static_cast<size_t>(*w * 3)
            || *h * *w * 3 > cap) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    std::vector<png_bytep> rows(*h);
    for (int64_t y = 0; y < *h; ++y) rows[y] = dst + y * *w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_png_mem(const uint8_t* data, int64_t len,
                    std::vector<uint8_t>* out, int64_t* h, int64_t* w) {
    int64_t ph = 0, pw = 0;
    if (!png_header_dims(data, len, &ph, &pw)) return false;
    // expanded output is h*w*3 regardless of source channels
    out->resize(ph * pw * 3);
    return decode_png_into(data, len, out->data(),
                           static_cast<int64_t>(out->size()), h, w);
}
#endif  // HAVE_LIBPNG

bool decode_any(const uint8_t* data, int64_t len, std::vector<uint8_t>* out,
                int64_t* h, int64_t* w) {
#ifdef HAVE_LIBJPEG
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
        return decode_jpeg_mem(data, len, out, h, w);
#endif
#ifdef HAVE_LIBPNG
    if (len >= 8 && !png_sig_cmp(data, 0, 8))
        return decode_png_mem(data, len, out, h, w);
#endif
    (void)data; (void)len; (void)out; (void)h; (void)w;
    return false;
}

// Minimal persistent thread pool (lazy, sized to the host).
class Pool {
  public:
    static Pool& get() {
        // intentionally leaked: a static Pool's destructor would run at
        // process exit while workers still wait on the condvar (destroying
        // a joinable std::thread aborts; joining deadlocks). Workers are
        // detached daemon threads; the OS reclaims them at exit.
        static Pool* pool = new Pool();
        return *pool;
    }

    void run(int64_t n, const std::function<void(int64_t)>& fn) {
        if (n <= 1 || workers_.empty()) {
            for (int64_t i = 0; i < n; ++i) fn(i);
            return;
        }
        // One batch at a time: the batch state (fn_/next_/total_/done_) is
        // shared, and run() releases m_ while waiting on cv_done_. Python
        // DataLoader workers call this concurrently (ctypes drops the GIL),
        // so without this outer lock a second batch would overwrite the
        // first's counters mid-flight.
        std::lock_guard<std::mutex> batch_lk(batch_m_);
        std::unique_lock<std::mutex> lk(m_);
        fn_ = &fn;
        next_ = 0;
        total_ = n;
        done_ = 0;
        cv_.notify_all();
        cv_done_.wait(lk, [&] { return done_ == total_; });
        fn_ = nullptr;
    }

  private:
    Pool() {
        int n = static_cast<int>(std::thread::hardware_concurrency());
        n = std::max(1, std::min(n - 2, 32));
        for (int i = 0; i < n; ++i) {
            workers_.emplace_back([this] { worker(); });
            workers_.back().detach();
        }
    }

    void worker() {
        std::unique_lock<std::mutex> lk(m_);
        for (;;) {
            cv_.wait(lk, [&] { return fn_ && next_ < total_; });
            while (fn_ && next_ < total_) {
                const int64_t i = next_++;
                const auto* fn = fn_;
                lk.unlock();
                (*fn)(i);
                lk.lock();
                if (++done_ == total_) cv_done_.notify_all();
            }
        }
    }

    std::vector<std::thread> workers_;
    std::mutex batch_m_;  // serializes whole run() batches
    std::mutex m_;
    std::condition_variable cv_, cv_done_;
    const std::function<void(int64_t)>* fn_ = nullptr;
    int64_t next_ = 0, total_ = 0, done_ = 0;
};

}  // namespace

extern "C" {

int has_decoders(void) {
    int r = 0;
#ifdef HAVE_LIBJPEG
    r |= 1;
#endif
#ifdef HAVE_LIBPNG
    r |= 2;
#endif
    return r;
}

// Two-phase decode into caller-provided storage: decode_image_dims is a
// HEADER-ONLY probe (no pixel decode); decode_image_u8 is the single full
// decode straight into the caller's (h*w*3) buffer. Returns 1 on success.
int decode_image_dims(const uint8_t* data, int64_t len, int64_t* h,
                      int64_t* w) {
#ifdef HAVE_LIBJPEG
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
        return jpeg_header_dims(data, len, h, w) ? 1 : 0;
#endif
#ifdef HAVE_LIBPNG
    if (len >= 8 && !png_sig_cmp(data, 0, 8))
        return png_header_dims(data, len, h, w) ? 1 : 0;
#endif
    return 0;
}

int decode_image_u8(const uint8_t* data, int64_t len, uint8_t* dst,
                    int64_t cap, int64_t* h, int64_t* w) {
#ifdef HAVE_LIBJPEG
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
        return decode_jpeg_into(data, len, dst, cap, h, w) ? 1 : 0;
#endif
#ifdef HAVE_LIBPNG
    if (len >= 8 && !png_sig_cmp(data, 0, 8))
        return decode_png_into(data, len, dst, cap, h, w) ? 1 : 0;
#endif
    return 0;
}

// Threaded batch pipeline: for each image i,
//   decode(blob[i]) -> resize shorter side to resize_short (skipped when
//   already <=) -> crop size x size at (tops[i], lefts[i]) (clamped) ->
//   optional hflip -> float32 [0,1] into out[i].
// ok[i] = 1 on success, 0 on corrupt/undecodable input (out[i] zeroed).
void decode_pipeline_batch(int64_t n, const uint8_t** blobs,
                           const int64_t* lens, int64_t resize_short,
                           int64_t size, const int64_t* tops,
                           const int64_t* lefts, const int* flips,
                           float* out, int* ok) {
    Pool::get().run(n, [&](int64_t i) {
        float* dst = out + i * size * size * 3;
        std::vector<uint8_t> px;
        int64_t h = 0, w = 0;
        if (!decode_any(blobs[i], lens[i], &px, &h, &w)) {
            std::memset(dst, 0, size * size * 3 * sizeof(float));
            ok[i] = 0;
            return;
        }
        std::vector<uint8_t> resized;
        const uint8_t* src = px.data();
        int64_t sh = h, sw = w;
        const int64_t shorter = std::min(h, w);
        if (resize_short > 0 && shorter != resize_short) {
            if (h < w) {
                sh = resize_short;
                sw = std::max<int64_t>(
                    1, (w * resize_short + shorter / 2) / shorter);
            } else {
                sw = resize_short;
                sh = std::max<int64_t>(
                    1, (h * resize_short + shorter / 2) / shorter);
            }
            resized.resize(sh * sw * 3);
            resize_bilinear_u8(px.data(), h, w, 3, resized.data(), sh, sw);
            src = resized.data();
        }
        const int64_t top = std::max<int64_t>(
            0, std::min(tops[i], sh - size));
        const int64_t left = std::max<int64_t>(
            0, std::min(lefts[i], sw - size));
        if (sh < size || sw < size) {   // degenerate: pad-free guard
            std::memset(dst, 0, size * size * 3 * sizeof(float));
            ok[i] = 0;
            return;
        }
        crop_flip_normalize(src, sh, sw, 3, top, left, size, flips[i], dst);
        ok[i] = 1;
    });
}

}  // extern "C"
