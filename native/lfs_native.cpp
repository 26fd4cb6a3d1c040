// LichtFeld-Studio-TPU native runtime components.
//
// The reference implements its entire host runtime in C++ (loader
// src/loader/formats/colmap.cpp, PLY via tinyply, image IO via OpenImageIO).
// The TPU build keeps Python as the orchestration layer but moves the
// genuinely hot host-side paths native:
//
//   * COLMAP binary parsing — points3D.bin for a MipNeRF360 scene holds
//     millions of variable-length records whose offsets chain sequentially;
//     a Python loop takes minutes, this parser streams it in ~100 ms.
//   * 3DGS PLY vertex blob transpose (interleaved -> planar float columns).
//   * Parallel box-filtered image downsampling for the data loader
//     (factor 2/4/8 resize of decoded RGB, the hot part of image_io.cpp).
//
// Exposed with a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// COLMAP points3D.bin
// layout per record: id(u64) xyz(3xf64) rgb(3xu8) error(f64)
//                    track_len(u64) track(track_len x (u32,u32))
// Returns number of points parsed, or -1 on error. Caller passes the raw
// file bytes and output buffers sized via colmap_points3d_count.
// ---------------------------------------------------------------------------
int64_t colmap_points3d_count(const uint8_t* data, int64_t size) {
    if (size < 8) return -1;
    uint64_t n;
    std::memcpy(&n, data, 8);
    return (int64_t)n;
}

int64_t colmap_points3d_parse(
    const uint8_t* data, int64_t size,
    float* means /* [n,3] */, float* colors /* [n,3] */) {
    if (size < 8) return -1;
    uint64_t n;
    std::memcpy(&n, data, 8);
    int64_t off = 8;
    for (uint64_t i = 0; i < n; ++i) {
        if (off + 59 > size) return -1;
        double xyz[3];
        std::memcpy(xyz, data + off + 8, 24);
        means[i * 3 + 0] = (float)xyz[0];
        means[i * 3 + 1] = (float)xyz[1];
        means[i * 3 + 2] = (float)xyz[2];
        colors[i * 3 + 0] = (float)data[off + 32];
        colors[i * 3 + 1] = (float)data[off + 33];
        colors[i * 3 + 2] = (float)data[off + 34];
        uint64_t track_len;
        std::memcpy(&track_len, data + off + 43, 8);
        off += 51 + 8 * (int64_t)track_len;
        if (off > size) return -1;
    }
    return (int64_t)n;
}

// ---------------------------------------------------------------------------
// Interleaved PLY vertex blob -> planar float32 columns.
// in: [n * stride_floats] f32, sel: [n_cols] column indices
// out: [n_cols * n] planar
// ---------------------------------------------------------------------------
void ply_deinterleave(
    const float* in, int64_t n, int32_t stride_floats,
    const int32_t* sel, int32_t n_cols, float* out) {
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n < 65536) n_threads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int32_t c = 0; c < n_cols; ++c) {
            const int32_t s = sel[c];
            float* dst = out + (int64_t)c * n;
            for (int64_t i = lo; i < hi; ++i) dst[i] = in[i * stride_floats + s];
        }
    };
    if (n_threads == 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo < hi) ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Box-filtered integer-factor downsample of an RGB float image (the loader's
// resize_factor 2/4/8 path, image_io.cpp semantics).
// in: [h, w, 3] f32; out: [h/f, w/f, 3] f32
// ---------------------------------------------------------------------------
void resize_box_rgb(
    const float* in, int32_t h, int32_t w, int32_t factor, float* out) {
    const int32_t oh = h / factor, ow = w / factor;
    const float inv = 1.0f / (float)(factor * factor);
    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int32_t y0, int32_t y1) {
        for (int32_t oy = y0; oy < y1; ++oy) {
            for (int32_t ox = 0; ox < ow; ++ox) {
                float acc[3] = {0, 0, 0};
                for (int32_t dy = 0; dy < factor; ++dy) {
                    const float* row = in + (((int64_t)(oy * factor + dy)) * w + ox * factor) * 3;
                    for (int32_t dx = 0; dx < factor; ++dx) {
                        acc[0] += row[dx * 3 + 0];
                        acc[1] += row[dx * 3 + 1];
                        acc[2] += row[dx * 3 + 2];
                    }
                }
                float* dst = out + ((int64_t)oy * ow + ox) * 3;
                dst[0] = acc[0] * inv;
                dst[1] = acc[1] * inv;
                dst[2] = acc[2] * inv;
            }
        }
    };
    if (n_threads == 1 || oh < 64) {
        work(0, oh);
        return;
    }
    std::vector<std::thread> ts;
    int32_t chunk = (oh + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int32_t lo = t * chunk, hi = std::min(oh, lo + chunk);
        if (lo < hi) ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
}

}  // extern "C"
