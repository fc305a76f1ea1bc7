// scanpack — packed binary scan cache (native runtime data loader).
//
// The reference re-decodes every PNG/JPG from disk on each run
// (src/detector/dataset.py __getitem__); scanpack converts a decoded scan
// into one contiguous little-endian file so subsequent runs (and the
// benchmark harness) load it with a single sequential read straight into
// the host buffers that feed jax.device_put — no image codecs on the hot
// path. Layout:
//
//   magic "TPSCAN1\0" | int64 F,H,W,Hd,Wd
//   | rgb  uint8  F*H*W*3
//   | depth float32 F*Hd*Wd
//   | intr float32 F*4 | rgb_size float32 F*2 | poses float32 F*7
//
// C ABI for ctypes; fallback path in Python uses .npz.

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {
constexpr char kMagic[8] = {'T', 'P', 'S', 'C', 'A', 'N', '1', '\0'};

struct Header {
    char magic[8];
    int64_t f, h, w, hd, wd;
};

bool write_all(FILE* fp, const void* buf, size_t bytes) {
    return std::fwrite(buf, 1, bytes, fp) == bytes;
}

bool read_all(FILE* fp, void* buf, size_t bytes) {
    return std::fread(buf, 1, bytes, fp) == bytes;
}
}  // namespace

extern "C" {

int tpu3dlm_scanpack_write(const char* path, const uint8_t* rgb,
                           const float* depth, const float* intr,
                           const float* rgb_size, const float* poses,
                           int64_t f, int64_t h, int64_t w, int64_t hd,
                           int64_t wd) {
    FILE* fp = std::fopen(path, "wb");
    if (!fp) return -1;
    Header hdr{};
    std::memcpy(hdr.magic, kMagic, 8);
    hdr.f = f; hdr.h = h; hdr.w = w; hdr.hd = hd; hdr.wd = wd;
    bool ok = write_all(fp, &hdr, sizeof(hdr)) &&
              write_all(fp, rgb, static_cast<size_t>(f) * h * w * 3) &&
              write_all(fp, depth, sizeof(float) * f * hd * wd) &&
              write_all(fp, intr, sizeof(float) * f * 4) &&
              write_all(fp, rgb_size, sizeof(float) * f * 2) &&
              write_all(fp, poses, sizeof(float) * f * 7);
    std::fclose(fp);
    return ok ? 0 : -2;
}

// dims_out: int64[5] = F,H,W,Hd,Wd. Call with null buffers to probe dims.
int tpu3dlm_scanpack_read(const char* path, int64_t* dims_out, uint8_t* rgb,
                          float* depth, float* intr, float* rgb_size,
                          float* poses) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    Header hdr{};
    if (!read_all(fp, &hdr, sizeof(hdr)) ||
        std::memcmp(hdr.magic, kMagic, 8) != 0) {
        std::fclose(fp);
        return -3;
    }
    // corrupt header bytes can carry the magic but garbage dims; negative
    // or absurd dims must read as "invalid pack" (callers rebuild), not
    // overflow the size arithmetic below or the caller's allocations
    const int64_t kDimCap = 1000000000;
    if (hdr.f <= 0 || hdr.h <= 0 || hdr.w <= 0 || hdr.hd <= 0 ||
        hdr.wd <= 0 || hdr.f > kDimCap || hdr.h > kDimCap ||
        hdr.w > kDimCap || hdr.hd > kDimCap || hdr.wd > kDimCap) {
        std::fclose(fp);
        return -4;
    }
    if (!rgb) {  // probe mode: report dims
        dims_out[0] = hdr.f; dims_out[1] = hdr.h; dims_out[2] = hdr.w;
        dims_out[3] = hdr.hd; dims_out[4] = hdr.wd;
        std::fclose(fp);
        return 0;
    }
    // data mode: the caller sized its buffers from a prior probe — a pack
    // rewritten in between (concurrent process re-caching the capture)
    // must not overflow them; dims_out carries the EXPECTED dims in
    if (dims_out[0] != hdr.f || dims_out[1] != hdr.h ||
        dims_out[2] != hdr.w || dims_out[3] != hdr.hd ||
        dims_out[4] != hdr.wd) {
        std::fclose(fp);
        return -5;
    }
    bool ok = read_all(fp, rgb, static_cast<size_t>(hdr.f) * hdr.h * hdr.w * 3) &&
              read_all(fp, depth, sizeof(float) * hdr.f * hdr.hd * hdr.wd) &&
              read_all(fp, intr, sizeof(float) * hdr.f * 4) &&
              read_all(fp, rgb_size, sizeof(float) * hdr.f * 2) &&
              read_all(fp, poses, sizeof(float) * hdr.f * 7);
    std::fclose(fp);
    return ok ? 0 : -2;
}

}  // extern "C"
