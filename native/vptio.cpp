// libvptio — native volume I/O for vpt_tpu.
//
// The reference's data pipeline (readers/loaders, SURVEY.md §2.3) is
// JavaScript; this is its native-tier counterpart for large-volume ingest:
// mmap-backed byte-range access, a minimal ZIP (stored entries) reader with
// the same EOCD/central-directory semantics as the reference's ZIPReader
// (/root/reference/src/js/readers/ZIPReader.js:20-91), headerless RAW slice
// streaming (RAWReader.js:14-69), and multi-threaded block assembly into a
// caller-provided density buffer.
//
// C ABI only (consumed via ctypes from vpt_tpu.scene.native_io).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <mutex>
#include <unordered_map>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
    int fd = -1;
    const uint8_t* data = nullptr;
    size_t size = 0;

    bool open(const char* path) {
        fd = ::open(path, O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0) { ::close(fd); fd = -1; return false; }
        size = static_cast<size_t>(st.st_size);
        if (size > 0) {
            void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
            if (p == MAP_FAILED) { ::close(fd); fd = -1; return false; }
            data = static_cast<const uint8_t*>(p);
        }
        return true;
    }
    ~MappedFile() {
        if (data) munmap(const_cast<uint8_t*>(data), size);
        if (fd >= 0) ::close(fd);
    }
};

struct ZipEntry {
    std::string name;
    uint16_t method = 0;
    uint32_t compressed_size = 0;
    uint32_t uncompressed_size = 0;
    uint32_t header_offset = 0;
    size_t data_offset = 0;  // resolved lazily from the local header
    bool resolved = false;
};

struct ZipArchive {
    MappedFile file;
    std::vector<ZipEntry> entries;
    std::unordered_map<std::string, size_t> index;
    std::mutex mu;

    static uint16_t rd16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }
    static uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }

    // Same minimal parse as the reference: fixed-size EOCD at EOF (no
    // comment scan — parity with ZIPReader.js:41-56), then the CD walk.
    bool parse() {
        const size_t MIN_EOCD = 22;
        if (file.size < MIN_EOCD) return false;
        const uint8_t* eocd = file.data + file.size - MIN_EOCD;
        if (rd32(eocd) != 0x06054b50) return false;
        uint16_t n = rd16(eocd + 10);
        uint32_t cd_size = rd32(eocd + 12);
        uint32_t cd_off = rd32(eocd + 16);
        if (cd_off + cd_size > file.size) return false;
        const uint8_t* p = file.data + cd_off;
        entries.reserve(n);
        for (uint16_t i = 0; i < n; i++) {
            if (p + 46 > file.data + file.size) return false;
            if (rd32(p) != 0x02014b50) return false;
            ZipEntry e;
            e.method = rd16(p + 10);
            e.compressed_size = rd32(p + 20);
            e.uncompressed_size = rd32(p + 24);
            uint16_t name_len = rd16(p + 28);
            uint16_t extra_len = rd16(p + 30);
            uint16_t comment_len = rd16(p + 32);
            e.header_offset = rd32(p + 42);
            e.name.assign(reinterpret_cast<const char*>(p + 46), name_len);
            index[e.name] = entries.size();
            entries.push_back(std::move(e));
            p += 46 + name_len + extra_len + comment_len;
        }
        return true;
    }

    const uint8_t* entry_data(size_t i, uint32_t* out_size) {
        ZipEntry& e = entries[i];
        {
            std::lock_guard<std::mutex> lock(mu);
            if (!e.resolved) {
                const uint8_t* h = file.data + e.header_offset;
                if (e.header_offset + 30 > file.size || rd32(h) != 0x04034b50)
                    return nullptr;
                uint16_t name_len = rd16(h + 26);
                uint16_t extra_len = rd16(h + 28);
                e.data_offset = e.header_offset + 30 + name_len + extra_len;
                e.resolved = true;
            }
        }
        if (e.method != 0) return nullptr;  // stored entries only (parity)
        if (e.data_offset + e.compressed_size > file.size) return nullptr;
        *out_size = e.compressed_size;
        return file.data + e.data_offset;
    }
};

}  // namespace

extern "C" {

// ---- ZIP ----------------------------------------------------------------
void* vptio_zip_open(const char* path) {
    auto* z = new ZipArchive();
    if (!z->file.open(path) || !z->parse()) { delete z; return nullptr; }
    return z;
}

void vptio_zip_close(void* handle) { delete static_cast<ZipArchive*>(handle); }

int64_t vptio_zip_count(void* handle) {
    return static_cast<ZipArchive*>(handle)->entries.size();
}

const char* vptio_zip_name(void* handle, int64_t i) {
    auto* z = static_cast<ZipArchive*>(handle);
    if (i < 0 || static_cast<size_t>(i) >= z->entries.size()) return nullptr;
    return z->entries[i].name.c_str();
}

// Returns entry size, or -1 if missing / not stored. Copies into out if
// out != null (caller sizes it via a first call with out == null).
int64_t vptio_zip_read(void* handle, const char* name, uint8_t* out) {
    auto* z = static_cast<ZipArchive*>(handle);
    auto it = z->index.find(name);
    if (it == z->index.end()) return -1;
    uint32_t size = 0;
    const uint8_t* p = z->entry_data(it->second, &size);
    if (!p) return -1;
    if (out) memcpy(out, p, size);
    return size;
}

// ---- RAW volumes --------------------------------------------------------
// Assemble a headerless uint8 W*H*D volume into out (normalized f32),
// multi-threaded over z-slabs. Returns 0 on success.
int vptio_load_raw_f32(const char* path, int64_t width, int64_t height,
                       int64_t depth, float* out, int threads) {
    MappedFile f;
    if (!f.open(path)) return 1;
    size_t need = static_cast<size_t>(width) * height * depth;
    if (f.size < need) return 2;
    if (threads <= 0) threads = std::thread::hardware_concurrency();
    if (threads <= 0) threads = 1;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int64_t z = next.fetch_add(1);
            if (z >= depth) break;
            const uint8_t* src = f.data + z * width * height;
            float* dst = out + z * width * height;
            // divide (not multiply by reciprocal): bit-parity with the
            // Python path's astype(f32)/255.0
            for (int64_t i = 0; i < width * height; i++) dst[i] = src[i] / 255.0f;
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; t++) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return 0;
}

// ---- BVP block assembly -------------------------------------------------
// Copy a (bd, bh, bw) uint8 block into a (D, H, W) f32 volume at (z, y, x),
// normalizing to [0, 1]. Used by the Python-side BVP assembler for its
// per-placement writes (Volume.js:69-71 analog).
void vptio_place_block_f32(const uint8_t* block, int64_t bw, int64_t bh,
                           int64_t bd, float* volume, int64_t W, int64_t H,
                           int64_t D, int64_t x, int64_t y, int64_t z) {
    for (int64_t zz = 0; zz < bd; zz++) {
        for (int64_t yy = 0; yy < bh; yy++) {
            const uint8_t* src = block + (zz * bh + yy) * bw;
            float* dst = volume + ((z + zz) * H + (y + yy)) * W + x;
            for (int64_t xx = 0; xx < bw; xx++) dst[xx] = src[xx] / 255.0f;
        }
    }
}

// ---- corner packing (hot-path preprocessing) ----------------------------
// Native counterpart of ops/interp.pack_volume_corners: build the
// (D+1, H+1, W+1, 8) single-gather corner table from a (D, H, W) f32 grid,
// multi-threaded over output slabs.
int vptio_pack_corners_f32(const float* vol, int64_t D, int64_t H, int64_t W,
                           float* out, int threads) {
    if (threads <= 0) threads = std::thread::hardware_concurrency();
    if (threads <= 0) threads = 1;
    const int64_t Ho = H + 1, Wo = W + 1;
    auto clampi = [](int64_t v, int64_t lo, int64_t hi) {
        return v < lo ? lo : (v > hi ? hi : v);
    };
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int64_t zo = next.fetch_add(1);
            if (zo > D) break;
            int64_t z0 = clampi(zo - 1, 0, D - 1);
            int64_t z1 = clampi(zo, 0, D - 1);
            for (int64_t yo = 0; yo < Ho; yo++) {
                int64_t y0 = clampi(yo - 1, 0, H - 1);
                int64_t y1 = clampi(yo, 0, H - 1);
                const float* r00 = vol + (z0 * H + y0) * W;
                const float* r01 = vol + (z0 * H + y1) * W;
                const float* r10 = vol + (z1 * H + y0) * W;
                const float* r11 = vol + (z1 * H + y1) * W;
                float* dst = out + ((zo * Ho + yo) * Wo) * 8;
                for (int64_t xo = 0; xo < Wo; xo++) {
                    int64_t x0 = clampi(xo - 1, 0, W - 1);
                    int64_t x1 = clampi(xo, 0, W - 1);
                    dst[0] = r00[x0]; dst[1] = r00[x1];
                    dst[2] = r01[x0]; dst[3] = r01[x1];
                    dst[4] = r10[x0]; dst[5] = r10[x1];
                    dst[6] = r11[x0]; dst[7] = r11[x1];
                    dst += 8;
                }
            }
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; t++) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return 0;
}

}  // extern "C"
