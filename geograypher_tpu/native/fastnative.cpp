// Native host-side runtime pieces for geograypher-tpu.
//
// Replaces the perf-critical host paths that the reference delegates to
// third-party native libraries:
//  * fast binary PLY mesh loading (reference uses VTK via pv.read,
//    meshes/meshes.py:193) — uniform-stride vertex/face parse, no Python
//    loop, fan triangulation for quads;
//  * run-length codec for int32 pix2face maps — the reference's disk
//    cache of raw maps reaches "100s of GBs" (meshes.py:1666-1667);
//    face-id rasters are long-run data, so RLE typically shrinks them
//    ~10-50x at memcpy-like speed.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in this
// environment).  Build: `make` in this directory (see Makefile).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// RLE codec for int32 rasters.
// Format: sequence of (int32 value, uint32 run_length) pairs.
// ---------------------------------------------------------------------------

// Worst case output: 8 bytes per element.
int64_t rle_encode_i32(const int32_t* data, int64_t n, uint8_t* out,
                       int64_t out_capacity) {
  int64_t written = 0;
  int64_t i = 0;
  while (i < n) {
    int32_t v = data[i];
    int64_t run = 1;
    while (i + run < n && data[i + run] == v && run < 0xFFFFFFFFLL) run++;
    if (written + 8 > out_capacity) return -1;
    std::memcpy(out + written, &v, 4);
    uint32_t r32 = static_cast<uint32_t>(run);
    std::memcpy(out + written + 4, &r32, 4);
    written += 8;
    i += run;
  }
  return written;
}

int64_t rle_decode_i32(const uint8_t* enc, int64_t enc_len, int32_t* out,
                       int64_t out_capacity) {
  int64_t pos = 0;
  int64_t n = 0;
  while (pos + 8 <= enc_len) {
    int32_t v;
    uint32_t run;
    std::memcpy(&v, enc + pos, 4);
    std::memcpy(&run, enc + pos + 4, 4);
    pos += 8;
    if (n + run > out_capacity) return -1;
    for (uint32_t k = 0; k < run; k++) out[n + k] = v;
    n += run;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Binary little-endian PLY fast path.
//
// Two-phase API for ctypes: ply_open parses the header and returns counts;
// ply_read fills caller-allocated numpy buffers.  Only handles the common
// photogrammetry-export layout (vertex props incl. x/y/z as float/double,
// optional uchar rgb; face list uchar/int32). Returns 0 on success,
// negative error codes otherwise; the Python side falls back to the pure
// reader on any failure.
// ---------------------------------------------------------------------------

struct PlyInfo {
  FILE* fh = nullptr;
  int64_t n_verts = 0;
  int64_t n_faces = 0;
  int vert_stride = 0;     // bytes per vertex record
  int x_offset = -1;       // byte offset of x within record
  int xyz_is_double = 0;   // 1 if x/y/z are float64
  int rgb_offset = -1;     // byte offset of uchar r within record
  int64_t vert_data_start = 0;
  int count_size = 0;      // bytes of the face-list count field
  int index_size = 0;      // bytes per index
};

static const int MAX_HANDLES = 64;
static PlyInfo* g_handles[MAX_HANDLES] = {nullptr};

static int prop_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

int ply_open(const char* path, int64_t* n_verts, int64_t* n_faces,
             int* has_rgb, int* xyz_is_double) {
  FILE* fh = std::fopen(path, "rb");
  if (!fh) return -1;
  char line[4096];
  if (!std::fgets(line, sizeof line, fh) || std::strncmp(line, "ply", 3)) {
    std::fclose(fh);
    return -2;
  }
  PlyInfo info;
  info.fh = fh;
  std::string current_element;
  int vert_offset = 0;
  bool binary_le = false;
  int x_off = -1, y_off = -1, z_off = -1;
  int r_off = -1, g_off = -1, b_off = -1;
  int xyz_double = 0, xyz_size = 0;
  while (std::fgets(line, sizeof line, fh)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("comment", 0) == 0) continue;
    if (s.rfind("format", 0) == 0) {
      binary_le = s.find("binary_little_endian") != std::string::npos;
      continue;
    }
    if (s.rfind("element", 0) == 0) {
      char name[128];
      long long count;
      if (std::sscanf(s.c_str(), "element %127s %lld", name, &count) == 2) {
        current_element = name;
        if (current_element == "vertex") info.n_verts = count;
        if (current_element == "face") info.n_faces = count;
      }
      continue;
    }
    if (s.rfind("property", 0) == 0) {
      if (current_element == "vertex") {
        char type[64], name[128];
        if (std::sscanf(s.c_str(), "property %63s %127s", type, name) == 2) {
          int sz = prop_size(type);
          if (sz < 0) {
            std::fclose(fh);
            return -3;
          }
          if (std::strcmp(name, "x") == 0) {
            x_off = vert_offset;
            xyz_double = (sz == 8);
            xyz_size = sz;
          }
          if (std::strcmp(name, "y") == 0) y_off = vert_offset;
          if (std::strcmp(name, "z") == 0) z_off = vert_offset;
          if (std::strcmp(name, "red") == 0 && sz == 1) r_off = vert_offset;
          if (std::strcmp(name, "green") == 0 && sz == 1) g_off = vert_offset;
          if (std::strcmp(name, "blue") == 0 && sz == 1) b_off = vert_offset;
          vert_offset += sz;
        }
      } else if (current_element == "face") {
        char kw[16], ct[64], it[64], name[128];
        if (std::sscanf(s.c_str(), "property %15s %63s %63s %127s", kw, ct,
                        it, name) == 4 &&
            std::strcmp(kw, "list") == 0) {
          info.count_size = prop_size(ct);
          info.index_size = prop_size(it);
        }
      }
      continue;
    }
    if (s == "end_header") break;
  }
  // The fast readers memcpy x/y/z (and r/g/b) as one contiguous block, so
  // they are only correct when the properties are adjacent and in order.
  // Any other layout (e.g. "x nx y ...") must take the Python fallback
  // rather than silently returning corrupted geometry.
  bool xyz_contig = x_off >= 0 && y_off == x_off + xyz_size &&
                    z_off == x_off + 2 * xyz_size;
  bool rgb_contig = r_off < 0 || (g_off == r_off + 1 && b_off == r_off + 2);
  if (!binary_le || !xyz_contig || !rgb_contig || info.count_size <= 0 ||
      info.index_size != 4) {
    std::fclose(fh);
    return -4;  // fall back to the Python reader
  }
  info.vert_stride = vert_offset;
  info.x_offset = x_off;
  info.rgb_offset = r_off;
  info.xyz_is_double = xyz_double;
  info.vert_data_start = std::ftell(fh);

  int handle = -1;
  for (int i = 0; i < MAX_HANDLES; i++) {
    if (!g_handles[i]) {
      handle = i;
      break;
    }
  }
  if (handle < 0) {
    std::fclose(fh);
    return -5;
  }
  g_handles[handle] = new PlyInfo(info);
  *n_verts = info.n_verts;
  *n_faces = info.n_faces;
  *has_rgb = (r_off >= 0) ? 1 : 0;
  *xyz_is_double = xyz_double;
  return handle;
}

// Reads vertices into verts (n_verts*3 float64), colors into rgb
// (n_verts*3 uint8, may be null), and triangulated faces into tris
// (capacity tri_capacity*3 int32). Returns the number of triangles, or a
// negative error.
int64_t ply_read(int handle, double* verts, uint8_t* rgb, int32_t* tris,
                 int64_t tri_capacity) {
  if (handle < 0 || handle >= MAX_HANDLES || !g_handles[handle]) return -1;
  PlyInfo& info = *g_handles[handle];
  FILE* fh = info.fh;
  std::fseek(fh, info.vert_data_start, SEEK_SET);

  std::vector<uint8_t> buf(static_cast<size_t>(info.vert_stride) *
                           info.n_verts);
  if (std::fread(buf.data(), 1, buf.size(), fh) != buf.size()) return -2;
  for (int64_t i = 0; i < info.n_verts; i++) {
    const uint8_t* rec = buf.data() + i * info.vert_stride;
    if (info.xyz_is_double) {
      std::memcpy(verts + i * 3, rec + info.x_offset, 24);
    } else {
      float xyz[3];
      std::memcpy(xyz, rec + info.x_offset, 12);
      verts[i * 3 + 0] = xyz[0];
      verts[i * 3 + 1] = xyz[1];
      verts[i * 3 + 2] = xyz[2];
    }
    if (rgb && info.rgb_offset >= 0) {
      std::memcpy(rgb + i * 3, rec + info.rgb_offset, 3);
    }
  }

  // Faces: stream records, fan-triangulate
  int64_t n_tris = 0;
  std::vector<uint8_t> fbuf(1 << 20);
  size_t have = 0, pos = 0;
  for (int64_t f = 0; f < info.n_faces; f++) {
    // ensure count available
    if (pos + static_cast<size_t>(info.count_size) > have) {
      std::memmove(fbuf.data(), fbuf.data() + pos, have - pos);
      have -= pos;
      pos = 0;
      have += std::fread(fbuf.data() + have, 1, fbuf.size() - have, fh);
      // a truncated face section must error, not parse stale bytes
      if (pos + static_cast<size_t>(info.count_size) > have) return -3;
    }
    int64_t cnt = 0;
    std::memcpy(&cnt, fbuf.data() + pos, info.count_size);
    pos += info.count_size;
    if (cnt < 0 || cnt > 255) return -3;  // corrupt count field
    size_t need = static_cast<size_t>(cnt) * info.index_size;
    if (pos + need > have) {
      std::memmove(fbuf.data(), fbuf.data() + pos, have - pos);
      have -= pos;
      pos = 0;
      have += std::fread(fbuf.data() + have, 1, fbuf.size() - have, fh);
      if (pos + need > have) return -3;
    }
    // count fields of 1 byte leave the index run misaligned: copy into
    // an aligned scratch (unaligned int32 loads are UB)
    int32_t idx[256];
    std::memcpy(idx, fbuf.data() + pos, need);
    pos += need;
    for (int64_t k = 1; k + 1 < cnt; k++) {
      if (n_tris >= tri_capacity) return -4;
      tris[n_tris * 3 + 0] = idx[0];
      tris[n_tris * 3 + 1] = idx[k];
      tris[n_tris * 3 + 2] = idx[k + 1];
      n_tris++;
    }
  }
  return n_tris;
}

void ply_close(int handle) {
  if (handle >= 0 && handle < MAX_HANDLES && g_handles[handle]) {
    std::fclose(g_handles[handle]->fh);
    delete g_handles[handle];
    g_handles[handle] = nullptr;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Threaded host-side class-count aggregation.
//
// TPU XLA scatters cost ~11 ns/element (see docs/DESIGN.md); a CPU
// scatter-add runs at memory speed.  When a pix2face map is on the host
// anyway (cache hits, post-processing), this threaded histogram is the
// cheapest way to fold a view into per-face class counts.  Each thread
// owns a face-id range and scans all pixels, so no atomics or merges.
// ---------------------------------------------------------------------------

#include <thread>

extern "C" {

// p2f: n_pix int32 face ids (-1 = background); labels: n_pix int32 class
// ids (<0 ignored); out: (n_faces * n_classes) int32, caller-zeroed.
void class_counts_i32(const int32_t* p2f, const int32_t* labels,
                      int64_t n_pix, int64_t n_faces, int32_t n_classes,
                      int32_t* out, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  int64_t faces_per = (n_faces + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int64_t lo = t * faces_per;
    int64_t hi = std::min<int64_t>(n_faces, lo + faces_per);
    workers.emplace_back([=]() {
      for (int64_t i = 0; i < n_pix; i++) {
        int32_t f = p2f[i];
        int32_t c = labels[i];
        if (f >= lo && f < hi && c >= 0 && c < n_classes) {
          out[static_cast<int64_t>(f) * n_classes + c]++;
        }
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
