// Native host-side runtime components (C++17, no external deps).
//
// The reference leans on PCL/FLANN C++ for its host runtime: PCD IO
// (pcl::io::loadPCDFile, icp_test_runner.cpp:156-...), the KD-tree
// (pcl::KdTreeFLANN, utils.hpp:393-424) and voxel filtering.  The TPU
// rebuild keeps the device compute path in XLA, and provides these host
// components natively here:
//
//   * PCD reader/writer (ascii + binary, x/y/z[/intensity]) -- the data
//     loader for benchmark and map files;
//   * an exact KD-tree (median-split, iterative best-bin search) -- the
//     host-side NN oracle used to validate the device-side voxel-grid /
//     brute-force paths, and for large-map preprocessing;
//   * voxel-grid downsampling (centroid per voxel) -- map preparation.
//
// Exposed as a plain C ABI consumed via ctypes (dcreg_tpu/io/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <numeric>
#include <queue>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCD IO
// ---------------------------------------------------------------------------

struct PcdData {
  std::vector<float> xyz;        // n * 3
  std::vector<float> intensity;  // n (optional; 0 if absent)
  int64_t n = 0;
  bool has_intensity = false;
};

static thread_local std::string g_err;

const char* dcreg_last_error() { return g_err.c_str(); }

// Parse a PCD file.  Returns a heap handle or nullptr on failure.
void* pcd_read(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { g_err = "cannot open file"; return nullptr; }

  std::string line;
  std::vector<std::string> fields;
  std::vector<int> sizes, counts;
  std::vector<char> types;
  int64_t n_points = -1;
  std::string data_mode;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key; ss >> key;
    if (key == "FIELDS") { std::string v; while (ss >> v) fields.push_back(v); }
    else if (key == "SIZE") { int v; while (ss >> v) sizes.push_back(v); }
    else if (key == "TYPE") { std::string v; while (ss >> v) types.push_back(v[0]); }
    else if (key == "COUNT") { int v; while (ss >> v) counts.push_back(v); }
    else if (key == "POINTS") { ss >> n_points; }
    else if (key == "WIDTH" && n_points < 0) { ss >> n_points; }
    else if (key == "HEIGHT") { int64_t h; ss >> h; /* n = w*h handled via POINTS */ }
    else if (key == "DATA") { ss >> data_mode; break; }
  }
  if (n_points < 0 || data_mode.empty()) { g_err = "malformed PCD header"; return nullptr; }
  if (counts.empty()) counts.assign(fields.size(), 1);
  if (sizes.size() != fields.size() || types.size() != fields.size()) {
    g_err = "inconsistent PCD header"; return nullptr;
  }

  int ix = -1, iy = -1, iz = -1, ii = -1;
  int64_t stride = 0;
  std::vector<int64_t> offsets(fields.size());
  for (size_t k = 0; k < fields.size(); ++k) {
    offsets[k] = stride;
    stride += int64_t(sizes[k]) * counts[k];
    if (fields[k] == "x") ix = int(k);
    else if (fields[k] == "y") iy = int(k);
    else if (fields[k] == "z") iz = int(k);
    else if (fields[k] == "intensity") ii = int(k);
  }
  if (ix < 0 || iy < 0 || iz < 0) { g_err = "PCD lacks x/y/z"; return nullptr; }

  auto out = new PcdData;
  out->n = n_points;
  out->has_intensity = ii >= 0;
  out->xyz.resize(size_t(n_points) * 3);
  out->intensity.assign(size_t(n_points), 0.f);

  auto read_field_f = [&](const char* base, int k) -> float {
    if (types[k] == 'F' && sizes[k] == 4) { float v; std::memcpy(&v, base + offsets[k], 4); return v; }
    if (types[k] == 'F' && sizes[k] == 8) { double v; std::memcpy(&v, base + offsets[k], 8); return float(v); }
    if (types[k] == 'U' && sizes[k] == 1) { uint8_t v; std::memcpy(&v, base + offsets[k], 1); return float(v); }
    if (types[k] == 'U' && sizes[k] == 2) { uint16_t v; std::memcpy(&v, base + offsets[k], 2); return float(v); }
    if (types[k] == 'U' && sizes[k] == 4) { uint32_t v; std::memcpy(&v, base + offsets[k], 4); return float(v); }
    if (types[k] == 'I' && sizes[k] == 4) { int32_t v; std::memcpy(&v, base + offsets[k], 4); return float(v); }
    return 0.f;
  };

  if (data_mode == "binary") {
    std::vector<char> buf(size_t(n_points) * stride);
    f.read(buf.data(), std::streamsize(buf.size()));
    if (f.gcount() != std::streamsize(buf.size())) {
      delete out; g_err = "truncated binary PCD"; return nullptr;
    }
    for (int64_t p = 0; p < n_points; ++p) {
      const char* base = buf.data() + p * stride;
      out->xyz[p * 3 + 0] = read_field_f(base, ix);
      out->xyz[p * 3 + 1] = read_field_f(base, iy);
      out->xyz[p * 3 + 2] = read_field_f(base, iz);
      if (ii >= 0) out->intensity[p] = read_field_f(base, ii);
    }
  } else if (data_mode == "ascii") {
    for (int64_t p = 0; p < n_points; ++p) {
      if (!std::getline(f, line)) { delete out; g_err = "truncated ascii PCD"; return nullptr; }
      std::istringstream ss(line);
      std::vector<double> vals; double v;
      while (ss >> v) vals.push_back(v);
      auto field_val = [&](int k) -> double {
        // locate the value index of field k (counts considered)
        int64_t idx = 0;
        for (int q = 0; q < k; ++q) idx += counts[q];
        return idx < int64_t(vals.size()) ? vals[size_t(idx)] : 0.0;
      };
      out->xyz[p * 3 + 0] = float(field_val(ix));
      out->xyz[p * 3 + 1] = float(field_val(iy));
      out->xyz[p * 3 + 2] = float(field_val(iz));
      if (ii >= 0) out->intensity[p] = float(field_val(ii));
    }
  } else {
    delete out; g_err = "unsupported DATA mode: " + data_mode; return nullptr;
  }
  return out;
}

int64_t pcd_num_points(void* h) { return static_cast<PcdData*>(h)->n; }
int pcd_has_intensity(void* h) { return static_cast<PcdData*>(h)->has_intensity ? 1 : 0; }
void pcd_copy_xyz(void* h, float* dst) {
  auto* d = static_cast<PcdData*>(h);
  std::memcpy(dst, d->xyz.data(), d->xyz.size() * sizeof(float));
}
void pcd_copy_intensity(void* h, float* dst) {
  auto* d = static_cast<PcdData*>(h);
  std::memcpy(dst, d->intensity.data(), d->intensity.size() * sizeof(float));
}
void pcd_free(void* h) { delete static_cast<PcdData*>(h); }

int pcd_write(const char* path, const float* xyz, const float* intensity,
              int64_t n, int binary) {
  std::ofstream f(path, std::ios::binary);
  if (!f) { g_err = "cannot open for write"; return -1; }
  const bool with_i = intensity != nullptr;
  f << "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n";
  f << "FIELDS x y z" << (with_i ? " intensity" : "") << "\n";
  f << "SIZE 4 4 4" << (with_i ? " 4" : "") << "\n";
  f << "TYPE F F F" << (with_i ? " F" : "") << "\n";
  f << "COUNT 1 1 1" << (with_i ? " 1" : "") << "\n";
  f << "WIDTH " << n << "\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n";
  f << "POINTS " << n << "\nDATA " << (binary ? "binary" : "ascii") << "\n";
  if (binary) {
    for (int64_t p = 0; p < n; ++p) {
      f.write(reinterpret_cast<const char*>(xyz + p * 3), 12);
      if (with_i) f.write(reinterpret_cast<const char*>(intensity + p), 4);
    }
  } else {
    for (int64_t p = 0; p < n; ++p) {
      f << xyz[p * 3] << " " << xyz[p * 3 + 1] << " " << xyz[p * 3 + 2];
      if (with_i) f << " " << intensity[p];
      f << "\n";
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Exact KD-tree (median split, iterative search)
// ---------------------------------------------------------------------------

struct KdTree {
  std::vector<float> pts;        // n * 3
  std::vector<int32_t> index;    // permutation: tree order -> original id
  std::vector<int32_t> split_axis;  // per internal node
  int64_t n = 0;

  // implicit balanced layout: node covers [lo, hi) of `index`; the median
  // element is the node point; children are [lo, mid) and [mid+1, hi).
};

static void kd_build_range(KdTree* t, int64_t lo, int64_t hi) {
  if (hi - lo <= 1) return;
  // pick widest axis
  float mn[3] = {1e38f, 1e38f, 1e38f}, mx[3] = {-1e38f, -1e38f, -1e38f};
  for (int64_t i = lo; i < hi; ++i) {
    const float* p = &t->pts[size_t(t->index[i]) * 3];
    for (int a = 0; a < 3; ++a) { mn[a] = std::min(mn[a], p[a]); mx[a] = std::max(mx[a], p[a]); }
  }
  int axis = 0;
  float w = mx[0] - mn[0];
  for (int a = 1; a < 3; ++a) if (mx[a] - mn[a] > w) { w = mx[a] - mn[a]; axis = a; }
  int64_t mid = lo + (hi - lo) / 2;
  std::nth_element(t->index.begin() + lo, t->index.begin() + mid,
                   t->index.begin() + hi,
                   [t, axis](int32_t a, int32_t b) {
                     return t->pts[size_t(a) * 3 + axis] < t->pts[size_t(b) * 3 + axis];
                   });
  t->split_axis[size_t(mid)] = axis;
  kd_build_range(t, lo, mid);
  kd_build_range(t, mid + 1, hi);
}

void* kdtree_build(const float* xyz, int64_t n) {
  auto* t = new KdTree;
  t->n = n;
  t->pts.assign(xyz, xyz + n * 3);
  t->index.resize(size_t(n));
  std::iota(t->index.begin(), t->index.end(), 0);
  t->split_axis.assign(size_t(n), 0);
  kd_build_range(t, 0, n);
  return t;
}

void kdtree_free(void* h) { delete static_cast<KdTree*>(h); }

struct Frame { int64_t lo, hi; int stage; float diff; };

static void kd_query_one(const KdTree* t, const float* q, int k,
                         int32_t* out_idx, float* out_d2) {
  // max-heap of (d2, idx), size <= k
  std::priority_queue<std::pair<float, int32_t>> heap;
  std::vector<Frame> stack;
  stack.push_back({0, t->n, 0, 0.f});
  while (!stack.empty()) {
    Frame fr = stack.back(); stack.pop_back();
    int64_t lo = fr.lo, hi = fr.hi;
    if (fr.stage == 1) {
      // revisit far side only if it can contain closer points
      float worst = heap.size() == size_t(k) ? heap.top().first : 1e38f;
      if (fr.diff * fr.diff >= worst) continue;
      lo = fr.lo; hi = fr.hi;  // the far-range is encoded directly
    }
    while (hi - lo >= 1) {
      int64_t mid = lo + (hi - lo) / 2;
      const int32_t id = t->index[size_t(mid)];
      const float* p = &t->pts[size_t(id) * 3];
      float d2 = 0;
      for (int a = 0; a < 3; ++a) { float d = p[a] - q[a]; d2 += d * d; }
      if (heap.size() < size_t(k)) heap.push({d2, id});
      else if (d2 < heap.top().first) { heap.pop(); heap.push({d2, id}); }
      if (hi - lo == 1) break;
      int axis = t->split_axis[size_t(mid)];
      float diff = q[axis] - p[axis];
      int64_t near_lo, near_hi, far_lo, far_hi;
      if (diff <= 0) { near_lo = lo; near_hi = mid; far_lo = mid + 1; far_hi = hi; }
      else { near_lo = mid + 1; near_hi = hi; far_lo = lo; far_hi = mid; }
      if (far_hi > far_lo) stack.push_back({far_lo, far_hi, 1, diff});
      lo = near_lo; hi = near_hi;
      if (hi <= lo) break;
    }
  }
  int m = int(heap.size());
  for (int i = m - 1; i >= 0; --i) {
    out_d2[i] = heap.top().first;
    out_idx[i] = heap.top().second;
    heap.pop();
  }
  for (int i = m; i < k; ++i) { out_d2[i] = 1e38f; out_idx[i] = -1; }
}

void kdtree_knn(void* h, const float* queries, int64_t nq, int k,
                int32_t* out_idx, float* out_d2) {
  auto* t = static_cast<KdTree*>(h);
  for (int64_t i = 0; i < nq; ++i)
    kd_query_one(t, queries + i * 3, k, out_idx + i * k, out_d2 + i * k);
}

// ---------------------------------------------------------------------------
// Voxel-grid downsampling (centroid per voxel)
// ---------------------------------------------------------------------------

int64_t voxel_downsample(const float* xyz, int64_t n, float voxel,
                         float* out_xyz /* capacity n*3 */) {
  struct Acc { double x = 0, y = 0, z = 0; int64_t c = 0; };
  std::unordered_map<int64_t, Acc> cells;
  cells.reserve(size_t(n));
  const double inv = 1.0 / voxel;
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = int64_t(std::floor(xyz[i * 3 + 0] * inv));
    int64_t cy = int64_t(std::floor(xyz[i * 3 + 1] * inv));
    int64_t cz = int64_t(std::floor(xyz[i * 3 + 2] * inv));
    int64_t key = ((cx * 73856093) ^ (cy * 19349669) ^ (cz * 83492791));
    auto& a = cells[key];
    a.x += xyz[i * 3]; a.y += xyz[i * 3 + 1]; a.z += xyz[i * 3 + 2]; a.c += 1;
  }
  int64_t m = 0;
  for (auto& kv : cells) {
    out_xyz[m * 3 + 0] = float(kv.second.x / kv.second.c);
    out_xyz[m * 3 + 1] = float(kv.second.y / kv.second.c);
    out_xyz[m * 3 + 2] = float(kv.second.z / kv.second.c);
    ++m;
  }
  return m;
}

}  // extern "C"
