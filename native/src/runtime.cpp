/* Host runtime: voxel downsample, scan accumulator, ordered prefetcher.
 *
 * Accumulator re-implements aicp_ros/src/velodyne_accumulator.cpp:31-72
 * (range crop in the sensor frame, transform into odom, concatenate until
 * batch_size). The prefetcher replaces App::processFromFile's synchronous
 * per-frame disk read (app.cpp:261-278) with an N-thread read-ahead that
 * keeps the TPU fed; delivery is strictly in sequence order so the pipeline
 * stays deterministic.
 */
#include "aicp_native.h"

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

/* ---------- voxel downsample (centroid, first-touch voxel order) ---------- */

long aicp_voxel_downsample(const float* xyz, long n, float voxel,
                           float* out_xyz, long capacity) {
  if (voxel <= 0.0f || n <= 0) return 0;
  struct Acc {
    double sx = 0, sy = 0, sz = 0;
    long count = 0;
    long slot = -1;
  };
  std::unordered_map<unsigned long long, Acc> grid;
  grid.reserve(static_cast<size_t>(n));
  const double inv = 1.0 / voxel;
  long n_slots = 0;
  for (long i = 0; i < n; i++) {
    float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    // 21-bit signed quantization per axis packed into 64 bits
    long long qx = static_cast<long long>(std::floor(x * inv)) + (1 << 20);
    long long qy = static_cast<long long>(std::floor(y * inv)) + (1 << 20);
    long long qz = static_cast<long long>(std::floor(z * inv)) + (1 << 20);
    if (qx < 0 || qy < 0 || qz < 0 || qx >= (1 << 21) || qy >= (1 << 21) ||
        qz >= (1 << 21))
      continue;
    unsigned long long key = (static_cast<unsigned long long>(qx) << 42) |
                             (static_cast<unsigned long long>(qy) << 21) |
                             static_cast<unsigned long long>(qz);
    Acc& a = grid[key];
    if (a.count == 0) {
      if (n_slots >= capacity) continue;  // voxel budget exhausted
      a.slot = n_slots++;
    }
    a.sx += x;
    a.sy += y;
    a.sz += z;
    a.count++;
  }
  for (const auto& kv : grid) {
    const Acc& a = kv.second;
    if (a.slot < 0) continue;
    out_xyz[3 * a.slot] = static_cast<float>(a.sx / a.count);
    out_xyz[3 * a.slot + 1] = static_cast<float>(a.sy / a.count);
    out_xyz[3 * a.slot + 2] = static_cast<float>(a.sz / a.count);
  }
  return n_slots;
}

/* ---------- scan accumulator ---------- */

struct AicpAccum {
  long capacity;
  int batch_size;
  float min_range, max_range;
  int n_scans = 0;
  std::vector<float> points;  // odom frame, 3*count
};

AicpAccum* aicp_accum_create(long capacity, int batch_size, float min_range,
                             float max_range) {
  AicpAccum* h = new AicpAccum();
  h->capacity = capacity;
  h->batch_size = batch_size;
  h->min_range = min_range;
  h->max_range = max_range;
  h->points.reserve(static_cast<size_t>(capacity) * 3);
  return h;
}

long aicp_accum_push(AicpAccum* h, const float* xyz, long n, const float* T) {
  if (h->n_scans >= h->batch_size) return -1;
  const float min2 = h->min_range * h->min_range;
  const float max2 = h->max_range * h->max_range;
  long kept = 0;
  for (long i = 0; i < n; i++) {
    float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    float r2 = x * x + y * y + z * z;
    if (r2 < min2 || r2 > max2) continue;  // sensor-frame range crop
    if (static_cast<long>(h->points.size() / 3) >= h->capacity) break;
    h->points.push_back(T[0] * x + T[1] * y + T[2] * z + T[3]);
    h->points.push_back(T[4] * x + T[5] * y + T[6] * z + T[7]);
    h->points.push_back(T[8] * x + T[9] * y + T[10] * z + T[11]);
    kept++;
  }
  h->n_scans++;
  return kept;
}

long aicp_accum_count(const AicpAccum* h) {
  return static_cast<long>(h->points.size() / 3);
}

int aicp_accum_finished(const AicpAccum* h) {
  return h->n_scans >= h->batch_size ? 1 : 0;
}

long aicp_accum_take(AicpAccum* h, float* out_xyz, long out_capacity) {
  long n = static_cast<long>(h->points.size() / 3);
  if (n > out_capacity) n = out_capacity;
  std::memcpy(out_xyz, h->points.data(), static_cast<size_t>(n) * 3 * sizeof(float));
  h->points.clear();
  h->n_scans = 0;
  return n;
}

void aicp_accum_clear(AicpAccum* h) {
  h->points.clear();
  h->n_scans = 0;
}

void aicp_accum_destroy(AicpAccum* h) { delete h; }

/* ---------- ordered multi-threaded prefetcher ---------- */

struct PrefetchItem {
  std::vector<float> xyz;  // padded to capacity*3
  double viewpoint[7];
  long count;  // points, or -2 read error
};

struct AicpPrefetch {
  std::vector<std::string> paths;
  long capacity;
  float voxel;
  int window;

  std::atomic<long> next_claim{0};
  long next_deliver = 0;
  std::map<long, PrefetchItem> ready;
  std::mutex mu;
  std::condition_variable cv_ready;    // consumer waits for next_deliver
  std::condition_variable cv_window;   // workers wait for window space
  bool stop = false;
  std::vector<std::thread> workers;

  ~AicpPrefetch() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_window.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker() {
    for (;;) {
      long idx = next_claim.fetch_add(1);
      if (idx >= static_cast<long>(paths.size())) return;
      {
        // bound read-ahead: don't run more than `window` items past delivery
        std::unique_lock<std::mutex> lk(mu);
        cv_window.wait(lk, [&] { return stop || idx < next_deliver + window; });
        if (stop) return;
      }
      PrefetchItem item;
      item.count = load(paths[idx], item);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::move(item));
      }
      cv_ready.notify_all();
    }
  }

  long load(const std::string& path, PrefetchItem& item) {
    float* raw = nullptr;
    long n = aicp_cloud_read(path.c_str(), &raw, item.viewpoint);
    item.xyz.assign(static_cast<size_t>(capacity) * 3, 0.0f);
    if (n < 0) {
      if (raw) aicp_buffer_free(raw);
      return -2;
    }
    long out_n;
    if (voxel > 0.0f) {
      out_n = aicp_voxel_downsample(raw, n, voxel, item.xyz.data(), capacity);
    } else if (n > capacity) {
      // deterministic stride subsample to the fixed budget
      double stride = static_cast<double>(n) / capacity;
      for (long i = 0; i < capacity; i++) {
        long src = static_cast<long>(i * stride);
        std::memcpy(&item.xyz[3 * i], &raw[3 * src], 3 * sizeof(float));
      }
      out_n = capacity;
    } else {
      std::memcpy(item.xyz.data(), raw, static_cast<size_t>(n) * 3 * sizeof(float));
      out_n = n;
    }
    aicp_buffer_free(raw);
    return out_n;
  }
};

AicpPrefetch* aicp_prefetch_create(const char* const* paths, long n_paths,
                                   int n_threads, int window, long capacity,
                                   float voxel) {
  AicpPrefetch* h = new AicpPrefetch();
  h->paths.reserve(static_cast<size_t>(n_paths));
  for (long i = 0; i < n_paths; i++) h->paths.emplace_back(paths[i]);
  h->capacity = capacity;
  h->voxel = voxel;
  h->window = window < 1 ? 1 : window;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; i++)
    h->workers.emplace_back(&AicpPrefetch::worker, h);
  return h;
}

long aicp_prefetch_next(AicpPrefetch* h, float* out_xyz, double viewpoint[7],
                        long* out_index) {
  std::unique_lock<std::mutex> lk(h->mu);
  if (h->next_deliver >= static_cast<long>(h->paths.size())) return -1;
  long idx = h->next_deliver;
  h->cv_ready.wait(lk, [&] { return h->stop || h->ready.count(idx) > 0; });
  if (h->stop) return -1;
  PrefetchItem item = std::move(h->ready[idx]);
  h->ready.erase(idx);
  h->next_deliver++;
  lk.unlock();
  h->cv_window.notify_all();

  std::memcpy(out_xyz, item.xyz.data(),
              static_cast<size_t>(h->capacity) * 3 * sizeof(float));
  if (viewpoint) std::memcpy(viewpoint, item.viewpoint, sizeof(item.viewpoint));
  if (out_index) *out_index = idx;
  return item.count;
}

void aicp_prefetch_destroy(AicpPrefetch* h) { delete h; }

}  // extern "C"
