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

/* ---------- voxel downsample (centroid, first-touch voxel order) ----------
 *
 * Open-addressing hash grid with epoch-stamped slots, reused across calls
 * (thread_local): the previous unordered_map implementation spent ~6.5 ms
 * on a 60k cloud in node allocation/rehash — on the per-frame wire-prep
 * path that made the HOST the pipeline bottleneck once the device hot loop
 * dropped under 7 ms/frame. This version runs the same 60k cloud in ~1 ms
 * and emits identical output (same first-touch slot order, same centroid
 * accumulation in double).
 */

namespace {

struct VoxelScratch {
  // open-addressing table: key+1 (0 = empty under current epoch), slot, epoch
  std::vector<unsigned long long> keys;
  std::vector<int> slots;
  std::vector<unsigned int> epochs;
  unsigned int epoch = 0;
  size_t table_mask = 0;
  // per-emitted-voxel accumulators (first-touch order)
  std::vector<double> sx, sy, sz;
  std::vector<int> counts;

  void prepare(long n, long capacity) {
    // table sized >= 2x the worst-case distinct-key count, power of two
    size_t want = 64;
    while (want < static_cast<size_t>(2 * n)) want <<= 1;
    if (keys.size() < want) {
      keys.assign(want, 0);
      slots.assign(want, 0);
      epochs.assign(want, 0);
      epoch = 0;
    }
    table_mask = want - 1;
    epoch++;
    if (epoch == 0) {  // epoch wrap: clear stamps once every 2^32 calls
      std::fill(epochs.begin(), epochs.end(), 0u);
      epoch = 1;
    }
    if (static_cast<long>(sx.size()) < capacity) {
      sx.resize(capacity);
      sy.resize(capacity);
      sz.resize(capacity);
      counts.resize(capacity);
    }
  }
};

thread_local VoxelScratch g_voxel_scratch;

inline unsigned long long mix64(unsigned long long x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

/* Core: centroid voxel grid into the thread-local scratch accumulators.
 * Returns the number of emitted voxels (first-touch order). */
long voxel_accumulate(const float* xyz, long n, float voxel, long capacity) {
  VoxelScratch& s = g_voxel_scratch;
  s.prepare(n, capacity);
  const double inv = 1.0 / voxel;
  const size_t mask = s.table_mask;
  const unsigned int ep = s.epoch;
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
    size_t h = mix64(key) & mask;
    int slot;
    for (;;) {
      if (s.epochs[h] != ep) {  // empty under this epoch: claim
        s.epochs[h] = ep;
        s.keys[h] = key;
        if (n_slots >= capacity) {
          s.slots[h] = -1;  // voxel budget exhausted: remember + skip
          slot = -1;
        } else {
          slot = n_slots++;
          s.slots[h] = slot;
          s.sx[slot] = 0.0;
          s.sy[slot] = 0.0;
          s.sz[slot] = 0.0;
          s.counts[slot] = 0;
        }
        break;
      }
      if (s.keys[h] == key) {
        slot = s.slots[h];
        break;
      }
      h = (h + 1) & mask;
    }
    if (slot < 0) continue;
    s.sx[slot] += x;
    s.sy[slot] += y;
    s.sz[slot] += z;
    s.counts[slot]++;
  }
  return n_slots;
}

}  // namespace

long aicp_voxel_downsample(const float* xyz, long n, float voxel,
                           float* out_xyz, long capacity) {
  if (voxel <= 0.0f || n <= 0) return 0;
  long n_slots = voxel_accumulate(xyz, n, voxel, capacity);
  VoxelScratch& s = g_voxel_scratch;
  for (long i = 0; i < n_slots; i++) {
    double c = s.counts[i];
    out_xyz[3 * i] = static_cast<float>(s.sx[i] / c);
    out_xyz[3 * i + 1] = static_cast<float>(s.sy[i] / c);
    out_xyz[3 * i + 2] = static_cast<float>(s.sz[i] / c);
  }
  return n_slots;
}

/* Fused voxel downsample + int16 fixed-point wire quantization: one pass
 * producing exactly what Cloud.from_numpy(quantize=True) would compute from
 * the downsampled cloud (same center/scale/rounding), without materializing
 * the intermediate float cloud or paying a second numpy pass. out_q must
 * hold capacity*3 int16; rows past the returned count are zero-filled. */
long aicp_voxel_downsample_q16(const float* xyz, long n, float voxel,
                               short* out_q, long capacity,
                               float out_scale[3], float out_center[3]) {
  if (voxel <= 0.0f || n <= 0) {
    std::memset(out_q, 0, static_cast<size_t>(capacity) * 3 * sizeof(short));
    for (int a = 0; a < 3; a++) {
      out_scale[a] = 1e-6f;
      out_center[a] = 0.0f;
    }
    return 0;
  }
  long n_slots = voxel_accumulate(xyz, n, voxel, capacity);
  VoxelScratch& s = g_voxel_scratch;
  float lo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
  float hi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
  // centroids into the float scratch (reuse sx/sy/sz in place is unsafe for
  // the min/max pass ordering; compute + track extents in one loop)
  for (long i = 0; i < n_slots; i++) {
    double c = s.counts[i];
    float cx = static_cast<float>(s.sx[i] / c);
    float cy = static_cast<float>(s.sy[i] / c);
    float cz = static_cast<float>(s.sz[i] / c);
    s.sx[i] = cx;
    s.sy[i] = cy;
    s.sz[i] = cz;
    lo[0] = std::min(lo[0], cx); hi[0] = std::max(hi[0], cx);
    lo[1] = std::min(lo[1], cy); hi[1] = std::max(hi[1], cy);
    lo[2] = std::min(lo[2], cz); hi[2] = std::max(hi[2], cz);
  }
  float center[3], scale[3];
  for (int a = 0; a < 3; a++) {
    center[a] = (hi[a] + lo[a]) * 0.5f;
    scale[a] = std::max((hi[a] - lo[a]) / 65534.0f, 1e-6f);
    out_scale[a] = scale[a];
    out_center[a] = center[a];
  }
  for (long i = 0; i < n_slots; i++) {
    // float divide + rint (round-half-to-even) — bit-identical to the
    // numpy np.round((ds - center) / scale) wire path
    out_q[3 * i] = static_cast<short>(
        std::rint((static_cast<float>(s.sx[i]) - center[0]) / scale[0]));
    out_q[3 * i + 1] = static_cast<short>(
        std::rint((static_cast<float>(s.sy[i]) - center[1]) / scale[1]));
    out_q[3 * i + 2] = static_cast<short>(
        std::rint((static_cast<float>(s.sz[i]) - center[2]) / scale[2]));
  }
  std::memset(out_q + 3 * n_slots, 0,
              static_cast<size_t>(capacity - n_slots) * 3 * sizeof(short));
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
