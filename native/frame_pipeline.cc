// Native frame-ingest pipeline: threaded decode + rectify + prefetch.
//
// The runtime counterpart of the reference's Apps/ loops (simple_camera.cc,
// stereo_groundtruth.cc): there, image decode + cvtColor + remap run inline
// in the tracking loop on the same thread.  Here a pool of worker threads
// decodes ahead into a bounded ring buffer so the accelerator never waits on
// disk or PNG decode; the Python side pops ready float32 grayscale frames
// through a ctypes C API.
//
// Build: see native/CMakeLists.txt (links OpenCV core/imgproc/imgcodecs).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Frame {
  int64_t index;
  std::vector<float> data;  // grayscale, h*w
};

struct Pipeline {
  std::vector<std::string> paths;
  int width = 0, height = 0;
  int capacity = 8;
  bool rectify = false;
  cv::Mat map_x, map_y;

  std::vector<std::thread> workers;
  std::atomic<int64_t> next_job{0};
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::map<int64_t, Frame> ready;  // decoded frames by index
  int64_t next_emit = 0;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      if (stop.load()) return;
      int64_t job = next_job.fetch_add(1);
      if (job >= static_cast<int64_t>(paths.size())) return;
      cv::Mat img = cv::imread(paths[job], cv::IMREAD_GRAYSCALE);
      Frame f;
      f.index = job;
      f.data.assign(static_cast<size_t>(width) * height, 0.0f);
      if (!img.empty()) {
        cv::Mat g32;
        img.convertTo(g32, CV_32F);
        if (rectify) cv::remap(g32, g32, map_x, map_y, cv::INTER_LINEAR);
        if (g32.rows != height || g32.cols != width)
          cv::resize(g32, g32, cv::Size(width, height));
        std::memcpy(f.data.data(), g32.ptr<float>(),
                    f.data.size() * sizeof(float));
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() ||
               static_cast<int>(ready.size()) < capacity ||
               f.index < next_emit + capacity;
      });
      if (stop.load()) return;
      ready.emplace(f.index, std::move(f));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* fp_create(const char** paths, int n_paths, int width, int height,
                int n_threads, int capacity) {
  auto* p = new Pipeline();
  p->paths.assign(paths, paths + n_paths);
  p->width = width;
  p->height = height;
  p->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Optional rectification maps (row-major float32 h*w each), applied on the
// worker threads (the reference rectifies on the tracking thread,
// stereo_groundtruth.cc:56-94).
void fp_set_rectify(void* handle, const float* mx, const float* my) {
  auto* p = static_cast<Pipeline*>(handle);
  p->map_x = cv::Mat(p->height, p->width, CV_32F);
  p->map_y = cv::Mat(p->height, p->width, CV_32F);
  std::memcpy(p->map_x.ptr<float>(), mx,
              sizeof(float) * p->width * p->height);
  std::memcpy(p->map_y.ptr<float>(), my,
              sizeof(float) * p->width * p->height);
  p->rectify = true;
}

// Pop the next frame in order into `out` (h*w float32).
// Returns the frame index, or -1 when the sequence is exhausted.
int64_t fp_next(void* handle, float* out) {
  auto* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_emit >= static_cast<int64_t>(p->paths.size())) return -1;
  p->cv_ready.wait(lk, [&] {
    return p->stop.load() || p->ready.count(p->next_emit) > 0;
  });
  if (p->stop.load()) return -1;
  auto it = p->ready.find(p->next_emit);
  std::memcpy(out, it->second.data.data(),
              it->second.data.size() * sizeof(float));
  int64_t idx = it->first;
  p->ready.erase(it);
  p->next_emit++;
  p->cv_space.notify_all();
  return idx;
}

void fp_destroy(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  p->stop.store(true);
  p->cv_ready.notify_all();
  p->cv_space.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

// ---------------------------------------------------------------------------
// Host bookkeeping kernels (the SchwarpDatabase/covisibility index work the
// reference does with std::map loops, SchwarpDatabase.cc:50-128).
// ---------------------------------------------------------------------------

// Shared map points between two keyframes' kp->point tables.
// point_id_a/b: int32[K], -1 where no point.  Outputs (capped at max_out):
// kp_a[i], kp_b[i], pid[i].  Returns the count.
int covis_shared(const int32_t* point_id_a, const int32_t* point_id_b, int k,
                 int32_t* kp_a, int32_t* kp_b, int32_t* pid, int max_out) {
  // invert table b: point -> kp (points are dense small ints)
  int32_t max_pid = -1;
  for (int i = 0; i < k; ++i)
    if (point_id_b[i] > max_pid) max_pid = point_id_b[i];
  std::vector<int32_t> where_b(static_cast<size_t>(max_pid + 1), -1);
  for (int i = 0; i < k; ++i)
    if (point_id_b[i] >= 0) where_b[point_id_b[i]] = i;
  int n = 0;
  for (int i = 0; i < k && n < max_out; ++i) {
    int32_t p = point_id_a[i];
    if (p < 0 || p > max_pid) continue;
    int32_t j = where_b[p];
    if (j < 0) continue;
    kp_a[n] = i;
    kp_b[n] = j;
    pid[n] = p;
    ++n;
  }
  return n;
}

// Scatter per-pair warp observations into per-point observation tables.
// For pair pi and slot j with mask[pi*cap+j], append observation to point
// pid[pi*cap+j] (tables have obs_cap rows of the given payload widths).
void accumulate_obs(int n_pairs, int cap, int obs_cap,
                    const int32_t* pid,        // [n_pairs*cap]
                    const uint8_t* mask,       // [n_pairs*cap]
                    const float* uv1,          // [n_pairs*cap*2]
                    const float* warped,       // [n_pairs*cap*2]
                    const float* J12,          // [n_pairs*cap*4]
                    const float* Huu,          // [n_pairs*cap*2]
                    const float* Hvv,          // [n_pairs*cap*2]
                    int n_points,
                    int32_t* counts,           // [n_points] (init 0)
                    float* out_uv1,            // [n_points*obs_cap*2]
                    float* out_uv2,            // [n_points*obs_cap*2]
                    float* out_J,              // [n_points*obs_cap*4]
                    float* out_Huu,            // [n_points*obs_cap*2]
                    float* out_Hvv,            // [n_points*obs_cap*2]
                    uint8_t* out_mask) {       // [n_points*obs_cap]
  for (int pi = 0; pi < n_pairs; ++pi) {
    for (int j = 0; j < cap; ++j) {
      int idx = pi * cap + j;
      if (!mask[idx]) continue;
      int32_t p = pid[idx];
      if (p < 0 || p >= n_points) continue;
      int32_t o = counts[p];
      if (o >= obs_cap) continue;
      int dst = p * obs_cap + o;
      std::memcpy(out_uv1 + dst * 2, uv1 + idx * 2, 2 * sizeof(float));
      std::memcpy(out_uv2 + dst * 2, warped + idx * 2, 2 * sizeof(float));
      std::memcpy(out_J + dst * 4, J12 + idx * 4, 4 * sizeof(float));
      std::memcpy(out_Huu + dst * 2, Huu + idx * 2, 2 * sizeof(float));
      std::memcpy(out_Hvv + dst * 2, Hvv + idx * 2, 2 * sizeof(float));
      out_mask[dst] = 1;
      counts[p] = o + 1;
    }
  }
}

}  // extern "C"
