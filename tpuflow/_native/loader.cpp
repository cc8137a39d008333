// Prefetching RAW frame loader (native runtime component).
//
// The reference's data layer reads frames synchronously on the host thread
// (reference: src/data_types/data2d.cpp:98-178, one fread per frame in
// main). For STREAMING sequences (tpuflow.parallel.multihost
// .process_sequence) that serializes disk I/O + the u8->float32 widen with
// device compute and with Python (the GIL). This loader prefetches an
// ordered list of RAW frames on C++ worker threads into a bounded ring of
// float32 buffers; the consumer pops frames in order. Read semantics match
// the reference containers: u8 widened to float32 without rescale, f32
// verbatim little-endian (data2d.cpp:98-141,143-178), picked per file by
// size like tpuflow.io.raw.read_frame.
//
// C ABI (ctypes-friendly):
//   tf_loader_open(paths, n_paths, width, height, ring, threads) -> handle
//     `paths` is a '\n'-joined UTF-8 string of n_paths file paths.
//   tf_loader_next(handle, out /* width*height floats */) -> 0 ok,
//     -1 bad handle / exhausted, -2 read error (consumed; keeps order).
//   tf_loader_close(handle)
//
// Build: make -C tpuflow/_native  (produces libtpuflow_loader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

enum SlotState : int { kEmpty = 0, kLoading = 1, kReady = 2, kError = 3 };

struct Loader {
  std::vector<std::string> paths;
  size_t width = 0, height = 0;
  size_t ring = 0;

  std::vector<std::vector<float>> slots;   // ring_index -> pixels
  std::vector<int> state;                  // ring_index -> SlotState
  std::vector<size_t> slot_frame;          // ring_index -> frame index
  size_t next_claim = 0;                   // next frame index to start loading
  size_t next_out = 0;                     // next frame index to hand out
  bool stop = false;

  std::mutex m;
  std::condition_variable cv_ready;   // consumer waits
  std::condition_variable cv_space;   // workers wait
  std::vector<std::thread> workers;
};

// Reads one frame; returns false on I/O or size mismatch.
bool ReadFrame(const std::string& path, size_t w, size_t h, float* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const size_t n = w * h;
  bool ok = false;
  if (size == static_cast<long>(n * sizeof(float))) {
    ok = std::fread(out, sizeof(float), n, f) == n;
  } else if (size == static_cast<long>(n)) {
    std::vector<uint8_t> raw(n);
    ok = std::fread(raw.data(), 1, n, f) == n;
    if (ok) {
      for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(raw[i]);
    }
  }
  std::fclose(f);
  return ok;
}

void WorkerLoop(Loader* ld) {
  for (;;) {
    size_t frame;
    size_t slot;
    {
      std::unique_lock<std::mutex> lock(ld->m);
      ld->cv_space.wait(lock, [&] {
        if (ld->stop || ld->next_claim >= ld->paths.size()) return true;
        // The slot for the next frame must be free (consumer has drained
        // the frame that previously lived there).
        return ld->state[ld->next_claim % ld->ring] == kEmpty;
      });
      if (ld->stop || ld->next_claim >= ld->paths.size()) return;
      frame = ld->next_claim++;
      slot = frame % ld->ring;
      ld->state[slot] = kLoading;
      ld->slot_frame[slot] = frame;
    }
    bool ok = ReadFrame(ld->paths[frame], ld->width, ld->height,
                        ld->slots[slot].data());
    {
      std::lock_guard<std::mutex> lock(ld->m);
      ld->state[slot] = ok ? kReady : kError;
    }
    ld->cv_ready.notify_all();
  }
}

// Handles own the Loader through shared_ptr: tf_loader_next copies the
// pointer out of the map under the mutex, so a concurrent tf_loader_close
// (which erases the map entry) cannot free the Loader while next is
// blocked on cv_ready — destruction defers until the last holder drops
// its reference. The Python wrapper documents a single-consumer contract;
// this makes the C ABI itself safe against a misuse that used to be a
// use-after-free (round-2 advisory).
std::mutex g_handles_mutex;
std::map<int64_t, std::shared_ptr<Loader>> g_handles;
int64_t g_next_handle = 1;

}  // namespace

extern "C" {

int64_t tf_loader_open(const char* paths_joined, int64_t n_paths,
                       int64_t width, int64_t height, int64_t ring,
                       int64_t threads) {
  if (n_paths <= 0 || width <= 0 || height <= 0) return 0;
  auto owned = std::make_shared<Loader>();
  Loader* ld = owned.get();
  ld->width = static_cast<size_t>(width);
  ld->height = static_cast<size_t>(height);
  ld->ring = static_cast<size_t>(ring < 2 ? 2 : ring);

  const char* p = paths_joined;
  for (int64_t i = 0; i < n_paths; ++i) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) {
      ld->paths.emplace_back(p);
      break;
    }
    ld->paths.emplace_back(p, nl - p);
    p = nl + 1;
  }
  if (ld->paths.size() != static_cast<size_t>(n_paths)) {
    return 0;  // owned releases the Loader
  }

  ld->slots.assign(ld->ring, std::vector<float>(ld->width * ld->height));
  ld->state.assign(ld->ring, kEmpty);
  ld->slot_frame.assign(ld->ring, 0);
  int64_t n_threads = threads < 1 ? 1 : (threads > 8 ? 8 : threads);
  for (int64_t i = 0; i < n_threads; ++i) {
    ld->workers.emplace_back(WorkerLoop, ld);
  }

  std::lock_guard<std::mutex> lock(g_handles_mutex);
  int64_t h = g_next_handle++;
  g_handles[h] = std::move(owned);
  return h;
}

int tf_loader_next(int64_t handle, float* out) {
  std::shared_ptr<Loader> ld;
  {
    std::lock_guard<std::mutex> lock(g_handles_mutex);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return -1;
    ld = it->second;  // keeps the Loader alive past a concurrent close
  }
  std::unique_lock<std::mutex> lock(ld->m);
  if (ld->stop || ld->next_out >= ld->paths.size()) return -1;
  size_t frame = ld->next_out;
  size_t slot = frame % ld->ring;
  ld->cv_ready.wait(lock, [&] {
    if (ld->stop) return true;  // close() aborts a blocked consumer
    int s = ld->state[slot];
    return (s == kReady || s == kError) && ld->slot_frame[slot] == frame;
  });
  if (ld->stop) return -1;
  int s = ld->state[slot];
  if (s == kReady) {
    std::memcpy(out, ld->slots[slot].data(),
                ld->width * ld->height * sizeof(float));
  }
  ld->state[slot] = kEmpty;
  ld->next_out++;
  lock.unlock();
  ld->cv_space.notify_all();
  return s == kReady ? 0 : -2;
}

void tf_loader_close(int64_t handle) {
  std::shared_ptr<Loader> ld;
  {
    std::lock_guard<std::mutex> lock(g_handles_mutex);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return;
    ld = std::move(it->second);
    g_handles.erase(it);
  }
  {
    std::lock_guard<std::mutex> lock(ld->m);
    ld->stop = true;
  }
  ld->cv_space.notify_all();
  ld->cv_ready.notify_all();  // wake any consumer blocked in next()
  for (auto& t : ld->workers) t.join();
  // ld (and any copy a concurrent next() holds) releases the Loader when
  // the last reference drops.
}

}  // extern "C"
