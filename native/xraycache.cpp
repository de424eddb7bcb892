// xraycache — native data-loader runtime for superdiff_tpu.
//
// Role: the compiled equivalent of the reference's DataLoader path (which
// is pure-Python, synchronous, num_workers=0 — SURVEY.md §5.2). Training
// first materializes decoded/preprocessed uint8 images into one contiguous
// shard file (written by superdiff_tpu/data/native_loader.py); this library
// then serves shuffled batches from an mmap of that shard with a background
// prefetch thread, so batch assembly (shuffle + gather + memcpy) never
// blocks the Python/JAX step loop and never touches the GIL.
//
// Shard format (little-endian):
//   magic  "XRC1"            4 bytes
//   int32  n, h, w, c        image count and dims
//   uint8  images[n*h*w*c]
//   int32  labels[n]
//
// C API (ctypes-friendly):
//   void*  xc_open(const char* path)
//   int    xc_info(void* h, int32_t out[4])          // n,h,w,c
//   int    xc_start_epoch(void* h, uint64_t seed, int batch, int drop_last,
//                          int shard_id, int shard_count)
//       shard_id/shard_count: multi-host data parallelism — the epoch's
//       seeded GLOBAL permutation (identical on every process for a given
//       seed) is truncated to a multiple of shard_count and this process
//       keeps the strided [shard_id::shard_count] slice: disjoint,
//       exhaustive, same batch count everywhere (lockstep). (0, 1) = whole
//       dataset.
//   int    xc_next_batch(void* h, uint8_t* imgs, int32_t* labels)
//       -> number of examples in the batch, 0 at epoch end, -1 on error
//   void   xc_close(void* h)
//
// Build: make -C native   (produces libxraycache.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kRingSlots = 4;

struct Slot {
  std::vector<uint8_t> images;
  std::vector<int32_t> labels;
  int count = 0;       // examples filled
  bool ready = false;  // produced, not yet consumed
};

struct Cache {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  int32_t n = 0, h = 0, w = 0, c = 0;
  const uint8_t* images = nullptr;
  const int32_t* labels = nullptr;

  // epoch state
  int batch = 0;
  std::vector<int32_t> order;
  size_t cursor = 0;  // next example index into `order` (producer side)
  bool drop_last = true;

  // ring
  Slot slots[kRingSlots];
  int produce_idx = 0;
  int consume_idx = 0;
  std::mutex mu;
  std::condition_variable cv_produced;
  std::condition_variable cv_consumed;
  std::thread worker;
  std::atomic<bool> stop{false};
  bool epoch_done_producing = false;
};

// xorshift64* — deterministic shuffle independent of libc rand.
inline uint64_t next_rand(uint64_t& s) {
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  return s * 0x2545F4914F6CDD1DULL;
}

void producer_loop(Cache* cc) {
  const size_t img_bytes = size_t(cc->h) * cc->w * cc->c;
  while (true) {
    std::unique_lock<std::mutex> lk(cc->mu);
    Slot& slot = cc->slots[cc->produce_idx];
    cc->cv_consumed.wait(lk, [&] { return cc->stop || !slot.ready; });
    if (cc->stop) return;
    if (cc->cursor >= cc->order.size() ||
        (cc->drop_last && cc->order.size() - cc->cursor < size_t(cc->batch))) {
      cc->epoch_done_producing = true;
      slot.count = 0;
      slot.ready = true;
      cc->cv_produced.notify_all();
      return;  // epoch finished; thread exits
    }
    size_t take = std::min(size_t(cc->batch), cc->order.size() - cc->cursor);
    size_t start = cc->cursor;
    cc->cursor += take;
    lk.unlock();

    // gather outside the lock — this is the actual work
    for (size_t i = 0; i < take; ++i) {
      int32_t idx = cc->order[start + i];
      std::memcpy(slot.images.data() + i * img_bytes,
                  cc->images + size_t(idx) * img_bytes, img_bytes);
      slot.labels[i] = cc->labels[idx];
    }

    lk.lock();
    slot.count = int(take);
    slot.ready = true;
    cc->produce_idx = (cc->produce_idx + 1) % kRingSlots;
    cc->cv_produced.notify_all();
  }
}

void join_worker(Cache* cc) {
  if (cc->worker.joinable()) {
    {
      std::lock_guard<std::mutex> lk(cc->mu);
      cc->stop = true;
    }
    cc->cv_consumed.notify_all();
    cc->worker.join();
    cc->stop = false;
  }
}

}  // namespace

extern "C" {

void* xc_open(const char* path) {
  Cache* cc = new Cache();
  cc->fd = ::open(path, O_RDONLY);
  if (cc->fd < 0) {
    delete cc;
    return nullptr;
  }
  struct stat st;
  if (fstat(cc->fd, &st) != 0 || size_t(st.st_size) < 20) {
    ::close(cc->fd);
    delete cc;
    return nullptr;
  }
  cc->map_size = size_t(st.st_size);
  void* m = mmap(nullptr, cc->map_size, PROT_READ, MAP_PRIVATE, cc->fd, 0);
  if (m == MAP_FAILED) {
    ::close(cc->fd);
    delete cc;
    return nullptr;
  }
  cc->map = static_cast<const uint8_t*>(m);
  if (std::memcmp(cc->map, "XRC1", 4) != 0) {
    munmap(m, cc->map_size);
    ::close(cc->fd);
    delete cc;
    return nullptr;
  }
  const int32_t* hdr = reinterpret_cast<const int32_t*>(cc->map + 4);
  cc->n = hdr[0];
  cc->h = hdr[1];
  cc->w = hdr[2];
  cc->c = hdr[3];
  size_t img_total = size_t(cc->n) * cc->h * cc->w * cc->c;
  size_t expect = 20 + img_total + size_t(cc->n) * 4;
  if (cc->n <= 0 || cc->map_size < expect) {
    munmap(m, cc->map_size);
    ::close(cc->fd);
    delete cc;
    return nullptr;
  }
  cc->images = cc->map + 20;
  cc->labels = reinterpret_cast<const int32_t*>(cc->map + 20 + img_total);
  madvise(const_cast<uint8_t*>(cc->map), cc->map_size, MADV_WILLNEED);
  return cc;
}

int xc_info(void* h, int32_t out[4]) {
  if (!h) return -1;
  Cache* cc = static_cast<Cache*>(h);
  out[0] = cc->n;
  out[1] = cc->h;
  out[2] = cc->w;
  out[3] = cc->c;
  return 0;
}

int xc_start_epoch(void* h, uint64_t seed, int batch, int drop_last,
                   int shard_id, int shard_count) {
  if (!h || batch <= 0) return -1;
  if (shard_count < 1 || shard_id < 0 || shard_id >= shard_count) return -1;
  Cache* cc = static_cast<Cache*>(h);
  join_worker(cc);

  cc->batch = batch;
  cc->drop_last = drop_last != 0;
  cc->cursor = 0;
  cc->epoch_done_producing = false;
  cc->produce_idx = cc->consume_idx = 0;

  cc->order.resize(cc->n);
  for (int32_t i = 0; i < cc->n; ++i) cc->order[i] = i;
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
  for (int32_t i = cc->n - 1; i > 0; --i) {
    uint64_t r = next_rand(s) % uint64_t(i + 1);
    std::swap(cc->order[i], cc->order[r]);
  }
  if (shard_count > 1) {
    // identical global permutation on every process (same seed), strided
    // disjoint slice per process, truncated for lockstep batch counts
    int32_t usable = cc->n - cc->n % shard_count;
    std::vector<int32_t> mine;
    mine.reserve(usable / shard_count);
    for (int32_t i = shard_id; i < usable; i += shard_count)
      mine.push_back(cc->order[i]);
    cc->order = std::move(mine);
  }

  size_t img_bytes = size_t(cc->h) * cc->w * cc->c;
  for (auto& slot : cc->slots) {
    slot.images.resize(size_t(batch) * img_bytes);
    slot.labels.resize(batch);
    slot.count = 0;
    slot.ready = false;
  }
  cc->worker = std::thread(producer_loop, cc);
  return 0;
}

int xc_next_batch(void* h, uint8_t* imgs, int32_t* labels) {
  if (!h) return -1;
  Cache* cc = static_cast<Cache*>(h);
  std::unique_lock<std::mutex> lk(cc->mu);
  Slot& slot = cc->slots[cc->consume_idx];
  cc->cv_produced.wait(lk, [&] { return slot.ready; });
  int count = slot.count;
  if (count > 0) {
    size_t img_bytes = size_t(cc->h) * cc->w * cc->c;
    std::memcpy(imgs, slot.images.data(), size_t(count) * img_bytes);
    std::memcpy(labels, slot.labels.data(), size_t(count) * 4);
    slot.ready = false;
    cc->consume_idx = (cc->consume_idx + 1) % kRingSlots;
    cc->cv_consumed.notify_all();
  }
  return count;
}

void xc_close(void* h) {
  if (!h) return;
  Cache* cc = static_cast<Cache*>(h);
  join_worker(cc);
  if (cc->map) munmap(const_cast<uint8_t*>(cc->map), cc->map_size);
  if (cc->fd >= 0) ::close(cc->fd);
  delete cc;
}

}  // extern "C"
