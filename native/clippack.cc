// clippack: packed video-clip storage + multithreaded prefetching loader.
//
// TPU input pipelines are host-bound: the accelerator finishes a step in
// milliseconds and the host must have the next uint8 batch ready. The
// reference decodes/resizes every frame per item in Python/PIL on the
// main thread (reference Dataloader.py:17-23, recovered dataset.py
// L27-30) — fine for one GPU, a stall machine for a TPU. This runtime
// stores pre-decoded fixed-shape uint8 clips in one mmap'd file and
// assembles shuffled batches on C++ worker threads into a ring of
// buffers, so page-in + memcpy overlap device compute and never touch
// the GIL.
//
// File layout (little-endian, 8 x int64 header = 64-byte data offset):
//   magic 'CLPK' | version 1 | n_clips | frames | height | width |
//   channels | reserved
//   data: n_clips * frames * height * width * channels uint8, C-order.
//
// C ABI (used from Python via ctypes):
//   clippack_open/info/close       — mmap reader
//   clippack_read                  — copy one clip out (random access)
//   loader_create/next/destroy     — shuffled, threaded batch loader
//
// Shuffle is deterministic: epoch e uses std::mt19937_64(seed + e), so a
// run is reproducible regardless of thread scheduling (batch b of epoch e
// always holds the same clips; only production *timing* varies).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <numeric>
#include <random>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kMagic = 0x4B504C43;  // 'CLPK'
constexpr int64_t kVersion = 1;
constexpr size_t kHeaderBytes = 8 * sizeof(int64_t);

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;  // whole file
  size_t file_size = 0;
  int64_t n = 0, t = 0, h = 0, w = 0, c = 0;

  size_t clip_bytes() const { return static_cast<size_t>(t) * h * w * c; }
  const uint8_t* clip(int64_t i) const {
    return base + kHeaderBytes + static_cast<size_t>(i) * clip_bytes();
  }
};

struct Loader {
  Reader* reader = nullptr;
  int batch = 0;        // clips this loader assembles per global batch
  int global_batch = 0; // clips per global batch across all shards
  int shard_id = 0;     // this host's slice of each global batch
  bool shuffle = true;
  uint64_t seed = 0;
  int64_t batches_per_epoch = 0;

  // Ring of batch slots (bounded read-ahead).
  std::vector<std::vector<uint8_t>> slots;
  std::vector<int64_t> slot_state;  // -1 free, -2 in flight, else batch idx
  int64_t next_produce = 0;         // next global batch index to assemble
  int64_t next_consume = 0;         // next global batch index to hand out
  bool stop = false;

  // Per-epoch permutation (generated lazily under the mutex).
  int64_t perm_epoch = -1;
  std::vector<int64_t> perm;

  std::mutex mu;
  std::condition_variable cv_produced;  // consumer waits on this
  std::condition_variable cv_freed;     // producers wait on this
  std::vector<std::thread> workers;

  void ensure_perm(int64_t epoch) {  // call with mu held
    if (perm_epoch == epoch) return;
    perm.resize(reader->n);
    std::iota(perm.begin(), perm.end(), 0);
    if (shuffle) {
      std::mt19937_64 rng(seed + static_cast<uint64_t>(epoch));
      for (int64_t i = reader->n - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> d(0, i);
        std::swap(perm[i], perm[d(rng)]);
      }
    }
    perm_epoch = epoch;
  }

  void worker() {
    const size_t cb = reader->clip_bytes();
    const int64_t ring = static_cast<int64_t>(slots.size());
    while (true) {
      int64_t b;
      int slot;
      std::vector<int64_t> clips(batch);
      {
        std::unique_lock<std::mutex> lk(mu);
        // Claim the next batch whose ring slot is free.
        cv_freed.wait(lk, [&] {
          return stop || slot_state[next_produce % ring] == -1;
        });
        if (stop) return;
        b = next_produce++;
        slot = static_cast<int>(b % ring);
        slot_state[slot] = -2;
        // Epochs must be produced in order for perm caching; the ring
        // bound guarantees producers stay within one epoch of each other
        // only if ring <= batches_per_epoch; cache regeneration is cheap
        // either way because production order is monotone in b.
        int64_t epoch = b / batches_per_epoch;
        // Global batch b holds perm[b*GB : (b+1)*GB]; this shard takes
        // its contiguous slice — every host shares the permutation, so
        // the concatenation of all shards IS the single-host batch.
        int64_t off = (b % batches_per_epoch) * global_batch +
                      static_cast<int64_t>(shard_id) * batch;
        ensure_perm(epoch);
        for (int i = 0; i < batch; ++i) clips[i] = perm[off + i];
      }
      uint8_t* dst = slots[slot].data();
      for (int i = 0; i < batch; ++i)
        std::memcpy(dst + static_cast<size_t>(i) * cb,
                    reader->clip(clips[i]), cb);
      {
        std::lock_guard<std::mutex> lk(mu);
        slot_state[slot] = b;
      }
      cv_produced.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* clippack_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < kHeaderBytes) {
    ::close(fd);
    return nullptr;
  }
  void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (m == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader;
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(m);
  r->file_size = st.st_size;
  const int64_t* hdr = reinterpret_cast<const int64_t*>(r->base);
  r->n = hdr[2];
  r->t = hdr[3];
  r->h = hdr[4];
  r->w = hdr[5];
  r->c = hdr[6];
  // Overflow-checked size validation: a corrupt/malicious header with
  // huge dims could wrap n*t*h*w*c past 2^64, spuriously pass a naive
  // size check, and turn every clip() into an out-of-bounds mmap read.
  auto mul_ok = [](size_t a, size_t b, size_t* out) {
    if (a != 0 && b > SIZE_MAX / a) return false;
    *out = a * b;
    return true;
  };
  size_t cb = 1, total = 0;
  bool ok = hdr[0] == kMagic && hdr[1] == kVersion && r->n > 0 &&
            r->t > 0 && r->h > 0 && r->w > 0 && r->c > 0 &&
            mul_ok(static_cast<size_t>(r->t), static_cast<size_t>(r->h), &cb) &&
            mul_ok(cb, static_cast<size_t>(r->w), &cb) &&
            mul_ok(cb, static_cast<size_t>(r->c), &cb) &&
            mul_ok(cb, static_cast<size_t>(r->n), &total) &&
            r->file_size >= kHeaderBytes && total <= r->file_size - kHeaderBytes;
  if (!ok) {
    munmap(m, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  // Hint the kernel we'll stream through the data.
  madvise(m, st.st_size, MADV_WILLNEED);
  return r;
}

// out[5] = {n_clips, frames, height, width, channels}
int clippack_info(void* reader, int64_t* out) {
  auto* r = static_cast<Reader*>(reader);
  if (!r || !out) return -1;
  out[0] = r->n;
  out[1] = r->t;
  out[2] = r->h;
  out[3] = r->w;
  out[4] = r->c;
  return 0;
}

int clippack_read(void* reader, int64_t clip_index, uint8_t* out) {
  auto* r = static_cast<Reader*>(reader);
  if (!r || clip_index < 0 || clip_index >= r->n) return -1;
  std::memcpy(out, r->clip(clip_index), r->clip_bytes());
  return 0;
}

void clippack_close(void* reader) {
  auto* r = static_cast<Reader*>(reader);
  if (!r) return;
  munmap(const_cast<uint8_t*>(r->base), r->file_size);
  ::close(r->fd);
  delete r;
}

// shard_id/num_shards: multi-host input sharding. Each host creates a
// loader with its shard_id; all hosts share (seed, global batch), so host
// slices concatenate to exactly the single-host batch. num_shards <= 0
// means unsharded (1 shard).
void* loader_create(void* reader, int batch, int shuffle, uint64_t seed,
                    int nthreads, int ring_slots, int shard_id,
                    int num_shards) {
  auto* r = static_cast<Reader*>(reader);
  if (num_shards <= 0) num_shards = 1;
  if (!r || batch <= 0 || shard_id < 0 || shard_id >= num_shards) return nullptr;
  int64_t global_batch = static_cast<int64_t>(batch) * num_shards;
  if (global_batch > r->n) return nullptr;
  auto* l = new Loader;
  l->reader = r;
  l->batch = batch;
  l->global_batch = static_cast<int>(global_batch);
  l->shard_id = shard_id;
  l->shuffle = shuffle != 0;
  l->seed = seed;
  l->batches_per_epoch = r->n / global_batch;  // drop-last
  if (nthreads <= 0) nthreads = 2;
  if (ring_slots <= 0) ring_slots = 2 * nthreads;
  l->slots.assign(ring_slots,
                  std::vector<uint8_t>(static_cast<size_t>(batch) *
                                       r->clip_bytes()));
  l->slot_state.assign(ring_slots, -1);
  for (int i = 0; i < nthreads; ++i)
    l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Blocks until the next batch (global order) is ready, copies it into
// `out` (batch * clip_bytes uint8), frees the slot. Returns the 0-based
// index of the batch within its epoch.
int64_t loader_next(void* loader, uint8_t* out) {
  auto* l = static_cast<Loader*>(loader);
  if (!l || !out) return -1;
  const int64_t ring = static_cast<int64_t>(l->slots.size());
  int64_t b;
  int slot;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    b = l->next_consume;
    slot = static_cast<int>(b % ring);
    l->cv_produced.wait(lk, [&] { return l->slot_state[slot] == b; });
    l->next_consume = b + 1;
  }
  std::memcpy(out, l->slots[slot].data(), l->slots[slot].size());
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->slot_state[slot] = -1;
  }
  l->cv_freed.notify_all();
  return b % l->batches_per_epoch;
}

void loader_destroy(void* loader) {
  auto* l = static_cast<Loader*>(loader);
  if (!l) return;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_freed.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
