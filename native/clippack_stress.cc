// Concurrency stress / ThreadSanitizer driver for the threaded clippack
// loader — the repo's only hand-written threading, i.e. the one place a
// data race can exist (survey §5.2: the reference is single-threaded
// everywhere and has "nothing to replicate"; the TPU build's native
// loader reintroduces threads, so it gets a race detector).
//
// Build (done by tests/test_native_tsan.py):
//   g++ -std=c++17 -O1 -g -fsanitize=thread \
//       native/clippack.cc native/clippack_stress.cc -o stress -pthread
//
// Exercises, under TSAN:
//   1. high contention: 8 producers racing over a 2-slot ring, checksum
//      compared against a single-producer run (determinism under
//      contention, not just absence-of-crash);
//   2. two shard loaders sharing ONE mmap reader, consumed from two
//      OS threads concurrently (the multi-host input-sharding pattern);
//   3. mid-epoch destroy with producers in flight (the stop path).
//
// Exit 0 and an empty TSAN report = pass.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

extern "C" {
void* clippack_open(const char* path);
int clippack_info(void* reader, int64_t* out);
void clippack_close(void* reader);
void* loader_create(void* reader, int batch, int shuffle, uint64_t seed,
                    int nthreads, int ring_slots, int shard_id,
                    int num_shards);
int64_t loader_next(void* loader, uint8_t* out);
void loader_destroy(void* loader);
}

static uint64_t consume(void* reader, int batch, int nthreads, int ring,
                        int shard_id, int num_shards, int epochs,
                        const int64_t* info) {
  void* l = loader_create(reader, batch, /*shuffle=*/1, /*seed=*/42,
                          nthreads, ring, shard_id, num_shards);
  if (!l) {
    std::fprintf(stderr, "loader_create failed\n");
    std::exit(2);
  }
  const size_t bytes =
      static_cast<size_t>(batch) * info[1] * info[2] * info[3] * info[4];
  std::vector<uint8_t> buf(bytes);
  const int64_t per_epoch = info[0] / (static_cast<int64_t>(batch) * num_shards);
  uint64_t sum = 0;
  for (int e = 0; e < epochs; ++e) {
    for (int64_t b = 0; b < per_epoch; ++b) {
      if (loader_next(l, buf.data()) < 0) std::exit(3);
      for (size_t i = 0; i < bytes; i += 97) sum += buf[i];
    }
  }
  loader_destroy(l);
  return sum;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <pack> [epochs]\n", argv[0]);
    return 1;
  }
  const int epochs = argc > 2 ? std::atoi(argv[2]) : 3;
  void* r = clippack_open(argv[1]);
  if (!r) {
    std::fprintf(stderr, "open failed\n");
    return 1;
  }
  int64_t info[5];
  clippack_info(r, info);

  // 1. Contended vs single-producer: identical checksum required.
  const uint64_t hot = consume(r, 3, 8, 2, 0, 1, epochs, info);
  const uint64_t ref = consume(r, 3, 1, 2, 0, 1, epochs, info);
  if (hot != ref) {
    std::fprintf(stderr, "checksum mismatch under contention\n");
    return 4;
  }

  // 2. Sharded loaders over one shared reader, concurrent consumers.
  uint64_t s0 = 0, s1 = 0;
  std::thread t0([&] { s0 = consume(r, 2, 4, 3, 0, 2, epochs, info); });
  std::thread t1([&] { s1 = consume(r, 2, 4, 3, 1, 2, epochs, info); });
  t0.join();
  t1.join();

  // 3. Mid-epoch destroy with producers in flight.
  {
    void* l = loader_create(r, 3, 1, 7, 8, 2, 0, 1);
    std::vector<uint8_t> buf(
        static_cast<size_t>(3) * info[1] * info[2] * info[3] * info[4]);
    loader_next(l, buf.data());
    loader_destroy(l);
  }

  clippack_close(r);
  std::printf("stress OK hot=%llu shard0=%llu shard1=%llu\n",
              static_cast<unsigned long long>(hot),
              static_cast<unsigned long long>(s0),
              static_cast<unsigned long long>(s1));
  return 0;
}
