// Concurrency stress for the native host runtime, built for
// ThreadSanitizer (SURVEY.md §5.2: "the host feeder — the one truly
// concurrent piece — gets TSAN-tested C++").
//
// Exercises the SPSC packet queue (producer thread pushing, consumer
// thread popping with timeouts, mid-stream close) and the ring buffer's
// single-writer/concurrent-reader contract. Exit 0 + no TSAN reports =
// pass.
//
// Build & run (see tools/native_stress.sh):
//   g++ -O1 -g -fsanitize=thread -std=c++20 \
//       signalizer_tpu/native/stress_test.cpp \
//       signalizer_tpu/native/host_runtime.cpp -o /tmp/sz_stress -lpthread && /tmp/sz_stress

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
struct SzRing;
SzRing* sz_ring_create(int64_t channels, int64_t capacity);
void sz_ring_destroy(SzRing*);
int64_t sz_ring_clock(const SzRing*);
void sz_ring_write(SzRing*, const float*, int64_t);
int sz_ring_latest(const SzRing*, float*, int64_t);
int sz_ring_read_at(const SzRing*, int64_t, float*, int64_t);

struct SzPacketQueue;
SzPacketQueue* sz_pq_create(int64_t channels, int64_t max_samples, int64_t capacity);
void sz_pq_destroy(SzPacketQueue*);
int64_t sz_pq_size(const SzPacketQueue*);
int64_t sz_pq_dropped(const SzPacketQueue*);
int sz_pq_push(SzPacketQueue*, const float*, int64_t, int64_t, int64_t, double, int64_t,
               int64_t, int64_t);
int sz_pq_pop(SzPacketQueue*, float*, int64_t*, double*, int64_t);
void sz_pq_close(SzPacketQueue*);
}

static int failures = 0;

static void check(bool ok, const char* what) {
    if (!ok) {
        std::fprintf(stderr, "FAIL: %s\n", what);
        ++failures;
    }
}

// SPSC queue: one producer, one consumer, FIFO payload integrity.
static void stress_queue() {
    const int64_t kPackets = 20000;
    SzPacketQueue* q = sz_pq_create(2, 64, 128);
    std::atomic<int64_t> consumed{0};

    std::thread consumer([&] {
        std::vector<float> out(2 * 64);
        int64_t meta[6];
        double bpm;
        int64_t last_pos = -1;
        while (true) {
            int rc = sz_pq_pop(q, out.data(), meta, &bpm, 50);
            if (rc == -2) return;           // closed and drained
            if (rc == -1) continue;         // timeout
            // FIFO: positions strictly increase; payload matches position
            check(meta[1] > last_pos, "queue FIFO order");
            last_pos = meta[1];
            const float expect = static_cast<float>(meta[1] % 1000);
            check(out[0] == expect && out[64] == expect + 0.5f,
                  "queue payload integrity");
            consumed.fetch_add(1, std::memory_order_relaxed);
        }
    });

    std::vector<float> block(2 * 32);
    for (int64_t i = 0; i < kPackets; ++i) {
        const float v = static_cast<float>(i % 1000);
        for (int s = 0; s < 32; ++s) {
            block[s] = v;            // ch0
            block[32 + s] = v + 0.5f;  // ch1
        }
        sz_pq_push(q, block.data(), 32, i, i * 32, 120.0, 1, (i + 1) * 32, 0);
        if ((i & 1023) == 0) std::this_thread::yield();
    }
    // drain, then close
    while (sz_pq_size(q) > 0) std::this_thread::yield();
    sz_pq_close(q);
    consumer.join();
    check(consumed.load() + sz_pq_dropped(q) == kPackets, "queue accounting");
    std::printf("queue: consumed %lld dropped %lld\n",
                (long long)consumed.load(), (long long)sz_pq_dropped(q));
    sz_pq_destroy(q);
}

// Ring: single writer advancing the clock, concurrent readers taking
// snapshots. Readers only assert *consistency of what the contract
// promises*: reads at clocks at least `capacity` behind the observed
// clock may fail (scrolled out), successful reads return data.
static void stress_ring() {
    SzRing* r = sz_ring_create(2, 4096);
    std::atomic<bool> stop{false};

    std::thread writer([&] {
        std::vector<float> block(2 * 128);
        for (int i = 0; i < 5000; ++i) {
            const float v = static_cast<float>(i);
            std::fill(block.begin(), block.end(), v);
            sz_ring_write(r, block.data(), 128);
        }
        stop.store(true, std::memory_order_release);
    });

    std::thread reader([&] {
        std::vector<float> out(2 * 256);
        while (!stop.load(std::memory_order_acquire)) {
            const int64_t clock = sz_ring_clock(r);
            if (clock < 256) continue;
            sz_ring_latest(r, out.data(), 256);
            // contract: the window is fresh, or (when the seqlock retry
            // budget exhausts under sustained writing) sheared by at most
            // one ring lap (capacity/128 = 32 blocks)
            const float got = out[255];
            const float lo = static_cast<float>(clock / 128 - 34);
            check(got >= lo - 1.0f, "ring latest freshness");
            sz_ring_read_at(r, clock, out.data(), 256);  // may race-scroll: no assert on value
        }
    });

    writer.join();
    reader.join();
    std::printf("ring: clock %lld\n", (long long)sz_ring_clock(r));
    sz_ring_destroy(r);
}

int main() {
    stress_queue();
    stress_ring();
    if (failures == 0) std::printf("ALL PASS\n");
    return failures == 0 ? 0 : 1;
}
