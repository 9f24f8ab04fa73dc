// Persistent worker pool + multi-threaded CompressMulti for the C ABI
// and the Python parallel backend.
//
// Reference analogs: WorkerPool (src/enc/worker_pool.rs:75-300,
// Mutex+Condvar work queue reused across calls, MAX_THREADS=16 in
// fixed_queue.rs:1), CompressMulti (src/enc/threading/mod.rs:413:
// shard i>0 compresses catable with the whole preceding prefix as LZ77
// dictionary), and the multicompress FFI surface
// (src/ffi/multicompress/mod.rs:93, 240, 312).
//
// Merge strategy: every shard is emitted byte-aligned (shard 0
// appendable+byte_align+bare-trailer, shards i>0 catable+bare), so the
// lossless merge is plain concatenation plus the terminal empty-last
// byte 0x03 — the reference documents this exact no-tool concatenation
// form (README "Stream Concatenation"); its BroCatli bit-shift merge
// is only required when shards are NOT byte-aligned.

#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

extern "C" int BrotliTpuEncodeOneshot(
    int quality, int lgwin, int mode, int catable, int appendable,
    int bare, int byte_align, const uint8_t* dict, size_t dict_size,
    size_t input_size, const uint8_t* input, size_t* encoded_size,
    uint8_t* encoded_buffer);

namespace wp {

constexpr int kMaxThreads = 16;

struct WorkPool {
    std::vector<std::thread> workers;
    std::vector<std::function<void()>> jobs;
    std::mutex mu;
    std::condition_variable cv_job, cv_done;
    int64_t pending = 0;
    bool shutdown = false;

    explicit WorkPool(int n) {
        n = std::max(0, std::min(n, kMaxThreads));
        for (int i = 0; i < n; i++)
            workers.emplace_back([this] { run(); });
    }
    ~WorkPool() {
        {
            std::unique_lock<std::mutex> lk(mu);
            shutdown = true;
        }
        cv_job.notify_all();
        for (auto& t : workers) t.join();
    }
    void run() {
        for (;;) {
            std::function<void()> job;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_job.wait(lk, [this] {
                    return shutdown || !jobs.empty();
                });
                if (shutdown && jobs.empty()) return;
                job = std::move(jobs.back());
                jobs.pop_back();
            }
            job();
            {
                std::unique_lock<std::mutex> lk(mu);
                pending--;
            }
            cv_done.notify_all();
        }
    }
    // submit a batch and run parts inline on the caller too
    void run_batch(std::vector<std::function<void()>> batch) {
        {
            std::unique_lock<std::mutex> lk(mu);
            pending += (int64_t)batch.size();
            for (auto& j : batch) jobs.push_back(std::move(j));
        }
        cv_job.notify_all();
        // caller helps drain the queue (the reference's worker_pool
        // likewise keeps the calling thread productive)
        for (;;) {
            std::function<void()> job;
            {
                std::unique_lock<std::mutex> lk(mu);
                if (jobs.empty()) break;
                job = std::move(jobs.back());
                jobs.pop_back();
            }
            job();
            {
                std::unique_lock<std::mutex> lk(mu);
                pending--;
            }
            cv_done.notify_all();
        }
        std::unique_lock<std::mutex> lk(mu);
        cv_done.wait(lk, [this] { return pending == 0; });
    }
};

struct MultiParams {
    int quality = 9, lgwin = 22, mode = 0;
};

static MultiParams parse_params(size_t n, const uint32_t* keys,
                                const uint32_t* vals) {
    MultiParams p;
    // ids per reference src/enc/parameters.rs (== google/brotli)
    for (size_t i = 0; i < n; i++) {
        switch (keys[i]) {
            case 0: p.mode = (int)vals[i]; break;
            case 1: p.quality = (int)vals[i]; break;
            case 2: p.lgwin = (int)vals[i]; break;
            default: break;
        }
    }
    return p;
}

// shard i>0 gets the whole preceding prefix as its LZ77 dictionary
// (threading/mod.rs:354-366) so cross-shard matches survive
static int compress_multi_impl(WorkPool* pool, const MultiParams& p,
                               size_t input_size, const uint8_t* input,
                               size_t* encoded_size,
                               uint8_t* encoded_buffer,
                               size_t num_threads) {
    num_threads = std::max<size_t>(1, std::min<size_t>(num_threads,
                                                       kMaxThreads));
    if (input_size < (size_t)num_threads * 4096)
        num_threads = std::max<size_t>(1, input_size / 4096);

    if (num_threads <= 1) {
        return BrotliTpuEncodeOneshot(p.quality, p.lgwin, p.mode, 0, 0,
                                      0, 0, nullptr, 0, input_size,
                                      input, encoded_size,
                                      encoded_buffer);
    }
    // one shard per thread: oversplitting (1.5-2x) raises queue-level
    // balance (measured width 2.8 -> 3.7) but every extra shard pays
    // a full prefix re-hash, +43% total cpu at 2x — a net wall-clock
    // LOSS on hosts whose cores are already saturated
    size_t nt = num_threads;
    std::vector<std::vector<uint8_t>> parts(nt);
    std::vector<int> ok(nt, 0);
    std::vector<std::function<void()>> batch;
    // load-balanced ranges: shard i>0 must hash its whole prefix
    // before encoding, so equal byte ranges (the reference's
    // get_range, threading/mod.rs:333) leave the LAST shard gating
    // the wall clock.  Weight shard i by 1/(1 + beta*i): later shards
    // get fewer bytes to offset their larger prefix-hash bill
    // (beta from the measured strided-prefix-hash/encode cost ratio)
    std::vector<size_t> cuts(nt + 1, 0);
    {
        static const double beta =
            getenv("BROTLI_TPU_MULTI_BETA")
                ? atof(getenv("BROTLI_TPU_MULTI_BETA"))
                : 0.22;
        double wsum = 0;
        std::vector<double> w(nt);
        for (size_t i = 0; i < nt; i++)
            wsum += (w[i] = 1.0 / (1.0 + beta * (double)i));
        double acc = 0;
        for (size_t i = 0; i < nt; i++) {
            acc += w[i];
            cuts[i + 1] = (size_t)((double)input_size * acc / wsum);
        }
        cuts[nt] = input_size;
    }
    for (size_t i = 0; i < nt; i++) {
        size_t lo = cuts[i];
        size_t hi = cuts[i + 1];
        batch.push_back([&, i, lo, hi] {
            size_t cap = (hi - lo) + ((hi - lo) >> 10) + 1024;
            parts[i].resize(cap);
            size_t sz = cap;
            int r;
            if (i == 0) {
                // header + content, byte-aligned, no ISLAST/empty-last
                r = BrotliTpuEncodeOneshot(
                    p.quality, p.lgwin, p.mode, 0, 1, 1, 1, nullptr, 0,
                    hi - lo, input + lo, &sz, parts[i].data());
            } else {
                // headerless catable continuation with prefix dict
                r = BrotliTpuEncodeOneshot(
                    p.quality, p.lgwin, p.mode, 1, 1, 1, 1, input, lo,
                    hi - lo, input + lo, &sz, parts[i].data());
            }
            if (r) {
                parts[i].resize(sz);
                ok[i] = 1;
            }
        });
    }
    if (pool) {
        pool->run_batch(std::move(batch));
    } else {
        // transient threads (BrotliEncoderCompressMulti without a pool)
        std::vector<std::thread> ts;
        for (auto& j : batch) ts.emplace_back(std::move(j));
        for (auto& t : ts) t.join();
    }
    size_t total = 1;  // terminal empty-last byte
    for (size_t i = 0; i < nt; i++) {
        if (!ok[i]) return 0;
        total += parts[i].size();
    }
    if (total > *encoded_size) return 0;
    uint8_t* o = encoded_buffer;
    for (size_t i = 0; i < nt; i++) {
        std::memcpy(o, parts[i].data(), parts[i].size());
        o += parts[i].size();
    }
    *o++ = 0x03;  // empty last metablock, byte-aligned
    *encoded_size = total;
    return 1;
}

}  // namespace wp

extern "C" {

void* BrotliEncoderCreateWorkPool(size_t num_threads, void*, void*,
                                  void*) {
    return new wp::WorkPool((int)num_threads);
}

void BrotliEncoderDestroyWorkPool(void* pool) {
    delete static_cast<wp::WorkPool*>(pool);
}

int BrotliEncoderCompressWorkPool(
    void* pool, size_t num_params, const uint32_t* param_keys,
    const uint32_t* param_values, size_t input_size,
    const uint8_t* input, size_t* encoded_size, uint8_t* encoded_buffer,
    size_t desired_num_threads) {
    wp::MultiParams p = wp::parse_params(num_params, param_keys,
                                         param_values);
    return wp::compress_multi_impl(static_cast<wp::WorkPool*>(pool), p,
                                   input_size, input, encoded_size,
                                   encoded_buffer, desired_num_threads);
}

int BrotliEncoderCompressMulti(
    size_t num_params, const uint32_t* param_keys,
    const uint32_t* param_values, size_t input_size,
    const uint8_t* input, size_t* encoded_size, uint8_t* encoded_buffer,
    size_t desired_num_threads) {
    wp::MultiParams p = wp::parse_params(num_params, param_keys,
                                         param_values);
    return wp::compress_multi_impl(nullptr, p, input_size, input,
                                   encoded_size, encoded_buffer,
                                   desired_num_threads);
}

}  // extern "C"
