// tracelog: high-rate binary record logger for planner telemetry.
//
// The runtime piece around the TPU compute path: MPC serving loops emit one
// fixed-size record per step (states, controls, iterations, residuals...)
// at kHz rates across many scenario lanes; doing that through Python file IO
// stalls the dispatch thread. This C++ writer keeps an in-memory buffer per
// log with a background flush thread, appends are lock-guarded memcpy's, and
// the file format is a trivially mmap-able array of fixed-size float32
// records with a small header.
//
// File layout:
//   [magic u32 = 0x444c5031 ("DLP1")] [record_floats u32] [reserved u64]
//   then records: record_floats * float32 each.
//
// C API (ctypes-friendly): tl_open / tl_append / tl_flush / tl_close /
// tl_read (reader returns record count, fills caller buffer).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x444c5031u;
constexpr size_t kHeaderBytes = 16;
constexpr size_t kFlushThreshold = 1u << 20;  // 1 MiB

struct Log {
  std::FILE* file = nullptr;
  uint32_t record_floats = 0;
  std::vector<float> buffer;          // pending records
  std::mutex mu;
  std::condition_variable cv;
  std::thread flusher;
  std::atomic<bool> stop{false};
  uint64_t records_written = 0;       // flushed to file
  uint64_t records_appended = 0;

  void flush_locked() {
    if (!buffer.empty()) {
      std::fwrite(buffer.data(), sizeof(float), buffer.size(), file);
      records_written += buffer.size() / record_floats;
      buffer.clear();
    }
    std::fflush(file);
  }

  void flusher_main() {
    std::unique_lock<std::mutex> lock(mu);
    while (!stop.load()) {
      cv.wait_for(lock, std::chrono::milliseconds(200), [&] {
        return stop.load() ||
               buffer.size() * sizeof(float) >= kFlushThreshold;
      });
      flush_locked();
    }
    flush_locked();
  }
};

}  // namespace

extern "C" {

// Open a log for writing; truncates. Returns an opaque handle or null.
void* tl_open(const char* path, uint32_t record_floats) {
  if (record_floats == 0) return nullptr;
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  uint32_t header[4] = {kMagic, record_floats, 0, 0};
  std::fwrite(header, sizeof(uint32_t), 4, f);
  auto* log = new Log();
  log->file = f;
  log->record_floats = record_floats;
  log->buffer.reserve(kFlushThreshold / sizeof(float));
  log->flusher = std::thread([log] { log->flusher_main(); });
  return log;
}

// Append n_records records (n_records * record_floats floats at data).
int tl_append(void* handle, const float* data, uint32_t n_records) {
  auto* log = static_cast<Log*>(handle);
  if (!log || !data) return -1;
  const size_t n = static_cast<size_t>(n_records) * log->record_floats;
  {
    std::lock_guard<std::mutex> lock(log->mu);
    log->buffer.insert(log->buffer.end(), data, data + n);
    log->records_appended += n_records;
  }
  log->cv.notify_one();
  return 0;
}

// Block until everything appended so far is on disk.
int tl_flush(void* handle) {
  auto* log = static_cast<Log*>(handle);
  if (!log) return -1;
  std::lock_guard<std::mutex> lock(log->mu);
  log->flush_locked();
  return 0;
}

uint64_t tl_records(void* handle) {
  auto* log = static_cast<Log*>(handle);
  if (!log) return 0;
  std::lock_guard<std::mutex> lock(log->mu);
  return log->records_appended;
}

int tl_close(void* handle) {
  auto* log = static_cast<Log*>(handle);
  if (!log) return -1;
  log->stop.store(true);
  log->cv.notify_one();
  if (log->flusher.joinable()) log->flusher.join();
  std::fclose(log->file);
  delete log;
  return 0;
}

// Reader: returns the number of records in the file and the record width.
// If out != null, copies up to max_records records into it.
int64_t tl_read(const char* path, float* out, int64_t max_records,
                uint32_t* record_floats_out) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint32_t header[4];
  if (std::fread(header, sizeof(uint32_t), 4, f) != 4 ||
      header[0] != kMagic || header[1] == 0) {
    std::fclose(f);
    return -2;
  }
  const uint32_t rf = header[1];
  if (record_floats_out) *record_floats_out = rf;
  std::fseek(f, 0, SEEK_END);
  const long end = std::ftell(f);
  const int64_t n_records =
      (end - static_cast<long>(kHeaderBytes)) / (sizeof(float) * rf);
  if (out && max_records > 0) {
    std::fseek(f, kHeaderBytes, SEEK_SET);
    const int64_t take = n_records < max_records ? n_records : max_records;
    size_t got = std::fread(out, sizeof(float) * rf, take, f);
    std::fclose(f);
    return static_cast<int64_t>(got);
  }
  std::fclose(f);
  return n_records;
}

}  // extern "C"
