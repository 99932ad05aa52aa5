// anyedit_native — native IO runtime for the instruction-record factory.
//
// The reference loads entire instruction JSONs into RAM in every process
// (local_pipeline_tool.py:556-561) — at 2.5M records × 20 task scripts that
// is GBs of redundant parsing. This library gives the executor:
//
//   * an mmap line indexer: one pass over a .jsonl produces (offset, len)
//     per record, so a shard touches only its own byte ranges,
//   * pread-based slice reads (no seek contention between threads),
//   * a ledger scanner that counts status fields without materializing
//     Python objects per line.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Scan a file and fill offsets/lengths for each non-empty line.
// Returns the number of lines found (<= max_lines), or -1 on error.
// Call first with max_lines=0 to get the required count.
int64_t jsonl_index(const char* path, int64_t* offsets, int64_t* lengths,
                    int64_t max_lines) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) { close(fd); return 0; }
  void* mem = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return -1;
  const char* data = static_cast<const char*>(mem);

  int64_t count = 0;
  size_t line_start = 0;
  for (size_t i = 0; i <= size; ++i) {
    if (i == size || data[i] == '\n') {
      size_t len = i - line_start;
      // skip blank/whitespace-only lines
      size_t s = line_start;
      while (s < i && (data[s] == ' ' || data[s] == '\t' || data[s] == '\r'))
        ++s;
      if (s < i) {
        if (count < max_lines && offsets && lengths) {
          offsets[count] = static_cast<int64_t>(line_start);
          lengths[count] = static_cast<int64_t>(len);
        }
        ++count;
      }
      line_start = i + 1;
    }
  }
  munmap(mem, size);
  return count;
}

// pread a byte range into buf. Returns bytes read or -1.
int64_t read_slice(const char* path, int64_t offset, int64_t length,
                   char* buf) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t total = 0;
  while (total < length) {
    ssize_t n = pread(fd, buf + total, static_cast<size_t>(length - total),
                      static_cast<off_t>(offset + total));
    if (n <= 0) break;
    total += n;
  }
  close(fd);
  return total;
}

// Count occurrences of "status": "<status>" per category in a ledger.
// statuses: success, failure, filtered → counts[0..2]. Returns total lines.
int64_t ledger_scan(const char* path, int64_t* counts) {
  counts[0] = counts[1] = counts[2] = 0;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) { close(fd); return 0; }
  void* mem = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return -1;
  const char* data = static_cast<const char*>(mem);

  static const char* needles[3] = {"\"status\": \"success\"",
                                   "\"status\": \"failure\"",
                                   "\"status\": \"filtered\""};
  size_t nlens[3] = {strlen(needles[0]), strlen(needles[1]),
                     strlen(needles[2])};
  int64_t lines = 0;
  size_t line_start = 0;
  for (size_t i = 0; i <= size; ++i) {
    if (i == size || data[i] == '\n') {
      size_t len = i - line_start;
      if (len > 0) {
        ++lines;
        for (int s = 0; s < 3; ++s) {
          if (len >= nlens[s] &&
              memmem(data + line_start, len, needles[s], nlens[s])) {
            ++counts[s];
            break;
          }
        }
      }
      line_start = i + 1;
    }
  }
  munmap(mem, size);
  return lines;
}

}  // extern "C"
