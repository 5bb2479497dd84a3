// Native keypoint-JSON loader for the data layer.
//
// The host-side cost of assembling large frame batches is dominated by
// parsing thousands of small OpenPose JSON files (the on-disk interface
// inherited from the reference — `code/utils/data_parser.py:42-90`).
// This is a minimal, schema-specific parser (no general JSON library):
// it scans for the "pose_keypoints_2d" arrays of each person entry and
// reads the float triplets directly, parallelized over files with a
// thread pool.  Exposed as a C ABI consumed via ctypes
// (`mvsmplfitting_tpu/data/native.py`); the pure-Python path remains as
// fallback.
//
// Build: make -C native   (produces libkeypoint_loader.so)

#include <atomic>
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Read a whole file into a string; empty on failure.
std::string read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return {};
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(n > 0 ? static_cast<size_t>(n) : 0, '\0');
  if (n > 0 && std::fread(&buf[0], 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return {};
  }
  std::fclose(f);
  return buf;
}

// Parse the floats of the JSON array starting at `p` (just past '[').
// Returns number of floats written (up to max_out).
int parse_float_array(const char* p, const char* end, float* out,
                      int max_out) {
  int count = 0;
  while (p < end && *p != ']') {
    // skip separators/whitespace
    while (p < end && (*p == ',' || std::isspace(static_cast<unsigned char>(*p))))
      ++p;
    if (p >= end || *p == ']') break;
    char* next = nullptr;
    float v = std::strtof(p, &next);
    if (next == p) break;  // malformed
    if (count < max_out) out[count] = v;
    ++count;
    p = next;
  }
  return count < max_out ? count : max_out;
}

// Parse one keypoint file: fills out[(person, joint, 3)] row-major for
// up to max_people; returns people found (clamped), or -1 on error.
int parse_one(const char* path, float* out, int max_people,
              int num_joints) {
  const std::string buf = read_file(path);
  if (buf.empty()) return -1;
  const char* p = buf.data();
  const char* end = p + buf.size();
  static const char kKey[] = "\"pose_keypoints_2d\"";
  int person = 0;
  const int stride = num_joints * 3;
  while (person < max_people) {
    const char* hit = std::strstr(p, kKey);
    if (!hit || hit >= end) break;
    const char* open = std::strchr(hit, '[');
    if (!open) break;
    std::vector<float> tmp(stride * 4, 0.0f);  // room for >num_joints
    int got = parse_float_array(open + 1, end, tmp.data(),
                                static_cast<int>(tmp.size()));
    int joints = got / 3;
    if (joints > num_joints) joints = num_joints;  // 17-joint truncation
    std::memcpy(out + person * stride, tmp.data(),
                static_cast<size_t>(joints) * 3 * sizeof(float));
    ++person;
    p = open + 1;
  }
  return person;
}

}  // namespace

extern "C" {

// Parse one file. out must hold max_people*num_joints*3 floats
// (zero-filled by the caller or here). Returns people count or -1.
int kp_parse_file(const char* path, float* out, int max_people,
                  int num_joints) {
  std::memset(out, 0,
              static_cast<size_t>(max_people) * num_joints * 3 *
                  sizeof(float));
  return parse_one(path, out, max_people, num_joints);
}

// Parse a batch of files in parallel.
//   paths:       array of n C strings (empty string = missing view)
//   out:         n * max_people * num_joints * 3 floats
//   people_out:  n ints; -1 for missing/bad files
// Returns number of successfully parsed files.
int kp_parse_batch(const char** paths, int n, float* out,
                   int* people_out, int max_people, int num_joints,
                   int num_threads) {
  const long stride = static_cast<long>(max_people) * num_joints * 3;
  std::memset(out, 0, static_cast<size_t>(n) * stride * sizeof(float));
  std::atomic<int> next(0), ok(0);
  if (num_threads <= 0) num_threads = 1;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (!paths[i] || !paths[i][0]) {
        people_out[i] = -1;
        continue;
      }
      int got = parse_one(paths[i], out + i * stride, max_people,
                          num_joints);
      people_out[i] = got;
      if (got >= 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = num_threads < n ? num_threads : (n > 0 ? n : 1);
  threads.reserve(static_cast<size_t>(nt));
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

}  // extern "C"
