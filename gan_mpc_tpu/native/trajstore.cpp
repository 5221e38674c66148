// Native trajectory store: binary IO + sliding-window extraction.
//
// The reference's data loader parses expert trajectories from JSON and
// builds sliding-window datasets with per-element Python loops
// (/root/reference/data_loader.py:18-33, 70-129) — a host-side bottleneck
// once trajectory sets grow to production sizes. This C++ engine provides:
//   * a flat binary trajectory format (header + contiguous f32 blocks)
//     read/written with single fread/fwrite calls;
//   * multithreaded sliding-window extraction (cost windows with
//     zero-padded history, and (x, u, next_x) sequence windows) straight
//     into caller-provided buffers, ready for device upload.
//
// Exposed as a C ABI consumed from Python via ctypes
// (gan_mpc_tpu/data/native_store.py), with a numpy fallback when the
// shared library is unavailable.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x47414e4d50435453ull;  // "GANMPCTS"

struct Header {
  uint64_t magic;
  int64_t n_traj;
  int64_t traj_len;
  int64_t x_size;
  int64_t u_size;
};

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t workers = hw ? static_cast<int64_t>(hw) : 4;
  if (workers > n) workers = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  int64_t chunk = (n + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    int64_t lo = w * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Returns 0 on success.
int traj_write(const char* path, const float* states, const float* actions,
               const float* rewards, int64_t n_traj, int64_t traj_len,
               int64_t x_size, int64_t u_size) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return 1;
  Header h{kMagic, n_traj, traj_len, x_size, u_size};
  if (std::fwrite(&h, sizeof(h), 1, fp) != 1) return 2;
  size_t ns = static_cast<size_t>(n_traj) * traj_len;
  if (std::fwrite(states, sizeof(float), ns * x_size, fp) != ns * x_size)
    return 3;
  if (std::fwrite(actions, sizeof(float), ns * u_size, fp) != ns * u_size)
    return 4;
  if (std::fwrite(rewards, sizeof(float), ns, fp) != ns) return 5;
  std::fclose(fp);
  return 0;
}

// out_dims: [n_traj, traj_len, x_size, u_size]. Returns 0 on success.
int traj_read_header(const char* path, int64_t* out_dims) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  Header h;
  if (std::fread(&h, sizeof(h), 1, fp) != 1 || h.magic != kMagic) {
    std::fclose(fp);
    return 2;
  }
  std::fclose(fp);
  out_dims[0] = h.n_traj;
  out_dims[1] = h.traj_len;
  out_dims[2] = h.x_size;
  out_dims[3] = h.u_size;
  return 0;
}

int traj_read(const char* path, float* states, float* actions,
              float* rewards) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  Header h;
  if (std::fread(&h, sizeof(h), 1, fp) != 1 || h.magic != kMagic) {
    std::fclose(fp);
    return 2;
  }
  size_t ns = static_cast<size_t>(h.n_traj) * h.traj_len;
  if (std::fread(states, sizeof(float), ns * h.x_size, fp) != ns * h.x_size)
    return 3;
  if (std::fread(actions, sizeof(float), ns * h.u_size, fp) != ns * h.u_size)
    return 4;
  if (std::fread(rewards, sizeof(float), ns, fp) != ns) return 5;
  std::fclose(fp);
  return 0;
}

// (x, u, next_x) sequence windows (data_loader.py:102-129 semantics).
// X_out: (n*(len-seqlen), seqlen, x), U_out likewise with u, Y_out shifted
// states. Multithreaded over windows.
int make_sequence_windows(const float* states, const float* actions,
                          int64_t n_traj, int64_t traj_len, int64_t x_size,
                          int64_t u_size, int64_t seqlen, float* x_out,
                          float* u_out, float* y_out) {
  int64_t per = traj_len - seqlen;
  if (per <= 0) return 1;
  int64_t total = n_traj * per;
  parallel_for(total, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      int64_t tr = w / per, start = w % per;
      const float* s = states + (tr * traj_len + start) * x_size;
      const float* a = actions + (tr * traj_len + start) * u_size;
      std::memcpy(x_out + w * seqlen * x_size, s,
                  sizeof(float) * seqlen * x_size);
      std::memcpy(y_out + w * seqlen * x_size, s + x_size,
                  sizeof(float) * seqlen * x_size);
      std::memcpy(u_out + w * seqlen * u_size, a,
                  sizeof(float) * seqlen * u_size);
    }
  });
  return 0;
}

// Cost windows with zero-padded history (data_loader.py:70-94 semantics).
// X_out: (n*num, history+1, x) past windows; Y_out: (n*num, horizon+1, x).
int make_cost_windows(const float* states, int64_t n_traj, int64_t traj_len,
                      int64_t x_size, int64_t history, int64_t horizon,
                      float* x_out, float* y_out) {
  int64_t per = traj_len - horizon - history;
  if (per <= 0) return 1;
  int64_t total = n_traj * per;
  int64_t hw = history + 1, fw = horizon + 1;
  parallel_for(total, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      int64_t tr = w / per, i = w % per + history;  // "now" in padded frame
      const float* base = states + tr * traj_len * x_size;
      float* xw = x_out + w * hw * x_size;
      for (int64_t k = 0; k < hw; ++k) {
        int64_t src = i + k - 2 * history;  // padded frame -> raw index
        if (src < 0) {
          std::memset(xw + k * x_size, 0, sizeof(float) * x_size);
        } else {
          std::memcpy(xw + k * x_size, base + src * x_size,
                      sizeof(float) * x_size);
        }
      }
      // future window starts at the raw "now" index (i - history)
      std::memcpy(y_out + w * fw * x_size, base + (i - history) * x_size,
                  sizeof(float) * fw * x_size);
    }
  });
  return 0;
}

}  // extern "C"
