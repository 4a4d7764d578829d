// Measures reference ksw2 extz2_sse single-core GCUPS with traceback,
// SEDEF's exact parameters (5/-4/40/1, full band).
#include <cassert>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>
#include "ksw2.h"
extern "C" void ksw_extz2_sse(void*, int, const uint8_t*, int, const uint8_t*,
                              int8_t, const int8_t*, int8_t, int8_t, int, int,
                              int, ksw_extz_t*);
int main(int argc, char **argv) {
  int L = argc > 1 ? atoi(argv[1]) : 1024;
  int reps = argc > 2 ? atoi(argv[2]) : 32;
  std::mt19937 rng(1);
  int8_t a = 5, b = -4;
  int8_t mat[25] = {a,b,b,b,0, b,a,b,b,0, b,b,a,b,0, b,b,b,a,0, 0,0,0,0,0};
  std::uniform_int_distribution<int> bd(0, 3), cd(0, 99);
  std::vector<uint8_t> q(L), t(L);
  for (auto &c : q) c = bd(rng);
  t = q;
  for (auto &c : t) if (cd(rng) < 10) c = bd(rng);
  double cells = 0;
  auto t0 = std::chrono::high_resolution_clock::now();
  for (int i = 0; i < reps; i++) {
    ksw_extz_t ez; memset(&ez, 0, sizeof(ez));
    ksw_extz2_sse(0, L, q.data(), L, t.data(), 5, mat, 40, 1, -1, -1, 0, &ez);
    cells += (double)L * L;
    free(ez.cigar);
    q[0] = (q[0] + 1) & 3;  // defeat caching
  }
  auto t1 = std::chrono::high_resolution_clock::now();
  double s = std::chrono::duration<double>(t1 - t0).count();
  printf("L=%d reps=%d time=%.3fs GCUPS=%.3f\n", L, reps, s, cells / s / 1e9);
  return 0;
}
