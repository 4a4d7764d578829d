// Fixture generator: runs the REFERENCE ksw2 extz2_sse kernel exactly as
// SEDEF calls it (align.cc:39-68: mat 5/-4, gapo 40, gape 1, w=-1, zdrop=-1,
// flag=0) on random code sequences and dumps score + CIGAR.
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>
#include "ksw2.h"

extern "C" void ksw_extz2_sse(void *km, int qlen, const uint8_t *query,
                              int tlen, const uint8_t *target, int8_t m,
                              const int8_t *mat, int8_t q, int8_t e, int w,
                              int zdrop, int flag, ksw_extz_t *ez);

int main(int argc, char **argv) {
  unsigned seed = argc > 1 ? atoi(argv[1]) : 1;
  int npairs = argc > 2 ? atoi(argv[2]) : 20;
  int maxlen = argc > 3 ? atoi(argv[3]) : 300;
  std::mt19937 rng(seed);
  int8_t a = 5, b = -4;
  int8_t mat[25] = {a, b, b, b, 0, b, a, b, b, 0, b, b, a,
                    b, 0, b, b, b, a, 0, 0, 0, 0, 0, 0};
  std::uniform_int_distribution<int> ld(1, maxlen), cd(0, 99), bd(0, 3);
  for (int i = 0; i < npairs; i++) {
    int qlen = ld(rng), tlen = ld(rng);
    std::vector<uint8_t> q(qlen), t(tlen);
    for (auto &c : q) c = cd(rng) < 5 ? 4 : bd(rng);
    // make target a mutated copy of query ~70% of the time
    if (cd(rng) < 70) {
      t.assign(q.begin(), q.begin() + std::min(qlen, tlen));
      t.resize(tlen);
      for (auto &c : t)
        if (cd(rng) < 12) c = cd(rng) < 10 ? 4 : bd(rng);
    } else {
      for (auto &c : t) c = cd(rng) < 5 ? 4 : bd(rng);
    }
    ksw_extz_t ez;
    memset(&ez, 0, sizeof(ez));
    ksw_extz2_sse(0, qlen, q.data(), tlen, t.data(), 5, mat, 40, 1, -1, -1,
                  0, &ez);
    printf("PAIR %d %d %d\n", qlen, tlen, ez.score);
    for (int j = 0; j < qlen; j++) printf("%d", q[j]);
    printf("\n");
    for (int j = 0; j < tlen; j++) printf("%d", t[j]);
    printf("\n");
    for (int j = 0; j < ez.n_cigar; j++)
      printf("%d%c", ez.cigar[j] >> 4, "MDI"[ez.cigar[j] & 0xf]);
    printf("\n");
    free(ez.cigar);
  }
  return 0;
}
