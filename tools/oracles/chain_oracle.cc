// Fixture generator: drives the REFERENCE fast_align (anchors -> chaining ->
// guided ksw2 alignment -> refinement) on synthetic mutated pairs and dumps
// the resulting hits + CIGARs.
#include <cassert>
#include <cstdio>
#include <memory>
#include <random>
#include <string>
#include <vector>
#include "chain.h"
#include "hit.h"
#include "align.h"

// ---- util.cc stubs (boost-free) ----
#include <sys/stat.h>
#include <sstream>
#include <cmath>
#include <unordered_map>
#include "globals.h"
mode_t stat_file(const std::string &path) { return 0; }
std::vector<std::string> split(const std::string &s, char delim) {
  std::vector<std::string> e; std::stringstream ss(s); std::string it;
  while (getline(ss, it, delim)) e.push_back(it);
  return e;
}
std::string rc(const std::string &s) {
  auto r = s; reverse(r.begin(), r.end());
  transform(r.begin(), r.end(), r.begin(), rev_dna);
  return r;
}
double tau(double d, int k) {
  const double ER = (Globals::Search::MAX_ERROR - Globals::Search::MAX_EDIT_ERROR) / Globals::Search::MAX_EDIT_ERROR;
  double g = std::min(1.0, ER * d);
  return ((1 - g) / (1 + g)) * (1.0 / (2 * std::exp(k * d) - 1));
}
int relaxed_jaccard_estimate(int s, int k, std::unordered_map<int, int> &mm) {
  if (s <= 0) return 0;
  if (s == 1) return 1;
  return (int)std::ceil(s * tau(Globals::Search::MAX_EDIT_ERROR, k)) + 1;
}

static const char *B = "ACGT";
static const char *BL = "acgt";

int main(int argc, char **argv) {
  unsigned seed = argc > 1 ? atoi(argv[1]) : 1;
  int npairs = argc > 2 ? atoi(argv[2]) : 10;
  int maxlen = argc > 3 ? atoi(argv[3]) : 3000;
  int lowercase_pct = argc > 4 ? atoi(argv[4]) : 0;
  std::mt19937 rng(seed);
  std::uniform_int_distribution<int> bd(0, 3), cd(0, 99);

  for (int pi = 0; pi < npairs; pi++) {
    std::uniform_int_distribution<int> ld(500, maxlen);
    int len = ld(rng);
    std::string q;
    for (int i = 0; i < len; i++) {
      bool low = cd(rng) < lowercase_pct;
      if (cd(rng) < 1) q += 'N';
      else q += low ? BL[bd(rng)] : B[bd(rng)];
    }
    // mutated copy with indels
    std::string r;
    for (int i = 0; i < (int)q.size(); i++) {
      int c = cd(rng);
      if (c < 4) continue;                        // del
      if (c < 8) { r += B[bd(rng)]; r += q[i]; }  // ins
      else if (c < 14) r += B[bd(rng)];           // snp
      else r += q[i];
    }
    // occasional big indel
    if (cd(rng) < 50 && r.size() > 600) {
      int p = r.size() / 3;
      int glen = 50 + cd(rng) * 3;
      std::string ins;
      for (int i = 0; i < glen; i++) ins += B[bd(rng)];
      r = r.substr(0, p) + ins + r.substr(p);
    }
    Hit orig{std::make_shared<Sequence>("A", q), 0, (int)q.size(),
             std::make_shared<Sequence>("B", r), 0, (int)r.size(), 0, "", "", {}};
    auto hits = fast_align(q, r, orig, 11);
    printf("PAIR %d %zu %zu %zu\n", pi, q.size(), r.size(), hits.size());
    printf("%s\n%s\n", q.c_str(), r.c_str());
    for (auto &h : hits) {
      printf("HIT %d %d %d %d %s\n", h.query_start, h.query_end,
             h.ref_start, h.ref_end, h.aln.cigar_string().c_str());
    }
  }
  return 0;
}
