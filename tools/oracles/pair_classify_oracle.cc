// Drives the REFERENCE PyAligner primitives (python/sedef.cpp:39-94) —
// jaccard_align (stage-1 engine on raw strings, k=12/w=16) and
// chain_align (fast_align, k=11) — over sequence pairs from stdin, so
// the simulation-accuracy harness can classify the SAME pairs with the
// reference engine (tools/accuracy_table.py --ref-oracle).  Test tooling
// only.
//
// stdin, one case per line:  J <seq1> <seq2>   or   C <seq1> <seq2>
// stdout, one line per case: <n> <qs> <qe> <rs> <re> ...
//
// Build (from tools/oracles):
//   REF=/root/reference
//   g++ -std=c++14 -O2 -msse4.1 -include algorithm -I$REF/src -I$REF \
//       -Ifakeboost pair_classify_oracle.cc $REF/src/search.cc \
//       $REF/src/sliding.cc $REF/src/filter.cc $REF/src/hash.cc \
//       $REF/src/hit.cc $REF/src/align.cc $REF/src/chain.cc \
//       $REF/src/refine.cc $REF/src/fasta.cc $REF/src/globals.cc \
//       $REF/extern/format.cc $REF/extern/ksw2_extz2_sse.cc \
//       -o pair_classify_oracle

#include <array>
#include <cstdio>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

#include "chain.h"
#include "hit.h"
#include "search.h"

// ---- util.cc stubs (boost-free; same as the sibling oracles) ----
#include <sys/stat.h>
#include <cmath>
#include <sstream>
#include <unordered_map>
#include "common.h"
#include "globals.h"
mode_t stat_file(const std::string &path) { return 0; }
std::vector<std::string> split(const std::string &s, char delim) {
  std::vector<std::string> e;
  std::stringstream ss(s);
  std::string it;
  while (getline(ss, it, delim)) e.push_back(it);
  return e;
}
std::string rc(const std::string &s) {
  auto r = s;
  std::reverse(r.begin(), r.end());
  std::transform(r.begin(), r.end(), r.begin(), rev_dna);
  return r;
}
double tau(double d, int k) {
  const double ER = (Globals::Search::MAX_ERROR -
                     Globals::Search::MAX_EDIT_ERROR) /
                    Globals::Search::MAX_EDIT_ERROR;
  double g = std::min(1.0, ER * d);
  return ((1 - g) / (1 + g)) * (1.0 / (2 * std::exp(k * d) - 1));
}
int relaxed_jaccard_estimate(int s, int k,
                             std::unordered_map<int, int> &mm) {
  if (s <= 0) return 0;
  if (s == 1) return 1;
  return (int)std::ceil(
             s * tau(Globals::Search::MAX_EDIT_ERROR, k)) + 1;
}

int main() {
  std::string mode, q, r;
  while (std::cin >> mode >> q >> r) {
    std::vector<std::array<int, 4>> out;
    if (mode == "J") {
      // Production-style seeding: the initial_search loop
      // (search_main.cc:40-82) with init_len = MIN_READ_SIZE — NOT the
      // binding's jaccard_align, whose init_len = max(|q|, |r|) makes
      // search() return early unless a minimizer sits exactly at
      // position 0 (search.cc:403-404; measured: fires on ~5% of
      // pairs).  The harness compares both engines through the same
      // production-seeding classification shape.
      auto query_hash = std::make_shared<Index>(
          std::make_shared<Sequence>("qry", q), 12, 16);
      auto ref_hash = std::make_shared<Index>(
          std::make_shared<Sequence>("ref", r), 12, 16);
      Tree tree;
      int next_to_attain = 0;
      for (size_t qi = 0; qi < query_hash->minimizers.size(); qi++) {
        auto &qm = query_hash->minimizers[qi];
        if (qm.loc < next_to_attain) continue;
        if (Globals::Internal::DoUppercaseSeeds &&
            qm.hash.status != Hash::Status::HAS_UPPERCASE) continue;
        auto hi = search((int)qi, query_hash, ref_hash, tree, false,
                         Globals::Search::MIN_READ_SIZE, true, false);
        int min_len = (int)query_hash->seq->seq.size();
        for (auto &pp : hi) {
          min_len = std::min(min_len, pp.query_end - pp.query_start);
          out.push_back({pp.query_start, pp.query_end, pp.ref_start,
                         pp.ref_end});
        }
        next_to_attain =
            (min_len >= Globals::Search::MIN_READ_SIZE
                 ? qm.loc + (int)(Globals::Search::MIN_READ_SIZE *
                                  Globals::Search::MAX_ERROR) / 2
                 : qm.loc);
      }
    } else {
      // python/sedef.cpp:78-94 chain_align
      Hit orig{std::make_shared<Sequence>("A", q), 0, (int)q.size(),
               std::make_shared<Sequence>("B", r), 0, (int)r.size()};
      auto hi = fast_align(q, r, orig, 11);
      for (auto &pp : hi)
        out.push_back({pp.query_start, pp.query_end, pp.ref_start,
                       pp.ref_end});
    }
    std::cout << out.size();
    for (auto &h : out)
      std::cout << " " << h[0] << " " << h[1] << " " << h[2] << " "
                << h[3];
    std::cout << "\n" << std::flush;
  }
  return 0;
}
