// Drives the REFERENCE stage-1 search (search.cc + sliding.cc + filter.cc)
// over a FASTA chromosome pair, mirroring initial_search
// (search_main.cc:40-82), and dumps seed BED rows.
#include <cassert>
#include <cstdio>
#include <memory>
#include <string>
#include <vector>
#include "search.h"
#include "fasta.h"
// util stubs (closed-form estimator validated against boost in tests)
#include <sys/stat.h>
#include <sstream>
#include <cmath>
#include <unordered_map>
#include "common.h"
#include "globals.h"
mode_t stat_file(const std::string &path) { struct stat st; stat(path.c_str(), &st); return st.st_mode; }
std::vector<std::string> split(const std::string &s, char delim) {
  std::vector<std::string> e; std::stringstream ss(s); std::string it;
  while (getline(ss, it, delim)) e.push_back(it);
  return e;
}
std::string rc(const std::string &s) {
  auto r = s; std::reverse(r.begin(), r.end());
  std::transform(r.begin(), r.end(), r.begin(), rev_dna);
  return r;
}
double tau(double d, int k) {
  const double ER = (Globals::Search::MAX_ERROR - Globals::Search::MAX_EDIT_ERROR) / Globals::Search::MAX_EDIT_ERROR;
  double g = std::min(1.0, ER * d);
  return ((1 - g) / (1 + g)) * (1.0 / (2 * std::exp(k * d) - 1));
}
int relaxed_jaccard_estimate(int s, int k, std::unordered_map<int,int>&mm) {
  if (s <= 0) return 0;
  if (s == 1) return 1;
  return (int)std::ceil(s * tau(Globals::Search::MAX_EDIT_ERROR, k)) + 1;
}

int main(int argc, char **argv) {
  std::string fa = argv[1], qname = argv[2], rname = argv[3];
  bool is_rc = argc > 4 && std::string(argv[4]) == "rc";
  FastaReference fr(fa);
  std::string qs = fr.get_sequence(qname);
  std::string rs = fr.get_sequence(rname);
  auto query_hash = std::make_shared<Index>(
      std::make_shared<Sequence>(qname, qs), 12, 16);
  auto ref_hash = (qname == rname && !is_rc)
      ? query_hash
      : std::make_shared<Index>(
            std::make_shared<Sequence>(rname, rs, is_rc), 12, 16);
  bool same_genome = (qname == rname) && !is_rc;

  // initial_search loop (search_main.cc:40-82)
  Tree tree;
  int next_to_attain = 0;
  for (int qi = 0; qi < (int)query_hash->minimizers.size(); qi++) {
    auto &qm = query_hash->minimizers[qi];
    if (qm.loc < next_to_attain) continue;
    if (Globals::Internal::DoUppercaseSeeds &&
        qm.hash.status != Hash::Status::HAS_UPPERCASE) continue;
    auto hits = search(qi, query_hash, ref_hash, tree, same_genome,
                       Globals::Search::MIN_READ_SIZE, true, false);
    int min_len = query_hash->seq->seq.size();
    for (auto &pp : hits) {
      min_len = std::min(min_len, pp.query_end - pp.query_start);
      printf("%s\n", pp.to_bed().c_str());
    }
    next_to_attain = (min_len >= Globals::Search::MIN_READ_SIZE
                      ? qm.loc + (Globals::Search::MIN_READ_SIZE *
                                  Globals::Search::MAX_ERROR) / 2
                      : qm.loc);
  }
  return 0;
}
