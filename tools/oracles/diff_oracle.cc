// Runs the REFERENCE `stats diff` path (stats_main.cc:397-509,
// get_differences) on (fasta, final.bed, wgac.tab) to generate the
// golden fixture for sedef_tpu.models.evaluate.diff.  Build like
// stats_oracle (see README.md), same reference sources.
#include <string>
void get_differences(const std::string &ref_path,
                     const std::string &bed_path,
                     const std::string &wgac_path);
// util stubs (identical to stats_oracle.cc)
#include <sys/stat.h>
#include <algorithm>
#include <cmath>
#include <sstream>
#include <unordered_map>
#include <vector>
#include "common.h"
#include "globals.h"
mode_t stat_file(const std::string &path) { return 0; }
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
double tau(double d, int k) { return 0; }
int relaxed_jaccard_estimate(int s, int k,
                             std::unordered_map<int, int> &mm) { return 0; }
int main(int argc, char **argv) {
  get_differences(argv[1], argv[2], argv[3]);
  return 0;
}
