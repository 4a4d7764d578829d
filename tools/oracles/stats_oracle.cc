// Runs the REFERENCE stats-generate path on (fasta, aligned.bed).
#include <string>
void stats(const std::string &ref_path, const std::string &bed_path);
// util stubs
#include <sys/stat.h>
#include <sstream>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>
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
int relaxed_jaccard_estimate(int s, int k, std::unordered_map<int,int>&mm) { return 0; }
int main(int argc, char **argv) {
  if (argc > 3) Globals::Stats::MAX_OK_GAP = atoi(argv[3]);
  stats(argv[1], argv[2]);
  return 0;
}
