// util.cc stand-in for building the FULL reference binary without boost:
// split / rc / stat_file are faithful re-statements of util.cc:25-48 (no
// boost there); relaxed_jaccard_estimate uses the closed form implied by
// the reference's int-truncating solve_inverse_jaccard (validated against
// the boost path in tests/test_foundations.py).  Test tooling only.
#include <algorithm>
#include <cmath>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <sys/types.h>
#include <unordered_map>
#include <vector>

#include "common.h"
#include "globals.h"

using namespace std;

mode_t stat_file(const string &path) {
  struct stat path_stat;
  int s = stat(path.c_str(), &path_stat);
  assert(s == 0);
  return path_stat.st_mode;
}

vector<string> split(const string &s, char delim) {
  vector<string> elems;
  stringstream ss(s);
  string item;
  while (getline(ss, item, delim)) elems.push_back(item);
  return elems;
}

string rc(const string &s) {
  auto r = s;
  reverse(r.begin(), r.end());
  transform(r.begin(), r.end(), r.begin(), rev_dna);
  return r;
}

double tau(double edit_error, int kmer_size) {
  const double ERROR_RATIO =
      (Globals::Search::MAX_ERROR - Globals::Search::MAX_EDIT_ERROR) /
      Globals::Search::MAX_EDIT_ERROR;
  double gap_error = std::min(1.0, ERROR_RATIO * edit_error);
  double a = (1 - gap_error) / (1 + gap_error);
  double b = 1 / (2 * std::exp(kmer_size * edit_error) - 1);
  return a * b;
}

int relaxed_jaccard_estimate(int s, int kmer_size,
                             unordered_map<int, int> &mm) {
  auto it = mm.find(s);
  if (it != mm.end()) return it->second;
  int result;
  if (s <= 0)
    result = 0;
  else if (s == 1)
    result = 1;
  else
    result = (int)std::ceil(
                 s * tau(Globals::Search::MAX_EDIT_ERROR, kmer_size)) +
             1;
  mm[s] = result;
  return result;
}
