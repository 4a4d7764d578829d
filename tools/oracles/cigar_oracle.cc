// Runs the REFERENCE CIGAR surgery (align.cc trim/trim_front/trim_back/
// merge) on cases read from stdin — the live oracle for the CIGAR fuzz
// (tests/test_cigar_fuzz.py).  Test tooling only; nothing ships.
//
// stdin, one case per line (whitespace-separated tokens):
//   TRIMF <a> <b> <cigar>
//   TRIMB <a> <b> <cigar>
//   TRIM  <a> <b> <cigar>
//   MERGE <qstr> <rstr> <s1a> <e1a> <s1b> <e1b> <cig1>
//                       <s2a> <e2a> <s2b> <e2b> <cig2>
// stdout, one line per case:
//   <start_a> <end_a> <start_b> <end_b> <cigar_string>
//
// Build (from tools/oracles):
//   REF=/root/reference
//   g++ -std=c++14 -O2 -msse4.1 -include algorithm \
//       -I$REF/src -I$REF -Ifakeboost cigar_oracle.cc \
//       $REF/src/align.cc $REF/src/hit.cc $REF/src/hash.cc \
//       $REF/src/fasta.cc $REF/src/globals.cc $REF/extern/format.cc \
//       $REF/extern/ksw2_extz2_sse.cc -o cigar_oracle

#include <iostream>
#include <sstream>
#include <string>

// oracle-only access to the private surgery members: the reference
// class declares `friend void test(int, char **)` (align.h:96) — the
// whole oracle loop runs inside that friend
#include "align.h"

// util stubs (same as the sibling oracles)
#include <sys/stat.h>
#include <unordered_map>
#include <vector>
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
double tau(double d, int k) { return 0; }
int relaxed_jaccard_estimate(int s, int k,
                             std::unordered_map<int, int> &mm) {
  return 0;
}

// the oracle body runs inside the reference's declared test() friend
// (align.h:96) for access to the private surgery members
void test(int, char **) {
  auto emit = [](const Alignment &al) {
    std::cout << al.start_a << " " << al.end_a << " " << al.start_b << " "
              << al.end_b << " "
              << (al.cigar_string().empty() ? "." : al.cigar_string())
              << "\n";
  };
  std::string mode;
  while (std::cin >> mode) {
    if (mode == "TRIMF" || mode == "TRIMB" || mode == "TRIM") {
      std::string a, b, cig;
      std::cin >> a >> b >> cig;
      Alignment al(a, b, cig);
      if (mode == "TRIMF")
        al.trim_front();
      else if (mode == "TRIMB")
        al.trim_back();
      else
        al.trim();
      emit(al);
    } else if (mode == "MERGE") {
      std::string qstr, rstr, cig1, cig2;
      int s1a, e1a, s1b, e1b, s2a, e2a, s2b, e2b;
      std::cin >> qstr >> rstr >> s1a >> e1a >> s1b >> e1b >> cig1 >> s2a
          >> e2a >> s2b >> e2b >> cig2;
      Alignment al1(qstr.substr(s1a, e1a - s1a),
                    rstr.substr(s1b, e1b - s1b), cig1);
      al1.start_a = s1a;
      al1.end_a = e1a;
      al1.start_b = s1b;
      al1.end_b = e1b;
      Alignment al2(qstr.substr(s2a, e2a - s2a),
                    rstr.substr(s2b, e2b - s2b), cig2);
      al2.start_a = s2a;
      al2.end_a = e2a;
      al2.start_b = s2b;
      al2.end_b = e2b;
      al1.merge(al2, qstr, rstr);
      emit(al1);
    } else {
      std::cerr << "unknown mode " << mode << "\n";
      exit(1);
    }
  }
}

int main() {
  test(0, nullptr);
  return 0;
}
