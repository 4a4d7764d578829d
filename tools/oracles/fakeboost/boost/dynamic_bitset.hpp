// Functional minimal boost::dynamic_bitset for the oracle builds.
// stats-generate never touches it; get_differences (diff_oracle) uses
// set/operator[]/count/&/~ exactly as boost defines them for equal-size
// sets (the reference allocates every bitset at 250 MB, so sizes always
// match).  operator[] additionally returns false past the end: the
// reference indexes wgac[chr][i] where map::operator[] may have
// default-constructed an EMPTY bitset (UB in real boost that real
// genomes never hit because WGAC covers every chromosome); the oracle
// must not crash on synthetic inputs that do hit it.
#pragma once
#include <cstddef>
#include <vector>
namespace boost {
template <class T = unsigned long> struct dynamic_bitset {
  std::vector<bool> v;
  dynamic_bitset() {}
  dynamic_bitset(size_t n) : v(n, false) {}
  size_t size() const { return v.size(); }
  void set(size_t i) {
    if (i >= v.size()) v.resize(i + 1, false);
    v[i] = true;
  }
  bool operator[](size_t i) const { return i < v.size() && v[i]; }
  size_t count() const {
    size_t c = 0;
    for (bool b : v) c += b;
    return c;
  }
  dynamic_bitset operator&(const dynamic_bitset &o) const {
    dynamic_bitset r(std::max(v.size(), o.v.size()));
    size_t n = std::min(v.size(), o.v.size());
    for (size_t i = 0; i < n; i++) r.v[i] = v[i] && o.v[i];
    return r;
  }
  dynamic_bitset operator~() const {
    dynamic_bitset r(v.size());
    for (size_t i = 0; i < v.size(); i++) r.v[i] = !v[i];
    return r;
  }
};
}  // namespace boost
