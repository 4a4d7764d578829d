// stub: only get_differences uses dynamic_bitset; the stats-generate oracle
// never calls it
#pragma once
#include <vector>
#include <cstddef>
namespace boost {
struct dynamic_bitset_ref { };
template <class T = unsigned long> struct dynamic_bitset {
  std::vector<bool> v;
  dynamic_bitset() {}
  dynamic_bitset(size_t n) : v(n) {}
  void set(size_t i) { v[i] = true; }
  bool operator[](size_t i) const { return v[i]; }
  size_t count() const { size_t c = 0; for (bool b : v) c += b; return c; }
  dynamic_bitset operator&(const dynamic_bitset &o) const { return *this; }
  dynamic_bitset operator~() const { return *this; }
};
}
