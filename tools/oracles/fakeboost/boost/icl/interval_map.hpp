// Faithful-for-this-usage ICL stand-in. search.cc only ever:
//   * point-queries (find) the 2-level map — in real ICL the segment
//     containing p holds the aggregation of every added interval covering
//     p, so an on-demand aggregation over stored (interval, value) pairs
//     is observably identical;
//   * aggregate-adds rectangles (operator+= with a one-segment map);
//   * subtracts a prefix domain [0, x) (truncation; values unchanged).
#pragma once
#include <memory>
#include <set>
#include <utility>
#include <vector>

namespace boost { namespace icl {

template <class T> struct discrete_interval {
  T lo{}, hi{};
  bool empty_ = true;
  discrete_interval() {}
  discrete_interval(T l, T h) : lo(l), hi(h), empty_(l >= h) {}
  T lower() const { return lo; }
  T upper() const { return hi; }
  bool contains(T p) const { return !empty_ && lo <= p && p < hi; }
  bool operator<(const discrete_interval &o) const {
    if (lo != o.lo) return lo < o.lo;
    return hi < o.hi;
  }
  bool operator==(const discrete_interval &o) const {
    return lo == o.lo && hi == o.hi;
  }
};

template <class V> struct agg {  // value aggregation: += semantics
  static void add(V &into, const V &v);
};
template <class K2, class V2> struct interval_map;

template <class A, class B>
void agg_add(std::set<std::pair<A, B>> &into,
             const std::set<std::pair<A, B>> &v) {
  into.insert(v.begin(), v.end());
}
template <class K2, class V2>
void agg_add(interval_map<K2, V2> &into, const interval_map<K2, V2> &v) {
  for (auto &seg : v.segs) into.segs.push_back(seg);
}

template <class K, class V> struct interval_map {
  using segment = std::pair<discrete_interval<K>, V>;
  std::vector<segment> segs;

  interval_map() = default;
  interval_map(const segment &s) { segs.push_back(s); }

  struct iterator {
    bool valid = false;
    std::shared_ptr<std::pair<discrete_interval<K>, V>> val;
    const std::pair<discrete_interval<K>, V> *operator->() const {
      return val.get();
    }
    bool operator==(const iterator &o) const { return valid == o.valid; }
    bool operator!=(const iterator &o) const { return valid != o.valid; }
  };

  iterator end() const { return iterator{}; }

  iterator find(K p) const {
    iterator it;
    for (auto &s : segs) {
      if (s.first.contains(p)) {
        if (!it.valid) {
          it.valid = true;
          it.val = std::make_shared<std::pair<discrete_interval<K>, V>>(
              discrete_interval<K>(p, p + 1), V());
        }
        agg_add(it.val->second, s.second);
      }
    }
    return it;
  }

  interval_map &operator+=(const segment &s) {
    segs.push_back(s);
    return *this;
  }
  interval_map &operator-=(const discrete_interval<K> &iv) {
    std::vector<segment> keep;
    for (auto &s : segs) {
      if (s.first.hi <= iv.hi && s.first.lo >= iv.lo) continue;  // swallowed
      segment t = s;
      if (t.first.lo >= iv.lo && t.first.lo < iv.hi) t.first.lo = iv.hi;
      if (!(t.first.lo >= t.first.hi)) keep.push_back(t);
    }
    segs.swap(keep);
    return *this;
  }
};

}}  // namespace boost::icl
