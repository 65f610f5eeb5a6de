// Minimal stand-in for boost::numeric::ublas::mapped_matrix, just enough
// to COMPILE and RUN the reference's MPP translation unit as a test
// oracle. Behaviorally equivalent for the operations mpp.cpp uses:
// construction with a size, operator()(i, j) read/write, size1/size2.
// Not a boost copy.
#pragma once
#include <cstddef>
#include <map>
#include <utility>

namespace boost {
namespace numeric {
namespace ublas {

template <typename T>
class mapped_matrix {
 public:
  mapped_matrix() : n1_(0), n2_(0) {}
  mapped_matrix(std::size_t n1, std::size_t n2) : n1_(n1), n2_(n2) {}

  T& operator()(std::size_t i, std::size_t j) {
    return data_[std::make_pair(i, j)];
  }
  T operator()(std::size_t i, std::size_t j) const {
    auto it = data_.find(std::make_pair(i, j));
    return it == data_.end() ? T() : it->second;
  }
  std::size_t size1() const { return n1_; }
  std::size_t size2() const { return n2_; }

 private:
  std::size_t n1_, n2_;
  std::map<std::pair<std::size_t, std::size_t>, T> data_;
};

}  // namespace ublas
}  // namespace numeric
}  // namespace boost
