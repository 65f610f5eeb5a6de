// Minimal functional stand-in for boost::program_options, just enough to
// COMPILE and DRIVE the reference's algorithm translation units as test
// oracles (the oracle harness fills a variables_map by hand and calls the
// reference's main(variables_map) entry points). Not a boost copy.
#pragma once
#include <cstdlib>
#include <map>
#include <memory>
#include <string>
#include <utility>

namespace boost {
namespace program_options {

class variable_value {
 public:
  variable_value() = default;
  template <typename T>
  explicit variable_value(T v)
      : data_(std::make_shared<Holder<T>>(std::move(v))) {}

  template <typename T>
  const T& as() const {
    if (!data_) {
      static T dummy{};
      return dummy;
    }
    return static_cast<Holder<T>*>(data_.get())->value;
  }

  bool empty() const { return !data_; }

 private:
  struct HolderBase {
    virtual ~HolderBase() = default;
  };
  template <typename T>
  struct Holder : HolderBase {
    explicit Holder(T v) : value(std::move(v)) {}
    T value;
  };
  std::shared_ptr<HolderBase> data_;
};

class variables_map {
 public:
  std::size_t count(const std::string& key) const {
    return values_.count(key);
  }
  const variable_value& operator[](const std::string& key) const {
    auto it = values_.find(key);
    if (it == values_.end()) {
      static variable_value empty;
      return empty;
    }
    return it->second;
  }
  template <typename T>
  void set(const std::string& key, T value) {
    values_[key] = variable_value(std::move(value));
  }

 private:
  std::map<std::string, variable_value> values_;
};

}  // namespace program_options
}  // namespace boost
