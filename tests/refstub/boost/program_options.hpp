// Minimal stand-in for boost::program_options, just enough to COMPILE the
// reference's algorithm translation units for use as a test oracle (their
// main() functions are compiled but never called). Not a boost copy.
#pragma once
#include <map>
#include <string>
#include <cstdlib>

namespace boost {
namespace program_options {

class variable_value {
 public:
  template <typename T>
  const T& as() const {
    static T dummy{};
    return dummy;
  }
};

class variables_map {
 public:
  std::size_t count(const std::string&) const { return 0; }
  const variable_value& operator[](const std::string&) const {
    static variable_value v;
    return v;
  }
};

}  // namespace program_options
}  // namespace boost
