// boost::filesystem stand-in delegating to std::filesystem -- enough for
// the reference's noise/network directory handling. Not a boost copy.
#pragma once
#include <filesystem>

namespace boost {
namespace filesystem {

using path = std::filesystem::path;
using directory_iterator = std::filesystem::directory_iterator;

inline path current_path() { return std::filesystem::current_path(); }
inline bool exists(const path& p) { return std::filesystem::exists(p); }

}  // namespace filesystem
}  // namespace boost
