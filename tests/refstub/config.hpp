// build-time configuration the reference generates via cmake
// (config.hpp.cmake.in); plain CPU build for the oracle.
#pragma once
#define DC_MEM_ALIGNMENT 32
// newer libstdc++ no longer transitively provides these
#include <limits>
#include <stdexcept>
#include <cmath>
using std::log;
using std::sqrt;
#include <set>
#include <list>
#include <sstream>
