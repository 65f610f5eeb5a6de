// Full-mode golden oracle: fills a variables_map by hand (functional
// program_options stub) and calls the reference's OWN mode entry points --
// Coring::main, Noise::main, NetworkBuilder::main, Filter::main -- so
// output files can be diffed against clustering_tpu's.
//
// usage (run inside the working directory holding the inputs):
//   modes_oracle coring  <states> <windows> <out> <wtd> <cores> <iterative01>
//   modes_oracle noise   <states> <out> <basename> <cmin> <cores>
//   modes_oracle network <minpop> <basename> <out> <min> <max> <step>
//   modes_oracle stats   <states>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <string>
#include <vector>

#include "coring.hpp"
#include "network_builder.hpp"
#include "noise.hpp"
#include "state_filter.hpp"
#include "logger.hpp"

namespace po = boost::program_options;

static std::map<std::string, float> comments_map() {
  return {{"clustering_radius", 0.f}, {"lumping_radius", 0.f},
          {"screening_from", 0.f},    {"screening_to", 0.f},
          {"screening_step", 0.f},    {"minimal_population", 0.f},
          {"cmin", 0.f},              {"single_coring_time", 0.f},
          {"limits", 0.f}};
}

int main(int argc, char** argv) {
  if (argc < 2) return 2;
  std::string mode = argv[1];
  po::variables_map args;
  args.set<std::string>("header", std::string("# oracle\n"));
  args.set<std::map<std::string, float>>("commentsMap", comments_map());
  args.set<bool>("verbose", false);
  if (mode == "coring") {
    if (argc < 8) return 2;
    args.set<std::string>("states", argv[2]);
    args.set<std::string>("windows", argv[3]);
    args.set<std::string>("output", argv[4]);
    args.set<std::string>("distribution", argv[5]);
    args.set<std::string>("cores", argv[6]);
    args.set<bool>("iterative", std::string(argv[7]) == "1");
    Clustering::Coring::main(args);
  } else if (mode == "noise") {
    if (argc < 7) return 2;
    args.set<std::string>("states", argv[2]);
    args.set<std::string>("output", argv[3]);
    args.set<std::string>("basename", argv[4]);
    args.set<float>("cmin", (float)atof(argv[5]));
    args.set<std::string>("cores", argv[6]);
    Clustering::Noise::main(args);
  } else if (mode == "network") {
    if (argc < 8) return 2;
    args.set<std::size_t>("minpop", (std::size_t)atoi(argv[2]));
    args.set<std::string>("basename", argv[3]);
    args.set<std::string>("output", argv[4]);
    args.set<float>("min", (float)atof(argv[5]));
    args.set<float>("max", (float)atof(argv[6]));
    args.set<float>("step", (float)atof(argv[7]));
    args.set<bool>("network-html", false);
    Clustering::NetworkBuilder::main(args);
  } else if (mode == "stats") {
    if (argc < 3) return 2;
    args.set<std::string>("states", argv[2]);
    args.set<bool>("list", true);
    Clustering::Filter::main(args);
  } else if (mode == "filter") {
    // filter <states> <coords> <output> <every_nth> [state ...]
    if (argc < 6) return 2;
    args.set<std::string>("states", argv[2]);
    args.set<std::string>("coords", argv[3]);
    args.set<std::string>("output", argv[4]);
    args.set<std::size_t>("every-nth", (std::size_t)atoi(argv[5]));
    args.set<bool>("list", false);
    if (argc > 6) {
      std::vector<std::size_t> sel;
      for (int i = 6; i < argc; ++i) sel.push_back(atoi(argv[i]));
      args.set<std::vector<std::size_t>>("selected-states", sel);
    }
    Clustering::Filter::main(args);
  } else {
    return 2;
  }
  return 0;
}
