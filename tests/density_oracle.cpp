// Golden-parity oracle: drives the *reference's own* CPU density-clustering
// code (compiled from /root/reference with a minimal program_options stub)
// so clustering_tpu results can be compared against the genuine article.
//
// usage:
//   density_oracle pops   <coords.dat> <r1> [r2 ...]      -> counts per line
//   density_oracle nn     <coords.dat> <fe.dat>           -> 4 cols per line
//   density_oracle screen <coords.dat> <fe.dat> <t1> [t2 ...]
//        -> one clustering per threshold (seeded in sequence), blocks
//           separated by lines "# t <value>"
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "density_clustering.hpp"
#include "density_clustering_common.hpp"
#include "tools.hpp"

using namespace Clustering;

int main(int argc, char** argv) {
  if (argc < 3) return 2;
  std::string mode = argv[1];
  float* coords;
  std::size_t n_rows, n_cols;
  std::tie(coords, n_rows, n_cols) =
      Tools::read_coords<float>(argv[2], {});
  if (mode == "pops") {
    std::vector<float> radii;
    for (int i = 3; i < argc; ++i) radii.push_back(atof(argv[i]));
    auto pops = Density::calculate_populations(coords, n_rows, n_cols,
                                               radii);
    for (float r : radii) {
      printf("# r %g\n", r);
      for (std::size_t i = 0; i < n_rows; ++i)
        printf("%zu\n", pops[r][i]);
    }
  } else if (mode == "nn") {
    std::vector<float> fe = Tools::read_free_energies(argv[3]);
    auto nh_tuple = Density::nearest_neighbors(coords, n_rows, n_cols, fe);
    Density::Neighborhood nh = std::get<0>(nh_tuple);
    Density::Neighborhood nhhd = std::get<1>(nh_tuple);
    for (std::size_t i = 0; i < n_rows; ++i)
      printf("%zu %.9g %zu %.9g\n", nh[i].first, nh[i].second,
             nhhd[i].first, nhhd[i].second);
  } else if (mode == "screen") {
    std::vector<float> fe = Tools::read_free_energies(argv[3]);
    auto nh_tuple = Density::nearest_neighbors(coords, n_rows, n_cols, fe);
    Density::Neighborhood nh = std::get<0>(nh_tuple);
    std::vector<std::size_t> clustering;
    for (int i = 4; i < argc; ++i) {
      float t = atof(argv[i]);
      clustering = Density::screening(fe, nh, t, coords, n_rows, n_cols,
                                      clustering);
      printf("# t %g\n", t);
      for (std::size_t j = 0; j < n_rows; ++j)
        printf("%zu\n", clustering[j]);
    }
  } else {
    return 2;
  }
  Tools::free_coords(coords);
  return 0;
}
