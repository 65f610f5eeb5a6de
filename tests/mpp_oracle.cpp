// Golden-parity oracle for MPP: drives the reference's own mpp.cpp
// (compiled from /root/reference with minimal stubs).
//
// usage:
//   mpp_oracle <states.dat> <fe.dat> <lag> <qmin1> [qmin2 ...]
// prints, per qmin: "# q <value>" then the lumped trajectory, then
// "# transitions" with "from to qmin" lines at the end.
#include <cstdio>
#include <cstdlib>
#include <map>
#include <set>
#include <string>
#include <vector>

#include "mpp.hpp"
#include "tools.hpp"

using namespace Clustering;

int main(int argc, char** argv) {
  if (argc < 5) return 2;
  std::vector<std::size_t> traj =
      Tools::read_clustered_trajectory(argv[1]);
  std::vector<float> fe = Tools::read_free_energies(argv[2]);
  std::size_t lag = atoi(argv[3]);
  std::size_t n_frames = traj.size();
  std::vector<std::size_t> concat_limits = {n_frames};
  auto names = std::set<std::size_t>(traj.begin(), traj.end());
  MPP::SparseMatrixF trans_prob =
      MPP::row_normalized_transition_probabilities(
          MPP::transition_counts(traj, concat_limits, lag, 0), names);
  std::map<std::size_t, std::pair<std::size_t, float>> transitions;
  for (int a = 4; a < argc; ++a) {
    float q_min = atof(argv[a]);
    auto result = MPP::fixed_metastability_clustering(traj, trans_prob,
                                                      q_min, fe);
    traj = std::get<0>(result);
    trans_prob = std::get<2>(result);
    printf("# q %g\n", q_min);
    for (std::size_t s : traj) printf("%zu\n", s);
    for (auto& ft : std::get<1>(result))
      transitions[ft.first] = {ft.second, q_min};
  }
  printf("# transitions\n");
  for (auto& t : transitions)
    printf("%zu %zu %g\n", t.first, t.second.first, t.second.second);
  return 0;
}
