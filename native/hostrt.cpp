// Host-side native runtime for the TPU exploration framework.
//
// The accelerator owns all dense math (JAX/XLA/Pallas); what remains on the
// host is pointer-chasing control flow the reference implements in C++:
// the RRT tree builder (EMPlanner2D sampling loops,
// /root/reference/src/em_exploration/Planner2D.cpp:101-276,838-935,1043-1128)
// and its Halton sampler (/root/reference/src/halton/halton.cpp).  This
// library is the native implementation of that runtime, exposed through a
// plain C ABI for ctypes (no pybind11 in this image).
//
// Build:  make -C native        ->  native/libhostrt.so

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kPrimes[12] = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37};

double radical_inverse(int64_t index, int base) {
  double r = 0.0;
  double scale = 1.0;
  while (index > 0) {
    scale /= base;
    r += scale * static_cast<double>(index % base);
    index /= base;
  }
  return r;
}

inline double wrap_angle(double t) { return std::atan2(std::sin(t), std::cos(t)); }

}  // namespace

extern "C" {

// Fill out[count * dim] with consecutive Halton points starting at `start`.
void halton_batch(int64_t start, int64_t count, int dim, double* out) {
  if (dim > 12) dim = 12;
  for (int64_t i = 0; i < count; ++i)
    for (int d = 0; d < dim; ++d)
      out[i * dim + d] = radical_inverse(start + i, kPrimes[d]);
}

// Grow an RRT with the reference's control flow.
//
// Inputs:
//   root[3]                  root pose (x, y, theta)
//   landmarks[n_lm * 2]      estimated landmark positions
//   n_lm                     number of landmarks
//   bounds[4]                min_x, max_x, min_y, max_y (map frame)
//   safe_distance            rejection / segment-clearance radius
//   max_edge_length          edge clamp
//   angle_weight             nearest metric: range^2 + (aw * bearing)^2
//   max_nodes                sampling budget (non-goal mode)
//   goal[2] or nullptr       goal-directed mode: stop when within
//                            max_edge_length of the goal and attach it
//   halton_start             starting Halton index (in/out: advanced)
//   cap                      capacity of the output arrays
// Outputs:
//   poses[cap * 3], parent[cap], distance[cap]
// Returns: number of nodes (>= 1), or -1 on sampling failure.
int64_t rrt_grow(const double* root, const double* landmarks, int64_t n_lm,
                 const double* bounds, double safe_distance,
                 double max_edge_length, double angle_weight,
                 int64_t max_nodes, const double* goal, int64_t* halton_start,
                 int64_t cap, double* poses, int64_t* parent,
                 double* distance) {
  const double min_x = bounds[0], max_x = bounds[1];
  const double min_y = bounds[2], max_y = bounds[3];

  // initial safe-distance relaxation (Planner2D.cpp:1046-1054)
  double safe = safe_distance;
  if (n_lm > 0) {
    double dmin = 1e30;
    for (int64_t j = 0; j < n_lm; ++j) {
      double dx = landmarks[2 * j] - root[0];
      double dy = landmarks[2 * j + 1] - root[1];
      double d = std::sqrt(dx * dx + dy * dy);
      if (d < dmin) dmin = d;
    }
    if (dmin < safe) safe = dmin - 0.1 > 0.0 ? dmin - 0.1 : 0.0;
  }

  auto clear_of_landmarks = [&](double x, double y) -> bool {
    for (int64_t j = 0; j < n_lm; ++j) {
      double dx = landmarks[2 * j] - x;
      double dy = landmarks[2 * j + 1] - y;
      if (std::sqrt(dx * dx + dy * dy) < safe) return false;
    }
    return true;
  };

  std::memcpy(poses, root, 3 * sizeof(double));
  parent[0] = -1;
  distance[0] = 0.0;
  int64_t n = 1;

  int64_t num_nodes = 0;
  int64_t failed = 0;
  int64_t h = *halton_start;

  while (true) {
    if (goal == nullptr && num_nodes >= max_nodes) break;
    if (n >= cap - 1) break;

    // --- sampleNode (Planner2D.cpp:101-125) -----------------------------
    double sx = 0, sy = 0, stheta = 0;
    bool sampled = false;
    for (int tries = 0; tries <= 1000; ++tries) {
      double u0 = radical_inverse(h, 2);
      double u1 = radical_inverse(h, 3);
      double u2 = radical_inverse(h, 5);
      ++h;
      sx = min_x + u0 * (max_x - min_x);
      sy = min_y + u1 * (max_y - min_y);
      stheta = u2 * 2.0 * M_PI;
      if (clear_of_landmarks(sx, sy)) {
        sampled = true;
        break;
      }
    }
    if (!sampled) {
      *halton_start = h;
      return -1;
    }

    // --- nearestNode (Distance.cpp metric) ------------------------------
    int64_t p_idx = 0;
    double best = 1e30;
    for (int64_t i = 0; i < n; ++i) {
      double dx = sx - poses[3 * i];
      double dy = sy - poses[3 * i + 1];
      double rng2 = dx * dx + dy * dy;
      double bearing =
          wrap_angle(std::atan2(dy, dx) - poses[3 * i + 2]);
      double d = rng2 + (angle_weight * bearing) * (angle_weight * bearing);
      if (d < best) {
        best = d;
        p_idx = i;
      }
    }

    // --- connectNode (Planner2D.cpp:179-265) ----------------------------
    const double ox = poses[3 * p_idx], oy = poses[3 * p_idx + 1],
                 ot = poses[3 * p_idx + 2];
    double c = std::cos(ot), s = std::sin(ot);
    double ldx = c * (sx - ox) + s * (sy - oy);
    double ldy = -s * (sx - ox) + c * (sy - oy);
    double d = std::sqrt(ldx * ldx + ldy * ldy);
    double angle = std::atan2(ldy, ldx);
    double step = d < max_edge_length ? d : max_edge_length;
    // new pose = origin * Pose2(Rot2(angle), step * (cos a, sin a))
    double nx = ox + c * (step * std::cos(angle)) - s * (step * std::sin(angle));
    double ny = oy + s * (step * std::cos(angle)) + c * (step * std::sin(angle));
    double nt = wrap_angle(ot + angle);

    // segment safety (Planner2D.cpp:58-86)
    bool seg_safe = true;
    if (std::fabs(safe) >= 1e-3 && n_lm > 0) {
      double segd = std::sqrt((nx - ox) * (nx - ox) + (ny - oy) * (ny - oy));
      if (segd > 1e-12) {
        double ux = (ox - nx) / segd, uy = (oy - ny) / segd;
        for (double l = safe / 2; l < segd; l += safe / 2) {
          if (!clear_of_landmarks(nx + l * ux, ny + l * uy)) {
            seg_safe = false;
            break;
          }
        }
      }
    }
    if (!seg_safe) {
      if (++failed > 1000) {
        *halton_start = h;
        return -1;
      }
      continue;
    }
    failed = 0;

    poses[3 * n] = nx;
    poses[3 * n + 1] = ny;
    poses[3 * n + 2] = nt;
    parent[n] = p_idx;
    {
      double dxn = nx - ox, dyn = ny - oy;
      double rng2 = dxn * dxn + dyn * dyn;
      double bearing = wrap_angle(std::atan2(dyn, dxn) - ot);
      distance[n] = distance[p_idx] +
                    std::sqrt(rng2 + (angle_weight * bearing) *
                                         (angle_weight * bearing));
    }
    ++n;
    ++num_nodes;

    if (goal != nullptr) {
      double gdx = nx - goal[0], gdy = ny - goal[1];
      if (std::sqrt(gdx * gdx + gdy * gdy) <= max_edge_length) {
        // attach the goal node (Planner2D.cpp:910-920)
        double lgx = 0, lgy = 0;  // recompute in the new node frame
        double nc = std::cos(nt), ns = std::sin(nt);
        lgx = nc * (goal[0] - nx) + ns * (goal[1] - ny);
        lgy = -ns * (goal[0] - nx) + nc * (goal[1] - ny);
        double ga = std::atan2(lgy, lgx);
        double gd = std::sqrt(lgx * lgx + lgy * lgy);
        if (gd > max_edge_length) gd = max_edge_length;
        double gx = nx + nc * (gd * std::cos(ga)) - ns * (gd * std::sin(ga));
        double gy = ny + ns * (gd * std::cos(ga)) + nc * (gd * std::sin(ga));
        // the goal edge is safety-vetted like any other (connectNode's
        // isSafe applies to it upstream); an unsafe goal edge keeps growing
        bool gsafe = true;
        if (std::fabs(safe) >= 1e-3 && n_lm > 0) {
          double segd =
              std::sqrt((gx - nx) * (gx - nx) + (gy - ny) * (gy - ny));
          if (segd > 1e-12) {
            double ux = (nx - gx) / segd, uy = (ny - gy) / segd;
            for (double l = safe / 2; l < segd; l += safe / 2) {
              if (!clear_of_landmarks(gx + l * ux, gy + l * uy)) {
                gsafe = false;
                break;
              }
            }
          }
        }
        if (gsafe) {
          poses[3 * n] = gx;
          poses[3 * n + 1] = gy;
          poses[3 * n + 2] = wrap_angle(nt + ga);
          parent[n] = n - 1;
          distance[n] = distance[n - 1] + gd;
          ++n;
          *halton_start = h;
          return n;
        }
      }
    }
  }
  *halton_start = h;
  return n;
}

}  // extern "C"
