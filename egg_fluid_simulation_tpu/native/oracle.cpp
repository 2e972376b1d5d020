// Native sequential oracle: the reference solver's exact step semantics in C++.
//
// This is the framework's golden-model engine for fidelity gating and for
// fast golden-trajectory generation (the pure-Python oracle in tests/oracle.py
// is ~100x slower, which caps how many particles/steps the trajectory-envelope
// tests can afford). Semantics follow /root/reference/simulation_handler.lua:
//
//   - damped velocity integration + mass/radius re-derivation   (:1393-1432)
//   - XPBD follow constraint with 2*sqrt(batch_radius) dead zone (:1435-1471)
//   - per-pass spatial hash over floor(pos/cell) cells           (:1486-1511)
//   - sequential Gauss-Seidel pair projection in particle order,
//     unique-pair dedup, ordered 0.05*n^2 examined-pair budget   (:1548-1666)
//   - literal (inert) same-batch cohesion branch                 (:1603-1630)
//   - velocity = (x - prev)/dt                                   (:1669-1718)
//
// Exposed as a C ABI for ctypes; one population per call (white and yolk never
// interact, reference :1821-1932 runs them back to back).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 oracle.cpp -o liboracle.so
// (done automatically by egg_fluid_simulation_tpu/native/__init__.py)

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr double kEps = 1e-8;  // reference math.lua:2

struct CellKey {
  int64_t x, y;
  bool operator==(const CellKey& o) const { return x == o.x && y == o.y; }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    return std::hash<int64_t>()(k.x * 73856093LL ^ k.y * 19349663LL);
  }
};

inline double mix(double a, double b, double t) { return a * (1 - t) + b * t; }

inline double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

struct Config {
  double damping;
  double follow_strength;
  double cohesion_strength;
  double cohesion_factor;
  double collision_strength;
  double collision_overlap_factor;
  double min_mass, max_mass;
  double min_radius, max_radius;
};

struct Population {
  int n = 0;
  std::vector<double> x, y, px, py, vx, vy, radius, mass_t, inv_mass;
  std::vector<int32_t> batch;
  std::vector<int64_t> cell_x, cell_y;
  std::unordered_map<CellKey, std::vector<int>, CellHash> hash;
  std::unordered_set<uint64_t> collided;
};

double compliance(double strength, double sub_dt) {
  return (1.0 - clampd(strength, 0.0, 1.0)) / (sub_dt * sub_dt);
}

void pre_solve(Population& p, const Config& c, double dt) {
  const double damp = 1.0 - clampd(c.damping, 0.0, 1.0);
  for (int i = 0; i < p.n; ++i) {
    p.px[i] = p.x[i];
    p.py[i] = p.y[i];
    p.vx[i] *= damp;
    p.vy[i] *= damp;
    p.x[i] += dt * p.vx[i];
    p.y[i] += dt * p.vy[i];
    const double mass = std::max(mix(c.min_mass, c.max_mass, p.mass_t[i]), 1e-12);
    p.inv_mass[i] = 1.0 / mass;
    p.radius[i] = mix(c.min_radius, c.max_radius, p.mass_t[i]);
  }
}

void follow(Population& p, const Config& c, const double* targets /* (B,2) */,
            const double* follow_radius /* (B,) sqrt(batch_radius) */,
            double sub_dt) {
  const double comp = compliance(c.follow_strength, sub_dt);
  for (int i = 0; i < p.n; ++i) {
    const int b = p.batch[i];
    const double fx = targets[2 * b], fy = targets[2 * b + 1];
    const double target_d = 2.0 * follow_radius[b];
    const double dx = fx - p.x[i], dy = fy - p.y[i];
    const double dist = std::sqrt(dx * dx + dy * dy);
    const double w = p.inv_mass[i];
    if (w > kEps && dist > target_d && dist >= kEps) {
      const double dl = (dist - target_d) / (w + comp);
      p.x[i] += dx / dist * dl * w;
      p.y[i] += dy / dist * dl * w;
    }
  }
}

double cell_size_of(const Config& c) {
  const double f = std::max(c.collision_overlap_factor, c.cohesion_factor);
  return std::max(1.0, c.max_radius * f);  // reference :1756-1760
}

void rebuild_hash(Population& p, double cell) {
  for (int i = 0; i < p.n; ++i) {
    const int64_t cx = (int64_t)std::floor(p.x[i] / cell);
    const int64_t cy = (int64_t)std::floor(p.y[i] / cell);
    p.cell_x[i] = cx;
    p.cell_y[i] = cy;
    p.hash[CellKey{cx, cy}].push_back(i);
  }
}

// reference _enforce_distance (:1514-1545); writes corrections in place
inline void enforce(Population& p, int i, int j, double target, double comp) {
  double dx = p.x[j] - p.x[i];
  double dy = p.y[j] - p.y[i];
  const double dist = std::sqrt(dx * dx + dy * dy);
  if (dist < kEps) {
    dx = dy = 0.0;
  } else {
    dx /= dist;
    dy /= dist;
  }
  const double viol = dist - target;
  const double divisor = p.inv_mass[i] + p.inv_mass[j] + comp;
  if (divisor < kEps) return;
  double corr = -viol / divisor;
  const double m = std::fabs(viol);
  corr = clampd(corr, -m, m);
  p.x[i] += -dx * corr * p.inv_mass[i];
  p.y[i] += -dy * corr * p.inv_mass[i];
  p.x[j] += dx * corr * p.inv_mass[j];
  p.y[j] += dy * corr * p.inv_mass[j];
}

void solve_collision(Population& p, const Config& c, double sub_dt) {
  const double coll_c = compliance(c.collision_strength, sub_dt);
  const double coh_c = compliance(c.cohesion_strength, sub_dt);
  const double max_n = 0.05 * (double)p.n * (double)p.n;  // :1749-1753
  double n_collided = 0;
  for (int i = 0; i < p.n; ++i) {
    const int64_t cx = p.cell_x[i], cy = p.cell_y[i];
    for (int ox = -1; ox <= 1; ++ox) {
      for (int oy = -1; oy <= 1; ++oy) {
        auto it = p.hash.find(CellKey{cx + ox, cy + oy});
        if (it == p.hash.end()) continue;
        for (int j : it->second) {
          if (i == j) continue;
          const uint64_t key =
              ((uint64_t)std::min(i, j) << 32) | (uint32_t)std::max(i, j);
          if (!p.collided.insert(key).second) continue;
          if (p.inv_mass[i] + p.inv_mass[j] < kEps) continue;

          // cohesion — literal reference semantics (:1603-1630): same-batch
          // interaction distance is 0, so this only fires for coincident
          // particles where the zero direction makes the correction 0
          if (p.batch[i] == p.batch[j]) {
            const double ddx = p.x[j] - p.x[i], ddy = p.y[j] - p.y[i];
            if (ddx * ddx + ddy * ddy <= 0.0) enforce(p, i, j, 0.0, coh_c);
          }
          // collision (:1632-1654)
          const double min_d =
              c.collision_overlap_factor * (p.radius[i] + p.radius[j]);
          const double ddx = p.x[j] - p.x[i], ddy = p.y[j] - p.y[i];
          if (ddx * ddx + ddy * ddy <= min_d * min_d)
            enforce(p, i, j, min_d, coll_c);

          n_collided += 1;
          if (n_collided >= max_n) return;  // :1656-1658
        }
      }
    }
  }
}

void post_solve(Population& p, double dt) {
  for (int i = 0; i < p.n; ++i) {
    p.vx[i] = (p.x[i] - p.px[i]) / dt;
    p.vy[i] = (p.y[i] - p.py[i]) / dt;
  }
}

}  // namespace

extern "C" {

// One whole fixed step for one population (n_substeps x [pre, follow,
// n_collision_steps x (hash rebuild + GS pair pass), post]).
// Arrays are (n,) doubles unless noted; targets (n_batches, 2); batch ids
// index targets/follow_radius. clean_hash!=0 clears the hash + pair set
// before every pass (the reference leaks them across substeps, SURVEY §5.2).
void oracle_step(double* x, double* y, double* px, double* py, double* vx,
                 double* vy, double* radius, double* mass_t, double* inv_mass,
                 const int32_t* batch, int n, const double* cfg10,
                 const double* targets, const double* follow_radius,
                 double delta, int n_substeps, int n_collision_steps,
                 int clean_hash) {
  Config c{cfg10[0], cfg10[1], cfg10[2], cfg10[3], cfg10[4],
           cfg10[5], cfg10[6], cfg10[7], cfg10[8], cfg10[9]};
  Population p;
  p.n = n;
  auto adopt = [n](double* src) { return std::vector<double>(src, src + n); };
  p.x = adopt(x); p.y = adopt(y); p.px = adopt(px); p.py = adopt(py);
  p.vx = adopt(vx); p.vy = adopt(vy); p.radius = adopt(radius);
  p.mass_t = adopt(mass_t); p.inv_mass = adopt(inv_mass);
  p.batch.assign(batch, batch + n);
  p.cell_x.resize(n);
  p.cell_y.resize(n);

  const double sub_dt = std::max(delta / n_substeps, kEps);  // :1723
  const double cell = cell_size_of(c);

  p.hash.clear();
  p.collided.clear();
  for (int s = 0; s < n_substeps; ++s) {
    pre_solve(p, c, sub_dt);
    follow(p, c, targets, follow_radius, sub_dt);
    for (int ci = 0; ci < n_collision_steps; ++ci) {
      if (clean_hash) {
        p.hash.clear();
        p.collided.clear();
      }
      rebuild_hash(p, cell);
      solve_collision(p, c, sub_dt);
      if (!clean_hash && ci < n_collision_steps - 1) {  // reference :1905-1912
        p.hash.clear();
        p.collided.clear();
      }
    }
    post_solve(p, sub_dt);
  }

  std::copy(p.x.begin(), p.x.end(), x);
  std::copy(p.y.begin(), p.y.end(), y);
  std::copy(p.px.begin(), p.px.end(), px);
  std::copy(p.py.begin(), p.py.end(), py);
  std::copy(p.vx.begin(), p.vx.end(), vx);
  std::copy(p.vy.begin(), p.vy.end(), vy);
  std::copy(p.radius.begin(), p.radius.end(), radius);
  std::copy(p.inv_mass.begin(), p.inv_mass.end(), inv_mass);
}

int oracle_abi_version() { return 1; }

}  // extern "C"
