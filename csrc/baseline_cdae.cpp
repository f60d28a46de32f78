// Faithful CPU reproduction of the reference CDAE training hot loop, used to
// MEASURE the performance baseline (the reference repo publishes no numbers;
// see BASELINE.md). Mirrors /root/reference/src/model/recsys/cdae.hpp
// semantics re-implemented from scratch:
//   - per-user sequential SGD, one corruption per user per epoch
//     (cdae.hpp:136-146)
//   - Bernoulli mask-out corruption kept w.p. (1-q), scaled 1/(1-q)
//     (cdae.hpp:361-371, 202-205)
//   - hidden z = sigmoid(scale*sum W[kept] + b + Wu[u]) with +-18 clamps
//     (cdae.hpp:373-416)
//   - per-positive and per-negative (num_neg*|O_u| rejection-sampled)
//     AdaGrad updates of b', W rows; hidden-gradient accumulation;
//     b / Wu / input-row updates (cdae.hpp:198-358)
// Implementation uses plain float arrays (no Eigen temporaries), so it is a
// conservative (fast) stand-in for the reference's throughput.
//
// Usage: baseline_cdae [num_users] [num_items] [avg_degree] [dim] [seconds]
// Prints one JSON line {"users_per_sec": X, ...}.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <unordered_set>
#include <vector>

static inline float sigmoid_clamped(float x) {
  if (x > 18.f) return 1.f;
  if (x < -18.f) return 0.f;
  return 1.f / (1.f + std::exp(-x));
}

int main(int argc, char** argv) {
  size_t U = argc > 1 ? std::strtoul(argv[1], nullptr, 10) : 6040;
  size_t I = argc > 2 ? std::strtoul(argv[2], nullptr, 10) : 3706;
  size_t deg = argc > 3 ? std::strtoul(argv[3], nullptr, 10) : 160;
  size_t D = argc > 4 ? std::strtoul(argv[4], nullptr, 10) : 50;
  double budget_s = argc > 5 ? std::strtod(argv[5], nullptr) : 20.0;

  const float lr = 0.1f, lambda = 0.01f, beta = 0.f;
  const float cratio = 0.5f, scale = 1.f / (1.f - cratio);
  const int num_neg = 5;

  std::mt19937_64 rng(20141119);
  std::uniform_real_distribution<float> unif(0.f, 1.f);
  std::uniform_int_distribution<size_t> item_dist(0, I - 1);

  // synthetic per-user rated sets (skewed sizes like real data)
  std::vector<std::vector<int>> rated(U);
  std::geometric_distribution<int> gdist(1.0 / (double)deg);
  for (size_t u = 0; u < U; ++u) {
    int n = std::min<int>(1 + gdist(rng), (int)I - 1);
    std::unordered_set<int> s;
    while ((int)s.size() < n) s.insert((int)item_dist(rng));
    rated[u].assign(s.begin(), s.end());
  }

  float init = 4.f * std::sqrt(6.f / (float)(I + D));
  std::uniform_real_distribution<float> winit(-init, init);
  std::vector<float> W(I * D), W_ag(I * D, 1e-4f);
  std::vector<float> Wu(U * D), Wu_ag(U * D, 1e-4f);
  std::vector<float> b(D, 0.f), b_ag(D, 1e-4f);
  std::vector<float> bp(I, 0.f), bp_ag(I, 1e-4f);
  for (auto& w : W) w = winit(rng);
  for (auto& w : Wu) w = winit(rng);

  std::vector<float> z(D), hg(D), kept;
  std::vector<int> kept_ids;
  kept_ids.reserve(4096);

  auto t0 = std::chrono::steady_clock::now();
  size_t users_done = 0, epochs = 0;
  double elapsed = 0;
  while (elapsed < budget_s) {
    for (size_t u = 0; u < U; ++u) {
      auto& items = rated[u];
      std::unordered_set<int> item_set(items.begin(), items.end());
      // corruption (cdae.hpp:361-371)
      kept_ids.clear();
      for (int it : items)
        if (unif(rng) > cratio) kept_ids.push_back(it);
      // hidden forward (cdae.hpp:373-416)
      for (size_t k = 0; k < D; ++k) z[k] = b[k] + Wu[u * D + k];
      for (int it : kept_ids)
        for (size_t k = 0; k < D; ++k) z[k] += scale * W[it * D + k];
      for (size_t k = 0; k < D; ++k) z[k] = sigmoid_clamped(z[k]);
      std::fill(hg.begin(), hg.end(), 0.f);

      auto touch_output = [&](int o, float truth) {
        float* wo = &W[o * D];
        float pred = bp[o];
        for (size_t k = 0; k < D; ++k) pred += wo[k] * z[k];
        float g = -2.f * (truth - pred);  // SQUARE loss gradient
        // b' update (cdae.hpp:231-236)
        float gb = g + lambda * bp[o];
        bp_ag[o] += gb * gb;
        bp[o] -= lr * gb / (beta + std::sqrt(bp_ag[o]));
        // hidden grad + W row update (cdae.hpp:240-257)
        for (size_t k = 0; k < D; ++k) hg[k] += g * wo[k];
        float* wag = &W_ag[o * D];
        for (size_t k = 0; k < D; ++k) {
          float gw = g * z[k] + lambda * wo[k];
          wag[k] += gw * gw;
          wo[k] -= lr * gw / (beta + std::sqrt(wag[k]));
        }
      };

      for (int o : items) touch_output(o, 1.f);
      size_t nneg = num_neg * items.size();
      for (size_t s = 0; s < nneg; ++s) {
        int j;
        do { j = (int)item_dist(rng); } while (item_set.count(j));
        touch_output(j, 0.f);
      }
      // activation derivative (cdae.hpp:208-215)
      for (size_t k = 0; k < D; ++k) hg[k] *= z[k] * (1.f - z[k]);
      // b and Wu updates (cdae.hpp:301-331)
      for (size_t k = 0; k < D; ++k) {
        float gb = hg[k] + lambda * b[k];
        b_ag[k] += gb * gb;
        b[k] -= lr * gb / (beta + std::sqrt(b_ag[k]));
        float gu = hg[k] + lambda * Wu[u * D + k];
        Wu_ag[u * D + k] += gu * gu;
        Wu[u * D + k] -= lr * gu / (beta + std::sqrt(Wu_ag[u * D + k]));
      }
      // input-side updates for kept rows (cdae.hpp:333-349)
      for (int it : kept_ids) {
        float* wi = &W[it * D];
        float* wag = &W_ag[it * D];
        for (size_t k = 0; k < D; ++k) {
          float gw = hg[k] * scale + lambda * wi[k];
          wag[k] += gw * gw;
          wi[k] -= lr * gw / (beta + std::sqrt(wag[k]));
        }
      }
      ++users_done;
    }
    ++epochs;
    elapsed = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  }
  double ups = users_done / elapsed;
  std::printf(
      "{\"users_per_sec\": %.2f, \"users\": %zu, \"epochs\": %zu, "
      "\"elapsed_s\": %.2f, \"U\": %zu, \"I\": %zu, \"dim\": %zu}\n",
      ups, users_done, epochs, elapsed, U, I, D);
  return 0;
}
