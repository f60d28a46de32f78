// Faithful CPU reproduction of the reference CDAE training loop, used to
// MEASURE the performance baseline and to provide METRIC-PARITY evidence
// (the reference repo publishes no numbers and its binary needs Eigen/Boost,
// absent here; see BASELINE.md). Mirrors
// /root/reference/src/model/recsys/cdae.hpp semantics re-implemented from
// scratch:
//   - per-user sequential SGD, one corruption per user per epoch
//     (cdae.hpp:136-146)
//   - Bernoulli mask-out corruption kept w.p. (1-q), scaled 1/(1-q)
//     (cdae.hpp:361-371, 202-205)
//   - hidden z = sigmoid(scale*sum W[kept] + b + Wu[u]) with +-18 clamps
//     (cdae.hpp:373-416)
//   - per-positive and per-negative (num_neg*|O_u| rejection-sampled)
//     AdaGrad updates of b', W rows; hidden-gradient accumulation;
//     b / Wu / input-row updates (cdae.hpp:198-358)
//   - recommend: uncorrupted hidden state, full-catalog scan, top-10
//     excluding rated (cdae.hpp:162-196)
// Plain float arrays (no Eigen temporaries) => a conservative (fast)
// stand-in for the reference's throughput.
//
// Modes:
//   baseline_cdae bench  [U I avg_degree dim seconds]
//   baseline_cdae parity train.txt test.txt [iters dim cratio num_neg lr]
// Each prints one JSON line.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <random>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

std::mt19937_64 g_rng(20141119);

inline float sigmoid_clamped(float x) {
  if (x > 18.f) return 1.f;
  if (x < -18.f) return 0.f;
  return 1.f / (1.f + std::exp(-x));
}

struct CDAEModel {
  size_t U, I, D;
  float lr, lambda, beta, cratio, scale;
  int num_neg;
  std::vector<float> W, W_ag, Wu, Wu_ag, b, b_ag, bp, bp_ag;

  CDAEModel(size_t U_, size_t I_, size_t D_, float lr_, float lambda_,
            float beta_, float cratio_, int num_neg_, bool scaled)
      : U(U_), I(I_), D(D_), lr(lr_), lambda(lambda_), beta(beta_),
        cratio(cratio_),
        scale(scaled && cratio_ < 1.f ? 1.f / (1.f - cratio_) : 1.f),
        num_neg(num_neg_), W(I * D), W_ag(I * D, 1e-4f), Wu(U * D),
        Wu_ag(U * D, 1e-4f), b(D, 0.f), b_ag(D, 1e-4f), bp(I, 0.f),
        bp_ag(I, 1e-4f) {
    float init = 4.f * std::sqrt(6.f / (float)(I + D));
    std::uniform_real_distribution<float> winit(-init, init);
    for (auto& w : W) w = winit(g_rng);
    for (auto& w : Wu) w = winit(g_rng);
  }

  void hidden(size_t u, const std::vector<int>& in_items, float in_scale,
              std::vector<float>& z) const {
    for (size_t k = 0; k < D; ++k) z[k] = b[k] + Wu[u * D + k];
    for (int it : in_items)
      for (size_t k = 0; k < D; ++k)
        z[k] += in_scale * W[(size_t)it * D + k];
    for (size_t k = 0; k < D; ++k) z[k] = sigmoid_clamped(z[k]);
  }

  void train_one_user(size_t u, const std::vector<int>& items) {
    std::uniform_real_distribution<float> unif(0.f, 1.f);
    std::uniform_int_distribution<size_t> item_dist(0, I - 1);
    std::unordered_set<int> item_set(items.begin(), items.end());
    std::vector<int> kept_ids;
    for (int it : items)
      if (unif(g_rng) > cratio) kept_ids.push_back(it);
    std::vector<float> z(D), hg(D, 0.f);
    hidden(u, kept_ids, scale, z);

    auto touch_output = [&](int o, float truth) {
      float* wo = &W[(size_t)o * D];
      float pred = bp[o];
      for (size_t k = 0; k < D; ++k) pred += wo[k] * z[k];
      float g = -2.f * (truth - pred);  // SQUARE loss gradient
      float gb = g + lambda * bp[o];
      bp_ag[o] += gb * gb;
      bp[o] -= lr * gb / (beta + std::sqrt(bp_ag[o]));
      for (size_t k = 0; k < D; ++k) hg[k] += g * wo[k];
      float* wag = &W_ag[(size_t)o * D];
      for (size_t k = 0; k < D; ++k) {
        float gw = g * z[k] + lambda * wo[k];
        wag[k] += gw * gw;
        wo[k] -= lr * gw / (beta + std::sqrt(wag[k]));
      }
    };

    for (int o : items) touch_output(o, 1.f);
    size_t nneg = (size_t)num_neg * items.size();
    for (size_t s = 0; s < nneg; ++s) {
      int j;
      do { j = (int)item_dist(g_rng); } while (item_set.count(j));
      touch_output(j, 0.f);
    }
    for (size_t k = 0; k < D; ++k) hg[k] *= z[k] * (1.f - z[k]);
    for (size_t k = 0; k < D; ++k) {
      float gb = hg[k] + lambda * b[k];
      b_ag[k] += gb * gb;
      b[k] -= lr * gb / (beta + std::sqrt(b_ag[k]));
      float gu = hg[k] + lambda * Wu[u * D + k];
      Wu_ag[u * D + k] += gu * gu;
      Wu[u * D + k] -= lr * gu / (beta + std::sqrt(Wu_ag[u * D + k]));
    }
    for (int it : kept_ids) {
      float* wi = &W[(size_t)it * D];
      float* wag = &W_ag[(size_t)it * D];
      for (size_t k = 0; k < D; ++k) {
        float gw = hg[k] * scale + lambda * wi[k];
        wag[k] += gw * gw;
        wi[k] -= lr * gw / (beta + std::sqrt(wag[k]));
      }
    }
  }

  // top-10 unrated items (heap-free partial sort; same result as the
  // reference bounded heap, cdae.hpp:162-196)
  std::vector<int> recommend(size_t u, const std::vector<int>& rated,
                             size_t topk) const {
    std::vector<float> z(D);
    hidden(u, rated, 1.f, z);  // UNcorrupted input, scale 1
    std::unordered_set<int> rated_set(rated.begin(), rated.end());
    std::vector<std::pair<float, int>> cand;
    cand.reserve(I);
    for (size_t i = 0; i < I; ++i) {
      if (rated_set.count((int)i)) continue;
      const float* wi = &W[i * D];
      float pred = bp[i];
      for (size_t k = 0; k < D; ++k) pred += wi[k] * z[k];
      cand.push_back({pred, (int)i});
    }
    size_t k = std::min(topk, cand.size());
    std::partial_sort(cand.begin(), cand.begin() + (long)k, cand.end(),
                      [](auto& a, auto& b) { return a.first > b.first; });
    std::vector<int> out(k);
    for (size_t j = 0; j < k; ++j) out[j] = cand[j].second;
    return out;
  }
};

// ---- IMF / BPR reference semantics (ref imf.hpp:57-119, bpr.hpp:56-106) ---
struct MFModel {
  size_t U, I, D;
  float lr, beta, lambda2;  // lambda2 = 2*lambda per touch
  int num_neg;
  std::vector<float> uv, iv, uv_ag, iv_ag, ub, ib, ub_ag, ib_ag;

  MFModel(size_t U_, size_t I_, size_t D_, float lr_, float beta_,
          float lambda_, int num_neg_)
      : U(U_), I(I_), D(D_), lr(lr_), beta(beta_), lambda2(2.f * lambda_),
        num_neg(num_neg_), uv(U * D), iv(I * D), uv_ag(U * D, 1e-4f),
        iv_ag(I * D, 1e-4f), ub(U, 0.f), ib(I, 0.f), ub_ag(U, 1e-4f),
        ib_ag(I, 1e-4f) {
    std::uniform_real_distribution<float> init(-0.01f, 0.01f);
    for (auto& w : uv) w = init(g_rng);
    for (auto& w : iv) w = init(g_rng);
  }

  float predict(size_t u, size_t i) const {
    float s = ub[u] + ib[i];
    for (size_t k = 0; k < D; ++k) s += uv[u * D + k] * iv[i * D + k];
    return s;
  }

  // pointwise square-loss step (ref imf.hpp:86-115)
  void imf_step(size_t u, size_t i, float truth) {
    float g = -2.f * (truth - predict(u, i));
    float gu = g + lambda2 * ub[u], gi = g + lambda2 * ib[i];
    ub_ag[u] += gu * gu;
    ib_ag[i] += gi * gi;
    ub[u] -= lr * gu / (beta + std::sqrt(ub_ag[u]));
    ib[i] -= lr * gi / (beta + std::sqrt(ib_ag[i]));
    for (size_t k = 0; k < D; ++k) {
      float gv = g * iv[i * D + k] + lambda2 * uv[u * D + k];
      float gw = g * uv[u * D + k] + lambda2 * iv[i * D + k];
      uv_ag[u * D + k] += gv * gv;
      iv_ag[i * D + k] += gw * gw;
      uv[u * D + k] -= lr * gv / (beta + std::sqrt(uv_ag[u * D + k]));
      iv[i * D + k] -= lr * gw / (beta + std::sqrt(iv_ag[i * D + k]));
    }
  }

  // pairwise LOG-loss step (ref bpr.hpp:72-106)
  void bpr_step(size_t u, size_t i, size_t j) {
    float z = predict(u, i) - predict(u, j);
    // LOG loss grad at truth 1: -1/(1+exp(z)) with ±18 clamps
    float g;
    if (z > 18.f) g = -std::exp(-z);
    else if (z < -18.f) g = -1.f;
    else g = -1.f / (1.f + std::exp(z));
    float gi = g + lambda2 * ib[i], gj = -g + lambda2 * ib[j];
    ib_ag[i] += gi * gi;
    ib_ag[j] += gj * gj;
    ib[i] -= lr * gi / (beta + std::sqrt(ib_ag[i]));
    ib[j] -= lr * gj / (beta + std::sqrt(ib_ag[j]));
    for (size_t k = 0; k < D; ++k) {
      float gv = g * (iv[i * D + k] - iv[j * D + k]) + lambda2 * uv[u * D + k];
      float gwi = g * uv[u * D + k] + lambda2 * iv[i * D + k];
      float gwj = -g * uv[u * D + k] + lambda2 * iv[j * D + k];
      uv_ag[u * D + k] += gv * gv;
      iv_ag[i * D + k] += gwi * gwi;
      iv_ag[j * D + k] += gwj * gwj;
      uv[u * D + k] -= lr * gv / (beta + std::sqrt(uv_ag[u * D + k]));
      iv[i * D + k] -= lr * gwi / (beta + std::sqrt(iv_ag[i * D + k]));
      iv[j * D + k] -= lr * gwj / (beta + std::sqrt(iv_ag[j * D + k]));
    }
  }

  std::vector<int> recommend(size_t u, const std::vector<int>& rated,
                             size_t topk) const {
    std::unordered_set<int> rated_set(rated.begin(), rated.end());
    std::vector<std::pair<float, int>> cand;
    cand.reserve(I);
    for (size_t i = 0; i < I; ++i)
      if (!rated_set.count((int)i)) cand.push_back({predict(u, i), (int)i});
    size_t k = std::min(topk, cand.size());
    std::partial_sort(cand.begin(), cand.begin() + (long)k, cand.end(),
                      [](auto& a, auto& b) { return a.first > b.first; });
    std::vector<int> out(k);
    for (size_t j = 0; j < k; ++j) out[j] = cand[j].second;
    return out;
  }
};

bool read_pairs(const char* path, std::vector<std::vector<int>>& rated,
                size_t& num_users, size_t& num_items) {
  std::ifstream f(path);
  if (!f) return false;
  size_t u, i;
  while (f >> u >> i) {
    if (u >= rated.size()) rated.resize(u + 1);
    rated[u].push_back((int)i);
    num_users = std::max(num_users, u + 1);
    num_items = std::max(num_items, i + 1);
  }
  return true;
}

int run_bench(int argc, char** argv) {
  size_t U = argc > 2 ? std::strtoul(argv[2], nullptr, 10) : 6040;
  size_t I = argc > 3 ? std::strtoul(argv[3], nullptr, 10) : 3706;
  size_t deg = argc > 4 ? std::strtoul(argv[4], nullptr, 10) : 160;
  size_t D = argc > 5 ? std::strtoul(argv[5], nullptr, 10) : 50;
  double budget_s = argc > 6 ? std::strtod(argv[6], nullptr) : 20.0;

  std::uniform_int_distribution<size_t> item_dist(0, I - 1);
  std::vector<std::vector<int>> rated(U);
  std::geometric_distribution<int> gdist(1.0 / (double)deg);
  for (size_t u = 0; u < U; ++u) {
    int n = std::min<int>(1 + gdist(g_rng), (int)I - 1);
    std::unordered_set<int> s;
    while ((int)s.size() < n) s.insert((int)item_dist(g_rng));
    rated[u].assign(s.begin(), s.end());
  }
  CDAEModel m(U, I, D, 0.1f, 0.01f, 0.f, 0.5f, 5, true);
  auto t0 = std::chrono::steady_clock::now();
  size_t users_done = 0, epochs = 0;
  double elapsed = 0;
  while (elapsed < budget_s) {
    for (size_t u = 0; u < U; ++u) {
      m.train_one_user(u, rated[u]);
      ++users_done;
    }
    ++epochs;
    elapsed = std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
  }
  std::printf(
      "{\"users_per_sec\": %.2f, \"users\": %zu, \"epochs\": %zu, "
      "\"elapsed_s\": %.2f, \"U\": %zu, \"I\": %zu, \"dim\": %zu}\n",
      users_done / elapsed, users_done, epochs, elapsed, U, I, D);
  return 0;
}

int run_parity(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: baseline_cdae parity train.txt test.txt "
                 "[iters dim cratio num_neg lr]\n");
    return 2;
  }
  size_t iters = argc > 4 ? std::strtoul(argv[4], nullptr, 10) : 50;
  size_t D = argc > 5 ? std::strtoul(argv[5], nullptr, 10) : 50;
  float cratio = argc > 6 ? std::strtof(argv[6], nullptr) : 0.5f;
  int num_neg = argc > 7 ? (int)std::strtol(argv[7], nullptr, 10) : 5;
  float lr = argc > 8 ? std::strtof(argv[8], nullptr) : 0.1f;

  std::vector<std::vector<int>> train, test;
  size_t U = 0, I = 0;
  if (!read_pairs(argv[2], train, U, I)) return 3;
  if (!read_pairs(argv[3], test, U, I)) return 3;
  train.resize(U);
  test.resize(U);

  CDAEModel m(U, I, D, lr, 0.01f, 0.f, cratio, num_neg, true);
  for (size_t it = 0; it < iters; ++it)
    for (size_t u = 0; u < U; ++u)
      if (!train[u].empty()) m.train_one_user(u, train[u]);

  // TOPN evaluation: R@10 + MAP@10 over validation users
  // (ref evaluation.hpp:183-218)
  double recall_sum = 0, map_sum = 0;
  size_t val_users = 0;
  for (size_t u = 0; u < U; ++u) {
    if (test[u].empty()) continue;
    ++val_users;
    std::unordered_set<int> truth(test[u].begin(), test[u].end());
    auto rec = m.recommend(u, train[u], 10);
    double hits = 0, ap = 0;
    for (size_t r = 0; r < rec.size(); ++r) {
      if (truth.count(rec[r])) {
        hits += 1;
        ap += hits / (double)(r + 1);
      }
    }
    recall_sum += hits / (double)truth.size();
    map_sum += ap / std::min<double>(10.0, (double)truth.size());
  }
  std::printf(
      "{\"recall_at_10\": %.5f, \"map_at_10\": %.5f, \"val_users\": %zu, "
      "\"U\": %zu, \"I\": %zu, \"iters\": %zu, \"dim\": %zu}\n",
      recall_sum / (double)val_users, map_sum / (double)val_users, val_users,
      U, I, iters, D);
  return 0;
}

// parity_mf <MF|BPR> train.txt test.txt [iters dim num_neg lr]
int run_parity_mf(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: baseline_cdae parity_mf <MF|BPR> train.txt test.txt "
                 "[iters dim num_neg lr]\n");
    return 2;
  }
  bool pairwise = std::strcmp(argv[2], "BPR") == 0;
  size_t iters = argc > 5 ? std::strtoul(argv[5], nullptr, 10) : 30;
  size_t D = argc > 6 ? std::strtoul(argv[6], nullptr, 10) : 10;
  int num_neg = argc > 7 ? (int)std::strtol(argv[7], nullptr, 10) : 5;
  float lr = argc > 8 ? std::strtof(argv[8], nullptr) : 0.1f;

  std::vector<std::vector<int>> train, test;
  size_t U = 0, I = 0;
  if (!read_pairs(argv[3], train, U, I)) return 3;
  if (!read_pairs(argv[4], test, U, I)) return 3;
  train.resize(U);
  test.resize(U);

  MFModel m(U, I, D, lr, 1.f, 0.01f, num_neg);
  std::uniform_int_distribution<size_t> item_dist(0, I - 1);
  for (size_t it = 0; it < iters; ++it) {
    for (size_t u = 0; u < U; ++u) {
      std::unordered_set<int> item_set(train[u].begin(), train[u].end());
      for (int i : train[u]) {
        if (pairwise) {
          for (int s = 0; s < num_neg; ++s) {
            int j;
            do { j = (int)item_dist(g_rng); } while (item_set.count(j));
            m.bpr_step(u, (size_t)i, (size_t)j);
          }
        } else {
          m.imf_step(u, (size_t)i, 1.f);  // SQUARE positive label
          for (int s = 0; s < num_neg; ++s) {
            int j;
            do { j = (int)item_dist(g_rng); } while (item_set.count(j));
            m.imf_step(u, (size_t)j, 0.f);
          }
        }
      }
    }
  }

  double recall_sum = 0, map_sum = 0;
  size_t val_users = 0;
  for (size_t u = 0; u < U; ++u) {
    if (test[u].empty()) continue;
    ++val_users;
    std::unordered_set<int> truth(test[u].begin(), test[u].end());
    auto rec = m.recommend(u, train[u], 10);
    double hits = 0, ap = 0;
    for (size_t r = 0; r < rec.size(); ++r) {
      if (truth.count(rec[r])) {
        hits += 1;
        ap += hits / (double)(r + 1);
      }
    }
    recall_sum += hits / (double)truth.size();
    map_sum += ap / std::min<double>(10.0, (double)truth.size());
  }
  std::printf(
      "{\"recall_at_10\": %.5f, \"map_at_10\": %.5f, \"val_users\": %zu, "
      "\"method\": \"%s\", \"iters\": %zu, \"dim\": %zu}\n",
      recall_sum / (double)val_users, map_sum / (double)val_users, val_users,
      pairwise ? "BPR" : "MF", iters, D);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc > 1 && std::strcmp(argv[1], "parity") == 0)
    return run_parity(argc, argv);
  if (argc > 1 && std::strcmp(argv[1], "parity_mf") == 0)
    return run_parity_mf(argc, argv);
  if (argc > 1 && std::strcmp(argv[1], "bench") == 0)
    return run_bench(argc, argv);
  // legacy positional form: treat argv as bench args shifted by one
  std::vector<char*> shifted;
  shifted.push_back(argv[0]);
  shifted.push_back(const_cast<char*>("bench"));
  for (int i = 1; i < argc; ++i) shifted.push_back(argv[i]);
  return run_bench((int)shifted.size(), shifted.data());
}
