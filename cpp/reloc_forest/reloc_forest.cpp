// reloc_forest: backtracking decision-tree regression (BTDTR) relocalizer.
//
// Native-C++ parity component for the reference's only first-party native
// module (`slam_system/rf_map/`, SURVEY.md §2 layer 6, §3): a random forest
// mapping feature descriptors directly to landmark rays (theta, phi),
// trained online from keyframes, queried with leaf backtracking when
// tracking is lost. Exposed to Python through a C API + ctypes
// (`ptzjax/reloc_forest.py`), mirroring how the reference loads its .so.
//
// Design (re-derived, not ported — the reference mount was empty):
//  - axis-aligned splits on descriptor dimensions; candidate (dim, thresh)
//    pairs chosen at random per node, scored by the reduction in summed
//    per-side ray variance (regression criterion);
//  - leaves store the mean ray and the mean descriptor of their samples;
//  - query descends each tree, then BACKTRACKS through the nearest
//    alternative subtrees (priority queue ordered by split-plane margin),
//    examining up to `backtrack_leaves` leaves; the candidate whose leaf
//    mean descriptor is closest in L2 wins across all trees;
//  - online training: samples accumulate per add_keyframe; trees rebuild
//    lazily once the sample count outgrows the last build by 25% (amortized
//    O(N log N) — rebuilds are milliseconds at SLAM map scales).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Node {
  int dim = -1;          // split dimension; -1 => leaf
  float thresh = 0.f;
  int left = -1, right = -1;
  // leaf payload
  float ray[2] = {0.f, 0.f};
  int count = 0;
  int desc_off = -1;     // offset into forest's leaf-descriptor pool
};

struct Tree {
  std::vector<Node> nodes;
};

struct Config {
  int num_trees = 8;
  int max_depth = 16;
  int min_leaf = 4;
  int candidate_dims = 16;
  int candidate_thresh = 8;
  int backtrack_leaves = 8;
  uint32_t seed = 17;
};

struct Forest {
  Config cfg;
  int dim = 0;                    // descriptor dimensionality (set on first add)
  std::vector<float> desc;        // (n, dim) training descriptors
  std::vector<float> rays;        // (n, 2) training rays
  std::vector<Tree> trees;
  std::vector<float> leaf_desc;   // pooled per-leaf mean descriptors
  size_t built_samples = 0;
  std::mt19937 rng;

  size_t n_samples() const { return rays.size() / 2; }
};

float ray_variance(const Forest& f, const std::vector<int>& idx) {
  if (idx.empty()) return 0.f;
  double m0 = 0, m1 = 0;
  for (int i : idx) { m0 += f.rays[2 * i]; m1 += f.rays[2 * i + 1]; }
  m0 /= idx.size(); m1 /= idx.size();
  double v = 0;
  for (int i : idx) {
    double a = f.rays[2 * i] - m0, b = f.rays[2 * i + 1] - m1;
    v += a * a + b * b;
  }
  return static_cast<float>(v);
}

int build_node(Forest& f, Tree& t, std::vector<int>& idx, int depth) {
  int id = static_cast<int>(t.nodes.size());
  t.nodes.emplace_back();

  auto make_leaf = [&](Node& n) {
    double m0 = 0, m1 = 0;
    std::vector<double> dmean(f.dim, 0.0);
    for (int i : idx) {
      m0 += f.rays[2 * i];
      m1 += f.rays[2 * i + 1];
      const float* d = &f.desc[static_cast<size_t>(i) * f.dim];
      for (int k = 0; k < f.dim; ++k) dmean[k] += d[k];
    }
    size_t c = idx.size();
    n.dim = -1;
    n.count = static_cast<int>(c);
    n.ray[0] = static_cast<float>(m0 / c);
    n.ray[1] = static_cast<float>(m1 / c);
    n.desc_off = static_cast<int>(f.leaf_desc.size());
    for (int k = 0; k < f.dim; ++k)
      f.leaf_desc.push_back(static_cast<float>(dmean[k] / c));
  };

  if (static_cast<int>(idx.size()) <= f.cfg.min_leaf ||
      depth >= f.cfg.max_depth) {
    make_leaf(t.nodes[id]);
    return id;
  }

  float parent_var = ray_variance(f, idx);
  float best_gain = 1e-12f;
  int best_dim = -1;
  float best_thresh = 0.f;
  std::vector<int> lbuf, rbuf, best_l, best_r;
  std::uniform_int_distribution<int> dim_pick(0, f.dim - 1);
  std::uniform_int_distribution<int> samp_pick(0, static_cast<int>(idx.size()) - 1);

  for (int cd = 0; cd < f.cfg.candidate_dims; ++cd) {
    int d = dim_pick(f.rng);
    for (int ct = 0; ct < f.cfg.candidate_thresh; ++ct) {
      float th = f.desc[static_cast<size_t>(idx[samp_pick(f.rng)]) * f.dim + d];
      lbuf.clear(); rbuf.clear();
      for (int i : idx) {
        (f.desc[static_cast<size_t>(i) * f.dim + d] < th ? lbuf : rbuf)
            .push_back(i);
      }
      if (lbuf.empty() || rbuf.empty()) continue;
      float gain = parent_var - ray_variance(f, lbuf) - ray_variance(f, rbuf);
      if (gain > best_gain) {
        best_gain = gain; best_dim = d; best_thresh = th;
        best_l = lbuf; best_r = rbuf;
      }
    }
  }

  if (best_dim < 0) {
    make_leaf(t.nodes[id]);
    return id;
  }
  // recurse (idx freed first to bound memory)
  std::vector<int>().swap(idx);
  int l = build_node(f, t, best_l, depth + 1);
  int r = build_node(f, t, best_r, depth + 1);
  t.nodes[id].dim = best_dim;
  t.nodes[id].thresh = best_thresh;
  t.nodes[id].left = l;
  t.nodes[id].right = r;
  return id;
}

void rebuild(Forest& f) {
  size_t n = f.n_samples();
  f.trees.assign(f.cfg.num_trees, Tree{});
  f.leaf_desc.clear();
  std::uniform_int_distribution<int> pick(0, static_cast<int>(n) - 1);
  for (auto& t : f.trees) {
    // bootstrap sample per tree (bagging)
    std::vector<int> idx(n);
    for (size_t i = 0; i < n; ++i) idx[i] = pick(f.rng);
    std::sort(idx.begin(), idx.end());
    idx.erase(std::unique(idx.begin(), idx.end()), idx.end());
    build_node(f, t, idx, 0);
  }
  f.built_samples = n;
}

void maybe_rebuild(Forest& f) {
  size_t n = f.n_samples();
  if (n == 0) return;
  if (f.trees.empty() || n > f.built_samples + f.built_samples / 4 ||
      n < f.built_samples) {
    rebuild(f);
  }
}

struct LeafHit {
  float desc_dist2;
  const Node* leaf;
};

// descend with backtracking: explore alternative branches in order of
// split-plane margin until the leaf budget is exhausted.
void query_tree(const Forest& f, const Tree& t, const float* q,
                std::vector<LeafHit>& hits) {
  using Alt = std::pair<float, int>;  // (margin, node id)
  std::priority_queue<Alt, std::vector<Alt>, std::greater<Alt>> alts;
  int budget = f.cfg.backtrack_leaves;
  int node = 0;
  while (budget > 0) {
    const Node* n = &t.nodes[node];
    while (n->dim >= 0) {
      float margin = q[n->dim] - n->thresh;
      int take = margin < 0 ? n->left : n->right;
      int other = margin < 0 ? n->right : n->left;
      alts.emplace(std::fabs(margin), other);
      n = &t.nodes[take];
    }
    // leaf reached
    const float* ld = &f.leaf_desc[n->desc_off];
    float d2 = 0;
    for (int k = 0; k < f.dim; ++k) {
      float diff = q[k] - ld[k];
      d2 += diff * diff;
    }
    hits.push_back({d2, n});
    if (--budget <= 0 || alts.empty()) break;
    node = alts.top().second;
    alts.pop();
  }
}

}  // namespace

extern "C" {

void* rf_create(int num_trees, int max_depth, int min_leaf,
                int candidate_dims, int candidate_thresh,
                int backtrack_leaves, uint32_t seed) {
  auto* f = new Forest();
  f->cfg = Config{num_trees, max_depth, min_leaf, candidate_dims,
                  candidate_thresh, backtrack_leaves, seed};
  f->rng.seed(seed);
  return f;
}

void rf_destroy(void* h) { delete static_cast<Forest*>(h); }

// Append keyframe samples: desc (n, dim) row-major fp32, rays (n, 2).
// Returns 0 on success, -1 on dim mismatch.
int rf_add_keyframe(void* h, const float* desc, const float* rays, int n,
                    int dim) {
  auto* f = static_cast<Forest*>(h);
  if (f->dim == 0) f->dim = dim;
  if (dim != f->dim || n <= 0) return -1;
  f->desc.insert(f->desc.end(), desc, desc + static_cast<size_t>(n) * dim);
  f->rays.insert(f->rays.end(), rays, rays + static_cast<size_t>(n) * 2);
  maybe_rebuild(*f);
  return 0;
}

int rf_num_samples(void* h) {
  return static_cast<int>(static_cast<Forest*>(h)->n_samples());
}

// Predict rays for n query descriptors. out_rays (n, 2); out_conf (n,)
// in [0, 1]: 1 - normalized descriptor distance of the winning leaf
// (callers threshold it). Returns number predicted, or -1 on error.
int rf_relocalize(void* h, const float* desc, int n, int dim,
                  float* out_rays, float* out_conf) {
  auto* f = static_cast<Forest*>(h);
  if (f->trees.empty() || dim != f->dim) return -1;
  std::vector<LeafHit> hits;
  for (int i = 0; i < n; ++i) {
    const float* q = desc + static_cast<size_t>(i) * dim;
    hits.clear();
    for (const auto& t : f->trees) query_tree(*f, t, q, hits);
    const LeafHit* best = nullptr;
    for (const auto& hsel : hits) {
      if (!best || hsel.desc_dist2 < best->desc_dist2) best = &hsel;
    }
    if (!best) return -1;
    out_rays[2 * i] = best->leaf->ray[0];
    out_rays[2 * i + 1] = best->leaf->ray[1];
    // unit-norm descriptors: d2 in [0, 4]; d2 of 0.5 ~ cosine 0.75
    float c = 1.f - best->desc_dist2 / 2.f;
    out_conf[i] = c < 0.f ? 0.f : c;
  }
  return n;
}

// Binary serialization (config + samples; trees rebuild on load so the
// format stays independent of in-memory layout). Saving re-seeds and
// rebuilds the live forest first: incremental training advances the RNG,
// so without this the loaded copy (fresh seed) would grow slightly
// different trees than the one that was saved.
int rf_save(void* h, const char* path) {
  auto* f = static_cast<Forest*>(h);
  f->rng.seed(f->cfg.seed);
  rebuild(*f);
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  uint32_t magic = 0x52464d31;  // "RFM1"
  uint64_t n = f->n_samples();
  std::fwrite(&magic, 4, 1, fp);
  std::fwrite(&f->cfg, sizeof(Config), 1, fp);
  std::fwrite(&f->dim, 4, 1, fp);
  std::fwrite(&n, 8, 1, fp);
  std::fwrite(f->desc.data(), 4, f->desc.size(), fp);
  std::fwrite(f->rays.data(), 4, f->rays.size(), fp);
  std::fclose(fp);
  return 0;
}

void* rf_load(const char* path) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return nullptr;
  uint32_t magic = 0;
  if (std::fread(&magic, 4, 1, fp) != 1 || magic != 0x52464d31) {
    std::fclose(fp);
    return nullptr;
  }
  auto* f = new Forest();
  uint64_t n = 0;
  bool ok = std::fread(&f->cfg, sizeof(Config), 1, fp) == 1 &&
            std::fread(&f->dim, 4, 1, fp) == 1 &&
            std::fread(&n, 8, 1, fp) == 1;
  if (ok) {
    f->desc.resize(n * f->dim);
    f->rays.resize(n * 2);
    ok = std::fread(f->desc.data(), 4, f->desc.size(), fp) == f->desc.size() &&
         std::fread(f->rays.data(), 4, f->rays.size(), fp) == f->rays.size();
  }
  std::fclose(fp);
  if (!ok) { delete f; return nullptr; }
  f->rng.seed(f->cfg.seed);
  rebuild(*f);
  return f;
}

}  // extern "C"
