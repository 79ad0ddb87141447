// First-party vector index: HNSW + exact flat scan, inner-product metric.
//
// The TPU framework's replacement for the reference's FAISS dependency
// (IndexHNSWFlat M=32/efC=200/efS=64 and IndexFlatIP — see
// /root/reference/src/database/faiss_indexing.py:61-141 for the behavioral
// contract).  Exposed to Python via a C ABI (ctypes binding in
// gpt2_image_captioning_tpu/retrieval/hnsw.py).
//
// Design: classic Malkov-Yashunin HNSW.
//  - levels sampled geometrically (p = 1/e, mult = 1/ln(M));
//  - layer search = best-first beam with a bounded result heap (ef);
//  - neighbor selection = simple heuristic (keep closest M, diversify by
//    relative-distance pruning);
//  - metric: negative inner product as "distance" (vectors are expected
//    L2-normalized by the caller, like the reference's embeddings).
// Threaded batch search via a tiny worker pool.  Binary save/load.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

using std::size_t;

static inline float dot(const float* a, const float* b, int d) {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int i = 0;
    for (; i + 4 <= d; i += 4) {
        s0 += a[i] * b[i];
        s1 += a[i + 1] * b[i + 1];
        s2 += a[i + 2] * b[i + 2];
        s3 += a[i + 3] * b[i + 3];
    }
    for (; i < d; ++i) s0 += a[i] * b[i];
    return s0 + s1 + s2 + s3;
}

struct HNSW {
    int dim = 0;
    int M = 32;               // max neighbors per node per layer (2M at layer 0)
    int ef_construction = 200;
    int ef_search = 64;
    int max_level = -1;
    int64_t entry_point = -1;
    double level_mult = 1.0;  // 1 / ln(M)

    std::vector<float> data;                       // n * dim
    std::vector<int> levels;                       // per node top level
    // neighbors[l][node] = fixed-capacity adjacency (count in first slot)
    // stored flat: layer l node i -> offsets into per-layer arrays
    std::vector<std::vector<int64_t>> links;       // per layer: n * (cap+1)
    std::mt19937_64 rng{42};

    int64_t size() const { return (int64_t)levels.size(); }
    int cap(int layer) const { return layer == 0 ? 2 * M : M; }
    const float* vec(int64_t i) const { return data.data() + (size_t)i * dim; }

    float dist(const float* q, int64_t i) const { return -dot(q, vec(i), dim); }

    int sample_level() {
        std::uniform_real_distribution<double> u(0.0, 1.0);
        double r = u(rng);
        if (r < 1e-12) r = 1e-12;
        return (int)(-std::log(r) * level_mult);
    }

    int64_t* layer_links(int layer, int64_t node) {
        return links[layer].data() + (size_t)node * (cap(layer) + 1);
    }
    const int64_t* layer_links(int layer, int64_t node) const {
        return links[layer].data() + (size_t)node * (cap(layer) + 1);
    }

    void ensure_layer(int layer) {
        while ((int)links.size() <= layer) {
            int l = (int)links.size();
            links.emplace_back();
            links[l].resize((size_t)size() * (cap(l) + 1), 0);
        }
    }

    // Best-first search on one layer; returns up to ef closest (dist, id),
    // sorted ascending by distance.
    void search_layer(const float* q, int64_t entry, int layer, int ef,
                      std::vector<std::pair<float, int64_t>>& out,
                      std::vector<uint8_t>& visited_buf) const {
        // visited flags (reused buffer)
        if ((int64_t)visited_buf.size() < size()) visited_buf.assign(size(), 0);
        std::vector<int64_t> touched;
        auto visit = [&](int64_t i) {
            visited_buf[i] = 1;
            touched.push_back(i);
        };

        using P = std::pair<float, int64_t>;
        std::priority_queue<P, std::vector<P>, std::greater<P>> candidates;  // min-heap
        std::priority_queue<P> results;                                       // max-heap

        float d0 = dist(q, entry);
        candidates.emplace(d0, entry);
        results.emplace(d0, entry);
        visit(entry);

        while (!candidates.empty()) {
            auto [dc, c] = candidates.top();
            if (dc > results.top().first && (int)results.size() >= ef) break;
            candidates.pop();
            const int64_t* nb = layer_links(layer, c);
            int64_t n = nb[0];
            for (int64_t j = 1; j <= n; ++j) {
                int64_t e = nb[j];
                if (visited_buf[e]) continue;
                visit(e);
                float de = dist(q, e);
                if ((int)results.size() < ef || de < results.top().first) {
                    candidates.emplace(de, e);
                    results.emplace(de, e);
                    if ((int)results.size() > ef) results.pop();
                }
            }
        }
        out.clear();
        out.reserve(results.size());
        while (!results.empty()) {
            out.push_back(results.top());
            results.pop();
        }
        std::reverse(out.begin(), out.end());
        for (int64_t i : touched) visited_buf[i] = 0;
    }

    // Heuristic neighbor selection: closest-first, prune candidates that are
    // closer to an already-selected neighbor than to the new node.
    void select_neighbors(const float* base,
                          std::vector<std::pair<float, int64_t>>& cand,
                          int m, std::vector<int64_t>& out) const {
        std::sort(cand.begin(), cand.end());
        out.clear();
        for (auto& [d, id] : cand) {
            if ((int)out.size() >= m) break;
            bool good = true;
            for (int64_t sel : out) {
                if (-dot(vec(sel), vec(id), dim) < d) {
                    good = false;
                    break;
                }
            }
            if (good) out.push_back(id);
        }
        // backfill with remaining closest if pruning was too aggressive
        if ((int)out.size() < m) {
            for (auto& [d, id] : cand) {
                if ((int)out.size() >= m) break;
                if (std::find(out.begin(), out.end(), id) == out.end())
                    out.push_back(id);
            }
        }
    }

    void set_links(int layer, int64_t node, const std::vector<int64_t>& nbs) {
        int64_t* l = layer_links(layer, node);
        int c = cap(layer);
        int64_t n = std::min<int64_t>((int64_t)nbs.size(), c);
        l[0] = n;
        for (int64_t j = 0; j < n; ++j) l[j + 1] = nbs[j];
    }

    void add_point(const float* v) {
        int64_t id = size();
        levels.push_back(sample_level());
        data.insert(data.end(), v, v + dim);
        int node_level = levels.back();
        // grow adjacency arrays for existing layers + any new ones
        for (int l = 0; l < (int)links.size(); ++l)
            links[l].resize((size_t)size() * (cap(l) + 1), 0);
        ensure_layer(node_level);

        if (entry_point < 0) {
            entry_point = id;
            max_level = node_level;
            return;
        }

        std::vector<uint8_t> visited;
        std::vector<std::pair<float, int64_t>> found;
        int64_t cur = entry_point;
        // greedy descent through upper layers
        for (int l = max_level; l > node_level; --l) {
            bool improved = true;
            float dcur = dist(v, cur);
            while (improved) {
                improved = false;
                const int64_t* nb = layer_links(l, cur);
                for (int64_t j = 1; j <= nb[0]; ++j) {
                    float d = dist(v, nb[j]);
                    if (d < dcur) {
                        dcur = d;
                        cur = nb[j];
                        improved = true;
                    }
                }
            }
        }
        // insert on layers min(node_level, max_level) .. 0
        for (int l = std::min(node_level, max_level); l >= 0; --l) {
            search_layer(v, cur, l, ef_construction, found, visited);
            std::vector<int64_t> nbs;
            select_neighbors(v, found, cap(l) == 2 * M ? M : M, nbs);
            set_links(l, id, nbs);
            // connect back, pruning overflow with the same heuristic
            for (int64_t nb_id : nbs) {
                int64_t* nl = layer_links(l, nb_id);
                if (nl[0] < cap(l)) {
                    nl[nl[0] + 1] = id;
                    nl[0] += 1;
                } else {
                    std::vector<std::pair<float, int64_t>> cand;
                    cand.reserve(nl[0] + 1);
                    for (int64_t j = 1; j <= nl[0]; ++j)
                        cand.emplace_back(-dot(vec(nb_id), vec(nl[j]), dim), nl[j]);
                    cand.emplace_back(-dot(vec(nb_id), vec(id), dim), id);
                    std::vector<int64_t> kept;
                    select_neighbors(vec(nb_id), cand, cap(l), kept);
                    set_links(l, nb_id, kept);
                }
            }
            if (!found.empty()) cur = found.front().second;
        }
        if (node_level > max_level) {
            max_level = node_level;
            entry_point = id;
        }
    }

    void search(const float* q, int k, int ef, float* out_scores,
                int64_t* out_ids, std::vector<uint8_t>& visited) const {
        if (size() == 0) {
            for (int i = 0; i < k; ++i) {
                out_scores[i] = 0.f;
                out_ids[i] = -1;
            }
            return;
        }
        int64_t cur = entry_point;
        for (int l = max_level; l > 0; --l) {
            bool improved = true;
            float dcur = dist(q, cur);
            while (improved) {
                improved = false;
                const int64_t* nb = layer_links(l, cur);
                for (int64_t j = 1; j <= nb[0]; ++j) {
                    float d = dist(q, nb[j]);
                    if (d < dcur) {
                        dcur = d;
                        cur = nb[j];
                        improved = true;
                    }
                }
            }
        }
        std::vector<std::pair<float, int64_t>> found;
        search_layer(q, cur, 0, std::max(ef, k), found, visited);
        for (int i = 0; i < k; ++i) {
            if (i < (int)found.size()) {
                out_scores[i] = -found[i].first;  // back to inner product
                out_ids[i] = found[i].second;
            } else {
                out_scores[i] = 0.f;
                out_ids[i] = -1;
            }
        }
    }
};

struct FlatIP {
    int dim = 0;
    std::vector<float> data;
    int64_t size() const { return dim ? (int64_t)(data.size() / dim) : 0; }
};

constexpr uint64_t HNSW_MAGIC = 0x484e535731ULL;  // "HNSW1"
constexpr uint64_t FLAT_MAGIC = 0x464c415431ULL;  // "FLAT1"

template <typename T>
void wr(FILE* f, const T& v) { std::fwrite(&v, sizeof(T), 1, f); }
template <typename T>
void wr_vec(FILE* f, const std::vector<T>& v) {
    uint64_t n = v.size();
    wr(f, n);
    if (n) std::fwrite(v.data(), sizeof(T), n, f);
}
template <typename T>
bool rd(FILE* f, T& v) { return std::fread(&v, sizeof(T), 1, f) == 1; }
template <typename T>
bool rd_vec(FILE* f, std::vector<T>& v) {
    uint64_t n;
    if (!rd(f, n)) return false;
    v.resize(n);
    return n == 0 || std::fread(v.data(), sizeof(T), n, f) == n;
}

void parallel_for(int64_t n, int threads, const std::function<void(int64_t)>& fn) {
    if (threads <= 1 || n <= 1) {
        for (int64_t i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int64_t> next{0};
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t)
        pool.emplace_back([&] {
            for (;;) {
                int64_t i = next.fetch_add(1);
                if (i >= n) return;
                fn(i);
            }
        });
    for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// ---------------- HNSW ----------------
void* hnsw_create(int dim, int M, int ef_construction, int ef_search, uint64_t seed) {
    auto* h = new HNSW();
    h->dim = dim;
    h->M = M;
    h->ef_construction = ef_construction;
    h->ef_search = ef_search;
    h->level_mult = 1.0 / std::log(std::max(2, M));
    h->rng.seed(seed);
    return h;
}

void hnsw_free(void* p) { delete (HNSW*)p; }

void hnsw_add(void* p, const float* vecs, int64_t n) {
    auto* h = (HNSW*)p;
    for (int64_t i = 0; i < n; ++i) h->add_point(vecs + (size_t)i * h->dim);
}

int64_t hnsw_size(void* p) { return ((HNSW*)p)->size(); }

void hnsw_set_ef(void* p, int ef) { ((HNSW*)p)->ef_search = ef; }

void hnsw_search(void* p, const float* queries, int64_t nq, int k,
                 float* out_scores, int64_t* out_ids, int threads) {
    auto* h = (HNSW*)p;
    parallel_for(nq, threads, [&](int64_t i) {
        thread_local std::vector<uint8_t> visited;
        h->search(queries + (size_t)i * h->dim, k, h->ef_search,
                  out_scores + (size_t)i * k, out_ids + (size_t)i * k, visited);
    });
}

void hnsw_reconstruct(void* p, int64_t id, float* out) {
    auto* h = (HNSW*)p;
    std::memcpy(out, h->vec(id), sizeof(float) * h->dim);
}

int hnsw_save(void* p, const char* path) {
    auto* h = (HNSW*)p;
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    wr(f, HNSW_MAGIC);
    wr(f, (int64_t)h->dim);
    wr(f, (int64_t)h->M);
    wr(f, (int64_t)h->ef_construction);
    wr(f, (int64_t)h->ef_search);
    wr(f, (int64_t)h->max_level);
    wr(f, h->entry_point);
    wr_vec(f, h->data);
    wr_vec(f, h->levels);
    uint64_t nl = h->links.size();
    wr(f, nl);
    for (auto& l : h->links) wr_vec(f, l);
    std::fclose(f);
    return 0;
}

void* hnsw_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    uint64_t magic;
    if (!rd(f, magic) || magic != HNSW_MAGIC) {
        std::fclose(f);
        return nullptr;
    }
    auto* h = new HNSW();
    int64_t dim, M, efc, efs, ml;
    rd(f, dim); rd(f, M); rd(f, efc); rd(f, efs); rd(f, ml);
    rd(f, h->entry_point);
    h->dim = (int)dim; h->M = (int)M;
    h->ef_construction = (int)efc; h->ef_search = (int)efs;
    h->max_level = (int)ml;
    h->level_mult = 1.0 / std::log(std::max<int64_t>(2, M));
    rd_vec(f, h->data);
    rd_vec(f, h->levels);
    uint64_t nl;
    rd(f, nl);
    h->links.resize(nl);
    for (auto& l : h->links) rd_vec(f, l);
    std::fclose(f);
    return h;
}

// ---------------- Flat exact IP ----------------
void* flat_create(int dim) {
    auto* x = new FlatIP();
    x->dim = dim;
    return x;
}

void flat_free(void* p) { delete (FlatIP*)p; }

void flat_add(void* p, const float* vecs, int64_t n) {
    auto* x = (FlatIP*)p;
    x->data.insert(x->data.end(), vecs, vecs + (size_t)n * x->dim);
}

int64_t flat_size(void* p) { return ((FlatIP*)p)->size(); }

void flat_search(void* p, const float* queries, int64_t nq, int k,
                 float* out_scores, int64_t* out_ids, int threads) {
    auto* x = (FlatIP*)p;
    int64_t n = x->size();
    int kk = (int)std::min<int64_t>(k, n);
    parallel_for(nq, threads, [&](int64_t qi) {
        const float* q = queries + (size_t)qi * x->dim;
        using P = std::pair<float, int64_t>;
        std::priority_queue<P, std::vector<P>, std::greater<P>> heap;  // min-heap of best
        for (int64_t i = 0; i < n; ++i) {
            float s = dot(q, x->data.data() + (size_t)i * x->dim, x->dim);
            if ((int)heap.size() < kk) heap.emplace(s, i);
            else if (s > heap.top().first) {
                heap.pop();
                heap.emplace(s, i);
            }
        }
        std::vector<P> best(heap.size());
        for (int64_t j = (int64_t)heap.size() - 1; j >= 0; --j) {
            best[j] = heap.top();
            heap.pop();
        }
        for (int i = 0; i < k; ++i) {
            if (i < (int)best.size()) {
                out_scores[(size_t)qi * k + i] = best[i].first;
                out_ids[(size_t)qi * k + i] = best[i].second;
            } else {
                out_scores[(size_t)qi * k + i] = 0.f;
                out_ids[(size_t)qi * k + i] = -1;
            }
        }
    });
}

void flat_reconstruct(void* p, int64_t id, float* out) {
    auto* x = (FlatIP*)p;
    std::memcpy(out, x->data.data() + (size_t)id * x->dim, sizeof(float) * x->dim);
}

int flat_save(void* p, const char* path) {
    auto* x = (FlatIP*)p;
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    wr(f, FLAT_MAGIC);
    wr(f, (int64_t)x->dim);
    wr_vec(f, x->data);
    std::fclose(f);
    return 0;
}

void* flat_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    uint64_t magic;
    if (!rd(f, magic) || magic != FLAT_MAGIC) {
        std::fclose(f);
        return nullptr;
    }
    auto* x = new FlatIP();
    int64_t dim;
    rd(f, dim);
    x->dim = (int)dim;
    rd_vec(f, x->data);
    std::fclose(f);
    return x;
}

}  // extern "C"
