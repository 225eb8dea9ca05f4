// Native hot paths of the Mongoose-class graph partitioner
// (suitesparse_tpu/graph/partition.py): greedy heavy-edge matching and
// Fiduccia-Mattheyses boundary refinement.  These dominate host analyze
// time under nested dissection (cProfile: ~12 of 18 s at n=85k), so they
// move to C++ like the orderings (amd.cc/colamd.cc).  Independent
// implementation of the published algorithms (Fiduccia & Mattheyses 1982;
// Hendrickson-Leland style matching); reference behavior anchor:
// Mongoose_ImproveFM.cpp / Mongoose_Coarsening.cpp.
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <queue>
#include <tuple>
#include <vector>

extern "C" {

// Greedy heavy-edge matching over vertices in the given visit order.
// cmap[v] receives the coarse vertex id; returns the coarse vertex count.
int64_t sstpu_heavy_matching(int64_t n, const int64_t* indptr,
                             const int64_t* indices, const double* data,
                             const int64_t* order, int64_t* cmap) {
    std::vector<int64_t> matched(n, -1);
    for (int64_t k = 0; k < n; ++k) {
        int64_t v = order[k];
        if (matched[v] != -1) continue;
        int64_t best = -1;
        double bw = 0.0;
        for (int64_t idx = indptr[v]; idx < indptr[v + 1]; ++idx) {
            int64_t u = indices[idx];
            if (u != v && matched[u] == -1 && data[idx] > bw) {
                best = u;
                bw = data[idx];
            }
        }
        if (best >= 0) {
            matched[v] = best;
            matched[best] = v;
        } else {
            matched[v] = v;
        }
    }
    int64_t nc = 0;
    for (int64_t v = 0; v < n; ++v) cmap[v] = -1;
    for (int64_t v = 0; v < n; ++v) {
        if (cmap[v] == -1) {
            cmap[v] = nc;
            if (matched[v] != v) cmap[matched[v]] = nc;
            ++nc;
        }
    }
    return nc;
}

// Fiduccia-Mattheyses refinement: single-move passes with a lazy max-heap
// of gains, balance window on side-0 weight, best-prefix rollback.
// part is 0/1 per vertex (int8), updated in place to the best partition.
// Returns the best cut weight.
double sstpu_fm_refine(int64_t n, const int64_t* indptr,
                       const int64_t* indices, const double* data,
                       const double* vwt, int8_t* part, double lo_w,
                       double hi_w, int64_t passes) {
    auto cut_of = [&](const int8_t* p) {
        double c = 0.0;
        for (int64_t v = 0; v < n; ++v)
            for (int64_t idx = indptr[v]; idx < indptr[v + 1]; ++idx)
                if (p[v] != p[indices[idx]]) c += data[idx];
        return c / 2.0;
    };

    std::vector<int8_t> best_part(part, part + n);
    double best_cut = cut_of(part);
    double w0 = 0.0;
    for (int64_t v = 0; v < n; ++v)
        if (part[v] == 0) w0 += vwt[v];

    std::vector<double> gains(n);
    std::vector<int64_t> stamp(n);
    std::vector<int8_t> locked(n);
    std::vector<int8_t> work(n);
    // max-heap of (gain, -stamp, -v): mirrors heapq's (-gain, stamp, v)
    typedef std::tuple<double, int64_t, int64_t> Item;
    const int64_t move_window = std::max<int64_t>(64, n / 32);

    for (int64_t pass = 0; pass < passes; ++pass) {
        std::memcpy(work.data(), best_part.data(), n);
        int8_t* p = work.data();
        w0 = 0.0;
        for (int64_t v = 0; v < n; ++v)
            if (p[v] == 0) w0 += vwt[v];
        std::priority_queue<Item> heap;
        std::fill(stamp.begin(), stamp.end(), 0);
        std::fill(locked.begin(), locked.end(), 0);
        for (int64_t v = 0; v < n; ++v) {
            double g = 0.0;
            bool bnd = false;
            for (int64_t idx = indptr[v]; idx < indptr[v + 1]; ++idx) {
                if (p[indices[idx]] == p[v]) {
                    g -= data[idx];
                } else {
                    g += data[idx];
                    bnd = true;
                }
            }
            gains[v] = g;
            if (bnd) heap.emplace(g, 0, -v);
        }
        double cur_cut = cut_of(p);
        double pass_best_cut = best_cut;
        std::vector<int8_t> pass_best_state;
        int64_t moves_since_best = 0;
        bool improved = false;
        while (!heap.empty() && moves_since_best < move_window) {
            auto [g, negver, negv] = heap.top();
            heap.pop();
            int64_t v = -negv;
            if (locked[v] || -negver != stamp[v]) continue;
            double neww0 = (p[v] == 0) ? w0 - vwt[v] : w0 + vwt[v];
            if (neww0 < lo_w || neww0 > hi_w) continue;
            cur_cut -= gains[v];
            p[v] = 1 - p[v];
            w0 = neww0;
            locked[v] = 1;
            for (int64_t idx = indptr[v]; idx < indptr[v + 1]; ++idx) {
                int64_t u = indices[idx];
                if (locked[u]) continue;
                double delta = 2.0 * data[idx];
                gains[u] += (p[u] == p[v]) ? -delta : delta;
                stamp[u] += 1;
                heap.emplace(gains[u], -stamp[u], -u);
            }
            if (cur_cut < pass_best_cut - 1e-12) {
                pass_best_cut = cur_cut;
                pass_best_state.assign(p, p + n);
                moves_since_best = 0;
                improved = true;
            } else {
                ++moves_since_best;
            }
        }
        if (!pass_best_state.empty()) {
            best_part = pass_best_state;
            best_cut = pass_best_cut;
        }
        if (!improved) break;
    }
    std::memcpy(part, best_part.data(), n);
    return best_cut;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full multilevel edge-cut V-cycle (round 4): coarsening, BFS initial cut,
// FM + QP-gradient-projection waterdance, restarts — the whole of
// partition.py's edge_cut() without per-level Python/scipy round-trips
// (cProfile r4: the QP + coarsening Python path was ~6 of 10 s of nesdis
// at n=85k).  Independent implementation; behavior anchors:
// Mongoose_Coarsening.cpp / Mongoose_QPGradProj.cpp / Mongoose_QPNapsack.cpp
// / Mongoose_Waterdance.cpp.

namespace {

struct XRng {
    uint64_t s;
    explicit XRng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
    uint64_t next() {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        return s;
    }
    int64_t below(int64_t n) { return (int64_t)(next() % (uint64_t)n); }
};

struct CGraph {
    int64_t n = 0;
    std::vector<int64_t> indptr, indices;
    std::vector<double> data;
    std::vector<double> vwt;
};

double cut_of_g(const CGraph& G, const int8_t* p) {
    double c = 0.0;
    for (int64_t v = 0; v < G.n; ++v)
        for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx)
            if (p[v] != p[G.indices[idx]]) c += G.data[idx];
    return c / 2.0;
}

// greedy heavy-edge matching in random visit order; cmap out, returns nc
int64_t match_g(const CGraph& G, XRng& rng, std::vector<int64_t>& cmap) {
    int64_t n = G.n;
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    for (int64_t i = n - 1; i > 0; --i)
        std::swap(order[i], order[rng.below(i + 1)]);
    std::vector<int64_t> matched(n, -1);
    for (int64_t k = 0; k < n; ++k) {
        int64_t v = order[k];
        if (matched[v] != -1) continue;
        int64_t best = -1;
        double bw = 0.0;
        for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx) {
            int64_t u = G.indices[idx];
            if (u != v && matched[u] == -1 && G.data[idx] > bw) {
                best = u; bw = G.data[idx];
            }
        }
        matched[v] = (best >= 0) ? best : v;
        if (best >= 0) matched[best] = v;
    }
    cmap.assign(n, -1);
    int64_t nc = 0;
    for (int64_t v = 0; v < n; ++v) {
        if (cmap[v] == -1) {
            cmap[v] = nc;
            if (matched[v] != v) cmap[matched[v]] = nc;
            ++nc;
        }
    }
    return nc;
}

// CSR coarsening with a marker-array sparse accumulator (one pass, no sort)
CGraph coarsen_g(const CGraph& G, const std::vector<int64_t>& cmap,
                 int64_t nc) {
    CGraph C;
    C.n = nc;
    C.vwt.assign(nc, 0.0);
    for (int64_t v = 0; v < G.n; ++v) C.vwt[cmap[v]] += G.vwt[v];
    // fine vertices grouped by coarse id
    std::vector<int64_t> head(nc + 1, 0), vlist(G.n);
    for (int64_t v = 0; v < G.n; ++v) head[cmap[v] + 1]++;
    for (int64_t c = 0; c < nc; ++c) head[c + 1] += head[c];
    {
        std::vector<int64_t> pos(head.begin(), head.end() - 1);
        for (int64_t v = 0; v < G.n; ++v) vlist[pos[cmap[v]]++] = v;
    }
    C.indptr.assign(nc + 1, 0);
    std::vector<int64_t> marker(nc, -1);
    std::vector<int64_t> touched;
    std::vector<double> acc(nc, 0.0);
    // two-pass: count then fill (keeps memory tight)
    std::vector<std::pair<int64_t, double>> row;
    C.indices.reserve(G.indices.size());
    C.data.reserve(G.data.size());
    for (int64_t cv = 0; cv < nc; ++cv) {
        touched.clear();
        for (int64_t k = head[cv]; k < head[cv + 1]; ++k) {
            int64_t v = vlist[k];
            for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx) {
                int64_t cu = cmap[G.indices[idx]];
                if (cu == cv) continue;
                if (marker[cu] != cv) {
                    marker[cu] = cv;
                    acc[cu] = 0.0;
                    touched.push_back(cu);
                }
                acc[cu] += G.data[idx];
            }
        }
        for (int64_t cu : touched) {
            C.indices.push_back(cu);
            C.data.push_back(acc[cu]);
        }
        C.indptr[cv + 1] = (int64_t)C.indices.size();
    }
    return C;
}

// BFS region growing from a random seed to the target weight
void initial_cut_g(const CGraph& G, double target, XRng& rng, int8_t* part) {
    int64_t n = G.n;
    double total = 0.0;
    for (double w : G.vwt) total += w;
    std::fill(part, part + n, (int8_t)1);
    std::vector<int64_t> q;
    std::vector<int8_t> seen(n, 0);
    int64_t seed = rng.below(n);
    q.push_back(seed);
    seen[seed] = 1;
    double w = 0.0;
    size_t qh = 0;
    while (qh < q.size() && w < target * total) {
        int64_t v = q[qh++];
        part[v] = 0;
        w += G.vwt[v];
        for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx) {
            int64_t u = G.indices[idx];
            if (!seen[u]) { seen[u] = 1; q.push_back(u); }
        }
    }
    for (int64_t v = 0; v < n && w < target * total; ++v)
        if (part[v] == 1) { part[v] = 0; w += G.vwt[v]; }
}

// napsack projection: x = clip(y - lam*a, 0, 1) with lo <= a'x <= hi
void napsack_g(std::vector<double>& y, const std::vector<double>& a,
               double lo, double hi, std::vector<double>& x) {
    int64_t n = (int64_t)y.size();
    x.resize(n);
    double s = 0.0, amin = 1e300, ymax = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        x[i] = y[i] < 0.0 ? 0.0 : (y[i] > 1.0 ? 1.0 : y[i]);
        s += a[i] * x[i];
        if (a[i] < amin) amin = a[i];
        double ay = y[i] < 0 ? -y[i] : y[i];
        if (ay > ymax) ymax = ay;
    }
    if (s >= lo && s <= hi) return;
    double tgt = (s > hi) ? hi : lo;
    double scale = ymax / (amin > 1e-12 ? amin : 1e-12);
    if (scale < 1.0) scale = 1.0;
    double lam_lo = -scale - 1.0, lam_hi = scale + 1.0;
    for (int it = 0; it < 30; ++it) {
        double lam = 0.5 * (lam_lo + lam_hi);
        double sv = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            double xi = y[i] - lam * a[i];
            xi = xi < 0.0 ? 0.0 : (xi > 1.0 ? 1.0 : xi);
            sv += a[i] * xi;
        }
        if (sv > tgt) lam_lo = lam; else lam_hi = lam;
    }
    double lam = 0.5 * (lam_lo + lam_hi);
    for (int64_t i = 0; i < n; ++i) {
        double xi = y[i] - lam * a[i];
        x[i] = xi < 0.0 ? 0.0 : (xi > 1.0 ? 1.0 : xi);
    }
}

// QP gradient projection on f(x) = x'W(1-x) + balanced rounding
void qp_gradproj_g(const CGraph& G, const int8_t* part, double tolerance,
                   double target, int64_t iters, int8_t* out) {
    int64_t n = G.n;
    double total = 0.0;
    for (double w : G.vwt) total += w;
    double lo_w = (target - tolerance) * total;
    double hi_w = (target + tolerance) * total;
    std::vector<double> x(n), G1(n), Gx(n), g(n), y(n), xbest;
    for (int64_t v = 0; v < n; ++v) x[v] = (double)part[v];
    double alpha_den = 0.0;
    for (int64_t v = 0; v < n; ++v) {
        double rs = 0.0;
        for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx)
            rs += G.data[idx] < 0 ? -G.data[idx] : G.data[idx];
        if (rs > alpha_den) alpha_den = rs;
        double s1 = 0.0;
        for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx)
            s1 += G.data[idx];
        G1[v] = s1;
    }
    double alpha = 1.0 / (alpha_den > 1e-12 ? alpha_den : 1e-12);
    double fbest = 1e300;
    xbest = x;
    int stall = 0;
    for (int64_t it = 0; it < iters; ++it) {
        double f = 0.0;
        for (int64_t v = 0; v < n; ++v) {
            double s = 0.0;
            for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx)
                s += G.data[idx] * x[G.indices[idx]];
            Gx[v] = s;
            f += x[v] * (G1[v] - s);
        }
        if (f < fbest - 1e-12) { fbest = f; xbest = x; stall = 0; }
        else if (++stall >= 3) break;
        for (int64_t v = 0; v < n; ++v)
            y[v] = x[v] - alpha * (G1[v] - 2.0 * Gx[v]);
        napsack_g(y, G.vwt, lo_w, hi_w, x);
    }
    {
        double f = 0.0;
        for (int64_t v = 0; v < n; ++v) {
            double s = 0.0;
            for (int64_t idx = G.indptr[v]; idx < G.indptr[v + 1]; ++idx)
                s += G.data[idx] * x[G.indices[idx]];
            f += x[v] * (G1[v] - s);
        }
        if (f < fbest - 1e-12) { fbest = f; xbest = x; }
    }
    // balanced rounding: side 1 takes the largest-x prefix closest to
    // the target weight
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return xbest[a] > xbest[b]; });
    double w1_target = (1.0 - target) * total;
    double csum = 0.0, bestd = 1e300;
    int64_t bestk = 1;
    for (int64_t i = 0; i < n; ++i) {
        csum += G.vwt[order[i]];
        double d = csum - w1_target;
        if (d < 0) d = -d;
        if (d < bestd) { bestd = d; bestk = i + 1; }
    }
    std::fill(out, out + n, (int8_t)0);
    for (int64_t i = 0; i < bestk; ++i) out[order[i]] = 1;
}

// FM wrapper reusing the extern entry point's logic via direct call
double fm_g(const CGraph& G, int8_t* part, double lo_w, double hi_w,
            int64_t passes) {
    return sstpu_fm_refine(G.n, G.indptr.data(), G.indices.data(),
                           G.data.data(), G.vwt.data(), part, lo_w, hi_w,
                           passes);
}

double waterdance_g(const CGraph& G, int8_t* part, double tolerance,
                    double target, int64_t fm_passes, int64_t rounds,
                    int64_t qp_iters) {
    double total = 0.0;
    for (double w : G.vwt) total += w;
    double lo_w = (target - tolerance) * total;
    double hi_w = (target + tolerance) * total;
    double best_cut = cut_of_g(G, part);
    std::vector<int8_t> cand(G.n);
    for (int64_t r = 0; r < (rounds > 1 ? rounds : 1); ++r) {
        bool improved = false;
        std::memcpy(cand.data(), part, G.n);
        double cut = fm_g(G, cand.data(), lo_w, hi_w, fm_passes);
        if (cut < best_cut - 1e-12) {
            std::memcpy(part, cand.data(), G.n);
            best_cut = cut; improved = true;
        }
        qp_gradproj_g(G, part, tolerance, target, qp_iters, cand.data());
        cut = cut_of_g(G, cand.data());
        if (cut < best_cut - 1e-12) {
            std::memcpy(part, cand.data(), G.n);
            best_cut = cut; improved = true;
        }
        if (!improved) break;
    }
    return best_cut;
}

}  // namespace

extern "C" {

// Full multilevel edge cut.  Adjacency is CSR, symmetric, no diagonal,
// positive weights.  part_out: 0/1 per vertex.  Returns the cut weight.
double sstpu_edge_cut(int64_t n, const int64_t* indptr,
                      const int64_t* indices, const double* data,
                      double target, double tolerance,
                      int64_t coarsen_limit, int64_t restarts,
                      int64_t fm_passes, int64_t wd_rounds,
                      int64_t qp_iters, uint64_t seed, int8_t* part_out) {
    CGraph G0;
    G0.n = n;
    G0.indptr.assign(indptr, indptr + n + 1);
    G0.indices.assign(indices, indices + indptr[n]);
    G0.data.assign(data, data + indptr[n]);
    G0.vwt.assign(n, 1.0);
    XRng rng(seed * 0x9e3779b97f4a7c15ULL + 12345);

    double best_cut = 1e300;
    std::vector<int8_t> best(n, 0);
    for (int64_t rs = 0; rs < (restarts > 1 ? restarts : 1); ++rs) {
        std::vector<CGraph> graphs;
        std::vector<std::vector<int64_t>> maps;
        graphs.push_back(G0);
        while (graphs.back().n > coarsen_limit) {
            const CGraph& G = graphs.back();
            std::vector<int64_t> cmap;
            int64_t nc = match_g(G, rng, cmap);
            if (nc >= (int64_t)(G.n * 0.95)) break;   // stalled
            CGraph C = coarsen_g(G, cmap, nc);
            maps.push_back(std::move(cmap));
            graphs.push_back(std::move(C));
        }
        std::vector<int8_t> part(graphs.back().n);
        initial_cut_g(graphs.back(), target, rng, part.data());
        waterdance_g(graphs.back(), part.data(), tolerance, target,
                     fm_passes, wd_rounds, qp_iters);
        for (int64_t lvl = (int64_t)maps.size() - 1; lvl >= 0; --lvl) {
            const CGraph& G = graphs[lvl];
            std::vector<int8_t> fine(G.n);
            for (int64_t v = 0; v < G.n; ++v) fine[v] = part[maps[lvl][v]];
            part = std::move(fine);
            waterdance_g(G, part.data(), tolerance, target, fm_passes,
                         wd_rounds, qp_iters);
        }
        double cut = cut_of_g(G0, part.data());
        if (cut < best_cut) {
            best_cut = cut;
            best = part;
        }
    }
    std::memcpy(part_out, best.data(), n);
    return best_cut;
}

}  // extern "C"

extern "C" {

// Minimum vertex cover of a bipartite graph by König's theorem (round 4:
// the Python augmenting-path cover was ~2.7 s of nesdis at n=262k).
// Edges are (local B0 index, local B1 index) pairs.  Outputs 0/1 flags
// per B0 / B1 vertex.  Kuhn's matching + alternating BFS.
void sstpu_vertex_cover(int64_t nb0, int64_t nb1, int64_t ne,
                        const int64_t* e0, const int64_t* e1,
                        uint8_t* c0, uint8_t* c1) {
    // CSR adjacency for B0
    std::vector<int64_t> ptr(nb0 + 1, 0), adj(ne);
    for (int64_t k = 0; k < ne; ++k) ptr[e0[k] + 1]++;
    for (int64_t i = 0; i < nb0; ++i) ptr[i + 1] += ptr[i];
    {
        std::vector<int64_t> pos(ptr.begin(), ptr.end() - 1);
        for (int64_t k = 0; k < ne; ++k) adj[pos[e0[k]]++] = e1[k];
    }
    std::vector<int64_t> match0(nb0, -1), match1(nb1, -1);
    std::vector<int64_t> seen(nb1, -1);
    int64_t stampv = 0;
    // iterative augmenting DFS (explicit stack of (i, next-edge cursor))
    std::vector<int64_t> stk_i, stk_c;
    for (int64_t s = 0; s < nb0; ++s) {
        ++stampv;
        stk_i.assign(1, s);
        stk_c.assign(1, ptr[s]);
        // path[j] chain reconstructed from the stack on success
        bool found = false;
        while (!stk_i.empty()) {
            int64_t i = stk_i.back();
            int64_t& c = stk_c.back();
            if (c >= ptr[i + 1]) {
                stk_i.pop_back();
                stk_c.pop_back();
                continue;
            }
            int64_t j = adj[c++];
            if (seen[j] == stampv) continue;
            seen[j] = stampv;
            if (match1[j] == -1) {
                // augment along the stack: pair (i, j), then unwind —
                // each stack level's edge is the one its cursor last read
                int64_t jj = j;
                for (int64_t d = (int64_t)stk_i.size() - 1; d >= 0; --d) {
                    int64_t ii = stk_i[d];
                    int64_t prev = match0[ii];
                    match0[ii] = jj;
                    match1[jj] = ii;
                    jj = prev;
                    if (jj == -1) break;
                }
                found = true;
                break;
            }
            stk_i.push_back(match1[j]);
            stk_c.push_back(ptr[match1[j]]);
        }
        (void)found;
    }
    // alternating BFS from unmatched B0 vertices
    std::vector<uint8_t> z0(nb0, 0), z1(nb1, 0);
    std::vector<int64_t> q;
    for (int64_t i = 0; i < nb0; ++i)
        if (match0[i] == -1) { z0[i] = 1; q.push_back(i); }
    size_t qh = 0;
    while (qh < q.size()) {
        int64_t i = q[qh++];
        for (int64_t c = ptr[i]; c < ptr[i + 1]; ++c) {
            int64_t j = adj[c];
            if (z1[j]) continue;
            z1[j] = 1;
            int64_t i2 = match1[j];
            if (i2 != -1 && !z0[i2]) { z0[i2] = 1; q.push_back(i2); }
        }
    }
    for (int64_t i = 0; i < nb0; ++i) c0[i] = z0[i] ? 0 : 1;
    for (int64_t j = 0; j < nb1; ++j) c1[j] = z1[j] ? 1 : 0;
}

}  // extern "C"
