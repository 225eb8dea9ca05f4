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
