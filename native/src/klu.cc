// Gilbert-Peierls left-looking sparse LU with partial pivoting, diagonal
// preference, and Eisenstat-Liu symmetric pruning — the KLU first-factor
// hot path (behavioral match of the reference's klu_kernel.c algorithm as
// published in Gilbert & Peierls 1988 / Davis' KLU paper; implementation
// is original: vector-state object, explicit DFS stack, stamp-free flag
// reset, stable partition pruning).
//
// Mirrors the Python twin in suitesparse_tpu/lu/klu.py (_gp_lu_block):
// same pivoting rule, pruning, and output layout (pivot-tie order may
// differ — both are valid factorizations).  The Python path remains the
// fallback when the toolchain is unavailable.
//
// Protocol (ctypes): factor -> opaque handle + sizes; extract -> caller
// buffers; free.  Values are doubles, or (re,im) pairs when is_complex.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

using std::int64_t;

namespace {

template <typename T>
struct GPResult {
  std::vector<int64_t> Lp{0}, Li, Up{0}, Ui, prow;
  std::vector<T> Lx, Ux;
  int64_t singular_at = 0;
  double flops = 0.0, umin = 0.0, umax = 0.0;
  bool halted = false;
};

template <typename T>
static double absval(T v) { return std::abs(v); }

template <typename T>
GPResult<T>* gp_factor(int64_t nb, const int64_t* Bp, const int64_t* Bi,
                       const T* Bx, double tol, bool halt_if_singular) {
  auto* res = new GPResult<T>();
  res->singular_at = nb;
  res->prow.assign(nb, -1);
  std::vector<int64_t> pinv(nb, -1);
  std::vector<T> x(nb, T(0));
  std::vector<char> flag(nb, 0), intouch(nb, 0);
  std::vector<std::vector<int64_t>> Lrows;   // per L column, original rows
  std::vector<std::vector<T>> Lvals;
  std::vector<int64_t> Lpend;                // pruned prefix, -1 = unpruned
  Lrows.reserve(nb); Lvals.reserve(nb); Lpend.reserve(nb);
  std::vector<int64_t> pattern, touched;
  std::vector<std::pair<int64_t, int64_t>> stack;   // (column j, scan pos)
  double umin = std::numeric_limits<double>::infinity(), umax = 0.0;

  for (int64_t k = 0; k < nb; ++k) {
    const int64_t lo = Bp[k], hi = Bp[k + 1];
    // -- symbolic: reach of B(:,k) through the computed L columns --------
    pattern.clear();
    for (int64_t t = lo; t < hi; ++t) {
      int64_t j0 = pinv[Bi[t]];
      if (j0 == -1 || flag[j0]) continue;
      stack.clear();
      stack.emplace_back(j0, 0);
      flag[j0] = 1;
      while (!stack.empty()) {
        auto& [j, pi] = stack.back();
        const auto& rows_j = Lrows[j];
        const int64_t lim =
            Lpend[j] >= 0 ? Lpend[j] : (int64_t)rows_j.size();
        bool advanced = false;
        while (pi < lim) {
          int64_t jj = pinv[rows_j[pi]];
          ++pi;
          if (jj != -1 && !flag[jj]) {
            stack.emplace_back(jj, 0);
            flag[jj] = 1;
            advanced = true;
            break;
          }
        }
        if (!advanced) {
          pattern.push_back(stack.back().first);
          stack.pop_back();
        }
      }
    }
    std::reverse(pattern.begin(), pattern.end());   // topological order
    for (int64_t j : pattern) flag[j] = 0;

    // -- numeric: sparse forward solve -----------------------------------
    touched.clear();
    for (int64_t t = lo; t < hi; ++t) {
      x[Bi[t]] = Bx[t];
      if (!intouch[Bi[t]]) { intouch[Bi[t]] = 1; touched.push_back(Bi[t]); }
    }
    for (int64_t j : pattern) {
      const int64_t pr = res->prow[j];
      const T xj = x[pr];
      const auto& rows_j = Lrows[j];
      const auto& vals_j = Lvals[j];
      for (size_t t = 0; t < rows_j.size(); ++t) {
        const int64_t r = rows_j[t];
        x[r] -= vals_j[t] * xj;
        if (!intouch[r]) { intouch[r] = 1; touched.push_back(r); }
      }
      res->flops += 2.0 * rows_j.size();
      if (!intouch[pr]) { intouch[pr] = 1; touched.push_back(pr); }
    }

    // -- pivot: max |x| over unpivoted touched rows, diag preference -----
    int64_t pr_new = -1;
    double maxv = -1.0;
    bool ktouched = false;
    for (int64_t r : touched) {
      if (r == k) ktouched = true;
      if (pinv[r] != -1) continue;
      const double a = absval(x[r]);
      if (a > maxv) { maxv = a; pr_new = r; }
    }
    T pivval;
    if (pr_new == -1) {                         // no candidate: singular
      if (res->singular_at > k) res->singular_at = k;
      for (int64_t r = 0; r < nb; ++r)
        if (pinv[r] == -1) { pr_new = r; break; }
      pivval = T(0);
    } else {
      if (pinv[k] == -1 && ktouched && absval(x[k]) >= tol * maxv &&
          absval(x[k]) > 0.0)
        pr_new = k;                             // diagonal preference
      pivval = x[pr_new];
      if (pivval == T(0) && res->singular_at > k) res->singular_at = k;
    }
    if (res->singular_at == k) {
      if (halt_if_singular) {
        for (int64_t r : touched) { x[r] = T(0); intouch[r] = 0; }
        res->halted = true;
        res->singular_at = k;
        return res;
      }
      pivval = T(1);                            // klu-style continue
    }
    umin = std::min(umin, absval(pivval));
    umax = std::max(umax, absval(pivval));
    pinv[pr_new] = k;
    res->prow[k] = pr_new;

    // -- emit U column (pivoted) and L column (unpivoted) ----------------
    std::sort(touched.begin(), touched.end());
    std::vector<std::pair<int64_t, T>> ucol;    // (pivot position, value)
    std::vector<int64_t> lrows;
    std::vector<T> lvals;
    for (int64_t r : touched) {
      const T v = x[r];
      x[r] = T(0);
      intouch[r] = 0;
      if (r == pr_new) continue;
      const int64_t jpos = pinv[r];
      // keep the full symbolic reach, including exactly-zero values:
      // gp_refactor clears x over the STORED pattern only, so a dropped
      // position that becomes nonzero under new values would leave a
      // stale entry (reference KLU keeps the reach value-independently,
      // klu_kernel.c lsolve-symbolic; explicit zeros are common in
      // circuit matrices)
      if (jpos != -1) {
        ucol.emplace_back(jpos, v);
      } else {
        lrows.push_back(r);
        lvals.push_back(v / pivval);
      }
    }
    std::stable_sort(ucol.begin(), ucol.end(),
                     [](const auto& a, const auto& b) {
                       return a.first < b.first;
                     });
    for (auto& [jp, v] : ucol) { res->Ui.push_back(jp); res->Ux.push_back(v); }
    res->Ui.push_back(k);
    res->Ux.push_back(pivval);                  // pivot stored last in U col
    res->Up.push_back((int64_t)res->Ui.size());
    for (size_t t = 0; t < lrows.size(); ++t) {
      res->Li.push_back(lrows[t]);              // original ids; mapped later
      res->Lx.push_back(lvals[t]);
    }
    res->Lp.push_back((int64_t)res->Li.size());
    res->flops += (double)lrows.size();
    Lrows.emplace_back(std::move(lrows));
    Lvals.emplace_back(std::move(lvals));
    Lpend.push_back(-1);

    // -- Eisenstat-Liu symmetric pruning ---------------------------------
    for (auto& [j, v] : ucol) {
      if (Lpend[j] >= 0) continue;
      auto& rj = Lrows[j];
      if (std::find(rj.begin(), rj.end(), pr_new) == rj.end()) continue;
      auto& vj = Lvals[j];
      const size_t nrow = rj.size();
      std::vector<int64_t> order(nrow);
      for (size_t t = 0; t < nrow; ++t) order[t] = (int64_t)t;
      std::stable_sort(order.begin(), order.end(),
                       [&](int64_t a, int64_t b) {
                         return (pinv[rj[a]] != -1) > (pinv[rj[b]] != -1);
                       });
      std::vector<int64_t> nr(nrow);
      std::vector<T> nv(nrow);
      int64_t npiv = 0;
      for (size_t t = 0; t < nrow; ++t) {
        nr[t] = rj[order[t]];
        nv[t] = vj[order[t]];
        if (pinv[nr[t]] != -1) ++npiv;
      }
      rj.swap(nr);
      vj.swap(nv);
      Lpend[j] = npiv;
    }
  }
  // map L row indices to final pivot coordinates
  for (auto& r : res->Li) r = pinv[r];
  res->umin = nb ? umin : 0.0;
  res->umax = umax;
  return res;
}

struct Handle {
  void* ptr;
  bool is_complex;
};

// Fixed-pattern value recompute (klu_refactor.c semantics): same pivot
// order, same L/U pattern, new values.  Returns first singular column
// (nb when none).
template <typename T>
int64_t gp_refactor(int64_t nb, const int64_t* Bp, const int64_t* Bi,
                    const T* Bx, const int64_t* pinv, const int64_t* Lp,
                    const int64_t* Li, T* Lx, const int64_t* Up,
                    const int64_t* Ui, T* Ux) {
  std::vector<T> x(nb, T(0));
  int64_t singular_col = nb;
  for (int64_t k = 0; k < nb; ++k) {
    for (int64_t t = Bp[k]; t < Bp[k + 1]; ++t) x[pinv[Bi[t]]] = Bx[t];
    const int64_t ulo = Up[k], uhi = Up[k + 1] - 1;   // last entry = pivot
    for (int64_t t = ulo; t < uhi; ++t) {
      const int64_t j = Ui[t];
      const T xj = x[j];
      Ux[t] = xj;
      for (int64_t s = Lp[j]; s < Lp[j + 1]; ++s) x[Li[s]] -= Lx[s] * xj;
    }
    T piv = x[k];
    Ux[uhi] = piv;
    if (piv == T(0)) {
      if (singular_col > k) singular_col = k;
      piv = T(1);
    }
    for (int64_t s = Lp[k]; s < Lp[k + 1]; ++s) {
      Lx[s] = x[Li[s]] / piv;
      x[Li[s]] = T(0);
    }
    for (int64_t t = ulo; t < uhi; ++t) x[Ui[t]] = T(0);
    x[k] = T(0);
  }
  return singular_col;
}

}  // namespace

extern "C" {

// Returns an opaque handle (never null).  *out_halted = 1 means the
// factorization stopped at a singular column under halt_if_singular.
void* sstpu_klu_factor(int64_t nb, const int64_t* Bp, const int64_t* Bi,
                       const double* Bx, double tol,
                       int64_t halt_if_singular, int64_t is_complex,
                       int64_t* out_lnz, int64_t* out_unz,
                       int64_t* out_sing, int64_t* out_halted,
                       double* out_flops, double* out_umin,
                       double* out_umax) {
  auto* h = new Handle();
  h->is_complex = is_complex != 0;
  if (h->is_complex) {
    auto* r = gp_factor<std::complex<double>>(
        nb, Bp, Bi, reinterpret_cast<const std::complex<double>*>(Bx), tol,
        halt_if_singular != 0);
    h->ptr = r;
    *out_lnz = (int64_t)r->Li.size();
    *out_unz = (int64_t)r->Ui.size();
    *out_sing = r->singular_at;
    *out_halted = r->halted ? 1 : 0;
    *out_flops = r->flops;
    *out_umin = r->umin;
    *out_umax = r->umax;
  } else {
    auto* r = gp_factor<double>(nb, Bp, Bi, Bx, tol, halt_if_singular != 0);
    h->ptr = r;
    *out_lnz = (int64_t)r->Li.size();
    *out_unz = (int64_t)r->Ui.size();
    *out_sing = r->singular_at;
    *out_halted = r->halted ? 1 : 0;
    *out_flops = r->flops;
    *out_umin = r->umin;
    *out_umax = r->umax;
  }
  return h;
}

void sstpu_klu_extract(void* handle, int64_t* Lp, int64_t* Li, double* Lx,
                       int64_t* Up, int64_t* Ui, double* Ux,
                       int64_t* prow) {
  auto* h = static_cast<Handle*>(handle);
  if (h->is_complex) {
    auto* r = static_cast<GPResult<std::complex<double>>*>(h->ptr);
    std::memcpy(Lp, r->Lp.data(), r->Lp.size() * sizeof(int64_t));
    std::memcpy(Li, r->Li.data(), r->Li.size() * sizeof(int64_t));
    std::memcpy(Lx, r->Lx.data(), r->Lx.size() * 2 * sizeof(double));
    std::memcpy(Up, r->Up.data(), r->Up.size() * sizeof(int64_t));
    std::memcpy(Ui, r->Ui.data(), r->Ui.size() * sizeof(int64_t));
    std::memcpy(Ux, r->Ux.data(), r->Ux.size() * 2 * sizeof(double));
    std::memcpy(prow, r->prow.data(), r->prow.size() * sizeof(int64_t));
  } else {
    auto* r = static_cast<GPResult<double>*>(h->ptr);
    std::memcpy(Lp, r->Lp.data(), r->Lp.size() * sizeof(int64_t));
    std::memcpy(Li, r->Li.data(), r->Li.size() * sizeof(int64_t));
    std::memcpy(Lx, r->Lx.data(), r->Lx.size() * sizeof(double));
    std::memcpy(Up, r->Up.data(), r->Up.size() * sizeof(int64_t));
    std::memcpy(Ui, r->Ui.data(), r->Ui.size() * sizeof(int64_t));
    std::memcpy(Ux, r->Ux.data(), r->Ux.size() * sizeof(double));
    std::memcpy(prow, r->prow.data(), r->prow.size() * sizeof(int64_t));
  }
}

int64_t sstpu_klu_refactor(int64_t nb, const int64_t* Bp, const int64_t* Bi,
                           const double* Bx, const int64_t* pinv,
                           const int64_t* Lp, const int64_t* Li, double* Lx,
                           const int64_t* Up, const int64_t* Ui, double* Ux,
                           int64_t is_complex) {
  if (is_complex)
    return gp_refactor<std::complex<double>>(
        nb, Bp, Bi, reinterpret_cast<const std::complex<double>*>(Bx), pinv,
        Lp, Li, reinterpret_cast<std::complex<double>*>(Lx), Up, Ui,
        reinterpret_cast<std::complex<double>*>(Ux));
  return gp_refactor<double>(nb, Bp, Bi, Bx, pinv, Lp, Li, Lx, Up, Ui, Ux);
}

void sstpu_klu_free(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (h->is_complex)
    delete static_cast<GPResult<std::complex<double>>*>(h->ptr);
  else
    delete static_cast<GPResult<double>*>(h->ptr);
  delete h;
}

}  // extern "C"
