// Approximate minimum degree ordering (AMD) — native component of
// suitesparse_tpu.  Fresh implementation of the published algorithm
// (Amestoy, Davis, Duff, "An Approximate Minimum Degree Ordering
// Algorithm", SIAM J. Matrix Anal. Appl. 1996), with the behaviors the
// reference exposes (parity targets, not copied code — see
// AMD/Source/amd_2.c for the reference's version):
//   * quotient-graph elimination with element absorption
//   * approximate external degrees (bound d_i = |A_i\Lp| + |Lp\i| + sum|Le\Lp|)
//   * supervariable detection via hashing, mass elimination via degree-0 lists
//   * aggressive absorption of elements fully covered by the new element
//   * dense-row postponement: degree > max(16, dense*sqrt(n)) ordered last
//     (reference default dense=10, amd.h:140-148)
//   * constrained variant (CAMD parity): optional cmember[] — pivots are
//     drawn from the lowest-numbered nonempty constraint set, so the output
//     keeps constraint sets contiguous and in order.
//
// Implementation choices that differ from the reference on purpose (clarity
// over micro-optimization; host analysis is not the TPU bottleneck):
//   * exact |Le \ Lp| by scanning each adjacent element once per pivot with
//     stamp arrays (the degree is still "approximate" in AMD's sense because
//     element overlaps are double-counted);
//   * garbage collection = copy live lists into a fresh buffer;
//   * per-variable list rebuild via a scratch vector.
//
// Input: pattern of A+A' WITHOUT the diagonal, CSC, 0-based (need not be
// sorted).  Output: perm[k] = k-th pivot (old index).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

typedef int64_t i64;

namespace {

struct AMD {
  i64 n;
  std::vector<i64> iw;       // adjacency storage
  std::vector<i64> pe, len;  // list start / length per node
  std::vector<i64> elen;     // first elen entries of a variable's list are elements
  std::vector<i64> nv;       // supervariable size (0 = absorbed variable)
  std::vector<i64> degree;   // approximate external degree (variables)
  std::vector<char> is_elem; // node has become an element
  std::vector<char> dead;    // element absorbed / variable merged or ordered
  std::vector<i64> mergeto;  // variable merged into supervariable (else -1)
  std::vector<i64> eparent;  // element absorbed into element (else -1)
  // stamps
  std::vector<i64> stamp_var;   // stamp_var[v]==iter  <=> v in Lp this iter
  std::vector<i64> stamp_elem;  // element visited this iter
  std::vector<i64> ext;         // |Le \ Lp| cache per element this iter
  // degree lists; listdeg[i] remembers the key i was inserted under, so
  // removal stays correct after the degree value changes
  std::vector<i64> head, nxt, prv, listdeg;
  i64 pfree = 0;
  i64 mindeg = 0;

  void deg_insert(i64 i, i64 d) {
    nxt[i] = head[d];
    prv[i] = -1;
    if (head[d] != -1) prv[head[d]] = i;
    head[d] = i;
    listdeg[i] = d;
    if (d < mindeg) mindeg = d;
  }
  void deg_remove(i64 i) {
    i64 d = listdeg[i];
    if (d < 0) return;  // not in a list
    if (prv[i] != -1) nxt[prv[i]] = nxt[i]; else head[d] = nxt[i];
    if (nxt[i] != -1) prv[nxt[i]] = prv[i];
    nxt[i] = prv[i] = -1;
    listdeg[i] = -1;
  }
  // compact all live lists into a fresh buffer (garbage collection)
  i64 ngc = 0;
  void gc(i64 extra) {
    ngc++;
    i64 live = 0;
    for (i64 j = 0; j < n; j++) if (!dead[j]) live += len[j];
    std::vector<i64> fresh;
    fresh.reserve(std::max(live + extra + 16, (i64)iw.size()));
    for (i64 j = 0; j < n; j++) {
      if (dead[j]) continue;
      i64 p = pe[j];
      pe[j] = (i64)fresh.size();
      for (i64 k = 0; k < len[j]; k++) fresh.push_back(iw[p + k]);
    }
    pfree = (i64)fresh.size();
    fresh.resize(std::max((i64)fresh.size() + extra + 16, (i64)iw.size()));
    iw.swap(fresh);
  }
};

}  // namespace

extern "C" i64 sstpu_amd(
    i64 n, const i64 *Ap, const i64 *Ai,
    i64 *perm,            // out: perm[k] = k-th pivot (old index)
    const i64 *cmember,   // optional constraint set per node (may be null)
    double dense_thresh,  // <0: never postpone
    i64 aggressive)
{
  if (n <= 0) return 0;
  i64 nz = Ap[n];
  AMD S;
  S.n = n;
  S.iw.assign(nz + nz / 4 + 2 * n + 16, 0);
  S.pe.assign(n, 0);
  S.len.assign(n, 0);
  S.elen.assign(n, 0);
  S.nv.assign(n, 1);
  S.degree.assign(n, 0);
  S.is_elem.assign(n, 0);
  S.dead.assign(n, 0);
  S.mergeto.assign(n, -1);
  S.eparent.assign(n, -1);
  S.stamp_var.assign(n, -1);
  S.stamp_elem.assign(n, -1);
  S.ext.assign(n, 0);
  S.head.assign(n + 1, -1);
  S.nxt.assign(n, -1);
  S.prv.assign(n, -1);
  S.listdeg.assign(n, -1);

  std::copy(Ai, Ai + nz, S.iw.begin());
  for (i64 j = 0; j < n; j++) {
    S.pe[j] = Ap[j];
    S.len[j] = Ap[j + 1] - Ap[j];
    S.degree[j] = S.len[j];  // nv all 1 initially
  }
  S.pfree = nz;

  const bool constrained = (cmember != nullptr);
  // constrained mode: no postponement, so constraint sets stay contiguous
  i64 dense = (dense_thresh < 0 || constrained)
      ? n + 1
      : (i64)std::max(16.0, dense_thresh * std::sqrt((double)n));

  std::vector<i64> order_of(n, -1);
  std::vector<char> postponed(n, 0);
  std::vector<i64> postponed_list;
  i64 stamp_counter = 0;
  i64 pivk = 0;   // next output position stamp
  i64 nlive = n;  // variables not yet ordered/merged (in nv units)
  i64 nel = 0;    // eliminated original-variable count

  // constrained mode: degree lists hold ONLY the active constraint set.
  // A full-list scan filtered by cmember (the naive CAMD pick) is O(n)
  // per pivot -> O(n^2) total; with per-set activation each pick is the
  // plain AMD O(1)-amortized list pop (measured 40x on n=85k nesdis camd).
  i64 cmax = 0;
  std::vector<std::vector<i64>> set_members;
  if (constrained) {
    for (i64 i = 0; i < n; i++) cmax = std::max(cmax, cmember[i]);
    set_members.assign((size_t)cmax + 1, {});
    for (i64 i = 0; i < n; i++) set_members[cmember[i]].push_back(i);
  }
  for (i64 i = 0; i < n; i++) {
    i64 d = S.degree[i];
    if (d > dense) {
      postponed[i] = 1;
      postponed_list.push_back(i);
    } else if (!constrained || cmember[i] == 0) {
      S.deg_insert(i, d);
    }
  }
  S.mindeg = 0;

  i64 active_c = 0;
  std::vector<i64> scratch;

  auto activate_set = [&](i64 c) {
    for (i64 i : set_members[c])
      if (!S.dead[i] && !S.is_elem[i] && S.nv[i] > 0 && S.listdeg[i] < 0 &&
          order_of[i] == -1)
        S.deg_insert(i, S.degree[i]);
    S.mindeg = 0;
  };

  auto pick = [&]() -> i64 {
    for (;;) {
      for (i64 d = S.mindeg; d <= n; d++) {
        i64 i = S.head[d];
        if (i != -1) {
          S.mindeg = d;
          S.deg_remove(i);
          return i;
        }
      }
      if (constrained && active_c < cmax) {
        active_c++;
        activate_set(active_c);
        continue;
      }
      return -1;
    }
  };

  while (true) {
    i64 me = pick();
    if (me == -1) break;
    i64 iter = stamp_counter++;

    // ---------------- form element Lp = Lme ----------------
    i64 nvpiv = S.nv[me];
    order_of[me] = pivk++;
    nel += nvpiv;

    // upper bound on |Lme|
    i64 need = S.len[me];
    {
      i64 p = S.pe[me];
      for (i64 k = 0; k < S.elen[me]; k++) {
        i64 e = S.iw[p + k];
        if (!S.dead[e]) need += S.len[e];
      }
    }
    if (S.pfree + need > (i64)S.iw.size()) S.gc(need);

    i64 pme = S.pfree;
    i64 degme = 0;  // total nv in Lme (excluding me)
    {
      i64 p = S.pe[me];
      // direct variable neighbors
      for (i64 k = S.elen[me]; k < S.len[me]; k++) {
        i64 v = S.iw[p + k];
        if (S.nv[v] > 0 && !S.is_elem[v] && !S.dead[v] && S.stamp_var[v] != iter) {
          S.stamp_var[v] = iter;
          degme += S.nv[v];
          S.iw[S.pfree++] = v;
        }
      }
      // neighbors via adjacent elements; absorb those elements
      for (i64 k = 0; k < S.elen[me]; k++) {
        i64 e = S.iw[p + k];
        if (S.dead[e]) continue;
        i64 pe_ = S.pe[e];
        for (i64 kk = 0; kk < S.len[e]; kk++) {
          i64 v = S.iw[pe_ + kk];
          if (S.nv[v] > 0 && !S.is_elem[v] && !S.dead[v] && v != me &&
              S.stamp_var[v] != iter) {
            S.stamp_var[v] = iter;
            degme += S.nv[v];
            S.iw[S.pfree++] = v;
          }
        }
        S.dead[e] = 1;            // e absorbed into me
        S.eparent[e] = me;
      }
    }
    i64 lme_len = S.pfree - pme;
    S.pe[me] = pme;
    S.len[me] = lme_len;
    S.elen[me] = 0;
    S.is_elem[me] = 1;
    S.nv[me] = nvpiv;  // element "size" kept for ext computations? vars only
    nlive -= nvpiv;

    // -------------- exact |Le \ Lp| for adjacent elements --------------
    for (i64 q = pme; q < pme + lme_len; q++) {
      i64 i = S.iw[q];
      i64 pi = S.pe[i];
      for (i64 k = 0; k < S.elen[i]; k++) {
        i64 e = S.iw[pi + k];
        if (S.dead[e] || S.stamp_elem[e] == iter) continue;
        S.stamp_elem[e] = iter;
        i64 x = 0;
        i64 pe_ = S.pe[e];
        for (i64 kk = 0; kk < S.len[e]; kk++) {
          i64 v = S.iw[pe_ + kk];
          if (S.nv[v] > 0 && !S.is_elem[v] && !S.dead[v] &&
              S.stamp_var[v] != iter) x += S.nv[v];
        }
        S.ext[e] = x;
      }
    }

    // -------------- update each variable i in Lp --------------
    // hash buckets local to this pivot
    std::vector<std::pair<i64, i64>> hashed;  // (hash, var)
    hashed.reserve(lme_len);
    for (i64 q = pme; q < pme + lme_len; q++) {
      i64 i = S.iw[q];
      if (S.nv[i] <= 0 || S.dead[i]) continue;
      i64 pi = S.pe[i];
      scratch.clear();
      // live elements with nonzero external part (others absorbed)
      i64 deg = 0;
      uint64_t hash = 0;
      i64 nelems = 0;
      for (i64 k = 0; k < S.elen[i]; k++) {
        i64 e = S.iw[pi + k];
        if (S.dead[e]) continue;
        if (S.ext[e] == 0 && S.stamp_elem[e] == iter && aggressive) {
          S.dead[e] = 1;  // aggressive absorption into me
          S.eparent[e] = me;
          continue;
        }
        deg += S.ext[e];  // every live element adjacent to Lp was stamped
        scratch.push_back(e);
        hash += (uint64_t)e * 0x9e3779b97f4a7c15ull;
        nelems++;
      }
      // me becomes an element neighbor
      scratch.push_back(me);
      hash += (uint64_t)me * 0x9e3779b97f4a7c15ull;
      nelems++;
      // live variable neighbors not in Lp
      for (i64 k = S.elen[i]; k < S.len[i]; k++) {
        i64 v = S.iw[pi + k];
        if (v == me || S.dead[v] || S.is_elem[v] || S.nv[v] <= 0) continue;
        if (S.stamp_var[v] == iter) continue;  // covered by element me
        deg += S.nv[v];
        scratch.push_back(v);
        hash += (uint64_t)v * 0x9e3779b97f4a7c15ull;
      }
      // rebuild i's list (fits: at least one slot was freed — either the
      // direct entry `me` or a dead element — before we appended `me`)
      for (size_t k = 0; k < scratch.size(); k++) S.iw[pi + (i64)k] = scratch[k];
      S.elen[i] = nelems;
      S.len[i] = (i64)scratch.size();
      // approximate external degree
      i64 newdeg = deg + (degme - S.nv[i]);
      i64 cap = nlive - S.nv[i];
      if (newdeg > cap) newdeg = cap;
      if (newdeg < 0) newdeg = 0;
      S.degree[i] = newdeg;
      hashed.emplace_back((i64)(hash % (uint64_t)(2 * n + 1)), i);
    }

    // -------------- supervariable detection --------------
    std::sort(hashed.begin(), hashed.end());
    for (size_t a = 0; a < hashed.size(); a++) {
      i64 i = hashed[a].second;
      if (S.dead[i] || S.nv[i] <= 0) continue;
      for (size_t b = a + 1; b < hashed.size() && hashed[b].first == hashed[a].first; b++) {
        i64 j = hashed[b].second;
        if (S.dead[j] || S.nv[j] <= 0) continue;
        if (constrained && cmember[i] != cmember[j]) continue;
        if (S.len[i] != S.len[j] || S.elen[i] != S.elen[j]) continue;
        // exact set comparison via stamps
        i64 t = stamp_counter++;
        i64 pi = S.pe[i], pj = S.pe[j];
        for (i64 k = 0; k < S.len[i]; k++) S.stamp_var[S.iw[pi + k]] = t;
        bool same = true;
        for (i64 k = 0; k < S.len[j]; k++)
          if (S.stamp_var[S.iw[pj + k]] != t) { same = false; break; }
        if (same) {
          // absorb j into supervariable i
          S.nv[i] += S.nv[j];
          S.nv[j] = 0;
          S.dead[j] = 1;
          S.mergeto[j] = i;
          if (!postponed[j]) S.deg_remove(j);
        }
      }
    }

    // -------------- compact element me's list; reinsert variables ---------
    i64 w = pme;
    for (i64 q = pme; q < pme + lme_len; q++) {
      i64 i = S.iw[q];
      if (S.dead[i] || S.nv[i] <= 0) continue;
      S.iw[w++] = i;
      if (postponed[i]) continue;
      i64 d = S.degree[i];
      S.deg_remove(i);  // remove under the old key (listdeg), if listed
      if (d > dense) {
        postponed[i] = 1;
        postponed_list.push_back(i);
      } else if (!constrained || cmember[i] <= active_c) {
        // nodes of not-yet-active constraint sets stay out of the lists;
        // activate_set inserts them with their then-current degree
        S.deg_insert(i, d);
      }
    }
    S.len[me] = w - pme;
    S.pfree = w;
    if (S.len[me] == 0) S.dead[me] = 1;  // element fully consumed
  }

  // ---- postponed dense variables last (by degree, constraint-major) ----
  std::sort(postponed_list.begin(), postponed_list.end(), [&](i64 a, i64 b) {
    if (constrained && cmember[a] != cmember[b]) return cmember[a] < cmember[b];
    if (S.degree[a] != S.degree[b]) return S.degree[a] < S.degree[b];
    return a < b;
  });
  for (i64 i : postponed_list)
    if (!S.dead[i] && order_of[i] == -1) order_of[i] = pivk++;

  // ---- expand supervariables into the final permutation ----
  std::vector<i64> repof(n);
  for (i64 i = 0; i < n; i++) {
    i64 r = i;
    while (S.mergeto[r] != -1) r = S.mergeto[r];
    repof[i] = r;
  }
  std::vector<std::vector<i64>> members(n);
  for (i64 i = 0; i < n; i++)
    if (repof[i] != i) members[repof[i]].push_back(i);
  std::vector<i64> reps;
  reps.reserve(n);
  for (i64 i = 0; i < n; i++)
    if (repof[i] == i && order_of[i] != -1) reps.push_back(i);
  std::sort(reps.begin(), reps.end(),
            [&](i64 a, i64 b) { return order_of[a] < order_of[b]; });
  i64 k = 0;
  for (i64 r : reps) {
    perm[k++] = r;
    for (i64 m : members[r]) perm[k++] = m;
  }
  if (k < n) {  // safety net: never drop nodes
    std::vector<char> seen(n, 0);
    for (i64 t = 0; t < k; t++) seen[perm[t]] = 1;
    for (i64 i = 0; i < n; i++) if (!seen[i]) perm[k++] = i;
  }
  return S.ngc;
}

// ---------------------------------------------------------------------------
// Relaxed supernode amalgamation (round 4): exact port of the Python merge
// loop in cholesky/supernodal.py (reference behavior anchor:
// CHOLMOD/Supernodal/cholmod_super_symbolic.c:475-560).  The repeated
// union-find passes were ~5 s of Python at n=262k.
// super_in: fundamental supernode column starts (nsuper+1).
// Returns the merged supernode count; merged starts in starts_out.
#include <vector>
extern "C" int64_t sstpu_amalgamate(
    int64_t n, int64_t nsuper, const int64_t* super_in,
    const int64_t* parent, const int64_t* colcount,
    int64_t nrelax0, int64_t nrelax1, int64_t nrelax2,
    double zrelax0, double zrelax1, double zrelax2,
    int64_t* starts_out) {
    std::vector<int64_t> sup(super_in, super_in + nsuper + 1);
    std::vector<int64_t> mp(nsuper), snsize(nsuper), first_cc(nsuper);
    std::vector<double> zeros(nsuper, 0.0);
    std::vector<int64_t> col_sn(n);
    for (int64_t s = 0; s < nsuper; ++s) {
        mp[s] = s;
        snsize[s] = sup[s + 1] - sup[s];
        first_cc[s] = colcount[sup[s]];
        for (int64_t j = sup[s]; j < sup[s + 1]; ++j) col_sn[j] = s;
    }
    auto find = [&](int64_t s) {
        while (mp[s] != s) {
            mp[s] = mp[mp[s]];
            s = mp[s];
        }
        return s;
    };
    bool changed = true;
    while (changed) {
        changed = false;
        for (int64_t s = nsuper - 1; s >= 0; --s) {
            int64_t rs = find(s);
            int64_t last = sup[rs] + snsize[rs] - 1;
            int64_t pc = parent[last];
            if (pc < 0) continue;
            int64_t rp = find(col_sn[pc]);
            if (rp == rs) continue;
            if (sup[rs] + snsize[rs] != sup[rp]) continue;
            int64_t ns0 = snsize[rs], ns1 = snsize[rp];
            int64_t ns = ns0 + ns1;
            int64_t lnz0 = first_cc[rs], lnz1 = first_cc[rp];
            double newzeros = (double)ns0 * (double)(lnz1 + ns0 - lnz0);
            double totzeros = zeros[rs] + zeros[rp] + newzeros;
            int64_t merged_rows = lnz1 + ns0;
            double totsize = (double)ns * (ns + 1) / 2.0
                + (double)ns * (merged_rows - ns);
            double z = totzeros / (totsize > 1.0 ? totsize : 1.0);
            bool ok = (ns <= nrelax0 || newzeros == 0.0
                       || (ns <= nrelax1 && z < zrelax0)
                       || (ns <= nrelax2 && z < zrelax1)
                       || (z < zrelax2));
            if (ok) {
                mp[rs] = rp;
                sup[rp] = sup[rs];
                snsize[rp] = ns;
                first_cc[rp] = merged_rows;
                zeros[rp] = totzeros;
                changed = true;
            }
        }
    }
    int64_t cnt = 0;
    for (int64_t s = 0; s < nsuper; ++s)
        if (find(s) == s) starts_out[cnt++] = sup[s];
    std::sort(starts_out, starts_out + cnt);
    return cnt;
}
