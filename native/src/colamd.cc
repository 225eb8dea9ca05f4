// Column approximate minimum degree ordering (COLAMD) — native component
// of suitesparse_tpu.  Fresh implementation of the published algorithm
// (Davis, Gilbert, Larimore, Ng, "A column approximate minimum degree
// ordering algorithm", ACM TOMS 2004) in its row-merge formulation: the
// column graph of A'A is never formed; rows of A act as the elements and
// each pivot step replaces the rows of the pivot column by their union
// (parity target, not copied code — see COLAMD/Source/colamd.c for the
// reference's arena-based version: init_rows_cols :1647, init_scoring
// :1884, find_ordering :2159, detect_super_cols :2595).
//
// Behaviors kept from the reference:
//   * score(c) = sum over rows r of c of (|r| - 1), capped at n-1
//   * dense columns (> max(16, dense_col*sqrt(m)) entries) ordered last;
//     dense rows (> max(16, dense_row*sqrt(n)) entries) dropped up front
//   * supercolumn detection by row-pattern hashing after each pivot
//   * aggressive row absorption: a live row whose live columns are all in
//     the new pivot row is redundant and is killed
//
// Implementation choices that differ on purpose (clarity over arena
// micro-management; host analysis is not the TPU bottleneck): per-row and
// per-column adjacency as std::vector with in-place pruning instead of the
// reference's single-array storage with garbage collection.
//
// Input: CSC pattern of the m-by-n matrix A (0-based; rows need not be
// sorted; duplicates tolerated).  Output: perm[k] = k-th pivot column.

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>

typedef int64_t i64;

namespace {

struct Colamd {
  i64 m, n;
  std::vector<std::vector<i64>> colrows;  // live rows of each live column
  std::vector<std::vector<i64>> rowcols;  // live columns of each live row
  std::vector<char> col_alive, row_alive;
  std::vector<i64> rowlen;                // live-column count per row
  std::vector<i64> score;
  std::vector<std::vector<i64>> members;  // supercolumn member lists
  // degree lists
  std::vector<i64> head, nxt, prv, listkey;
  i64 minscore = 0;
  // stamps
  std::vector<i64> col_stamp, row_stamp;
  i64 stamp = 0;

  void deg_insert(i64 c, i64 s) {
    nxt[c] = head[s];
    prv[c] = -1;
    if (head[s] != -1) prv[head[s]] = c;
    head[s] = c;
    listkey[c] = s;
    if (s < minscore) minscore = s;
  }
  void deg_remove(i64 c) {
    i64 s = listkey[c];
    if (s < 0) return;
    if (prv[c] != -1) nxt[prv[c]] = nxt[c]; else head[s] = nxt[c];
    if (nxt[c] != -1) prv[nxt[c]] = prv[c];
    listkey[c] = -1;
  }
};

}  // namespace

// Returns the number of non-dense, non-empty columns ordered before the
// dense tail, or -1 on invalid input.
extern "C" i64 sstpu_colamd(i64 nrow, i64 ncol, const i64 *Ap, const i64 *Ai,
                            i64 *perm, double dense_row, double dense_col) {
  if (nrow < 0 || ncol < 0) return -1;
  const i64 m = nrow, n = ncol;
  Colamd S;
  S.m = m; S.n = n;
  S.colrows.assign(n, {});
  S.rowcols.assign(m, {});
  S.col_alive.assign(n, 1);
  S.row_alive.assign(m, 1);
  S.rowlen.assign(m, 0);
  S.score.assign(n, 0);
  S.members.assign(n, {});
  S.head.assign(n + 1, -1);
  S.nxt.assign(n, -1);
  S.prv.assign(n, -1);
  S.listkey.assign(n, -1);
  S.col_stamp.assign(n, -1);
  S.row_stamp.assign(m, -1);

  // --- init: build row/col lists, drop dense rows, defer dense columns ----
  std::vector<i64> rcount(m, 0);
  for (i64 t = 0; t < Ap[n]; t++) {
    if (Ai[t] < 0 || Ai[t] >= m) return -1;
    rcount[Ai[t]]++;
  }
  const double rthresh =
      dense_row <= 0 ? (double)n
                     : std::max(16.0, dense_row * std::sqrt((double)(n > 0 ? n : 1)));
  const double cthresh =
      dense_col <= 0 ? (double)m
                     : std::max(16.0, dense_col * std::sqrt((double)(m > 0 ? m : 1)));
  for (i64 r = 0; r < m; r++)
    if ((double)rcount[r] > rthresh) S.row_alive[r] = 0;  // dense row: drop

  std::vector<i64> dense_cols;
  std::vector<i64> seen(m, -1);
  for (i64 c = 0; c < n; c++) {
    S.members[c].push_back(c);
    i64 cnt = Ap[c + 1] - Ap[c];
    if ((double)cnt > cthresh) {
      S.col_alive[c] = 0;
      dense_cols.push_back(c);
      continue;
    }
    auto &rows = S.colrows[c];
    for (i64 t = Ap[c]; t < Ap[c + 1]; t++) {
      i64 r = Ai[t];
      if (!S.row_alive[r] || seen[r] == c) continue;  // dropped or duplicate
      seen[r] = c;
      rows.push_back(r);
    }
  }
  for (i64 c = 0; c < n; c++) {
    if (!S.col_alive[c]) continue;
    for (i64 r : S.colrows[c]) {
      S.rowcols[r].push_back(c);
      S.rowlen[r]++;
    }
  }
  // empty rows die
  for (i64 r = 0; r < m; r++)
    if (S.rowlen[r] == 0) S.row_alive[r] = 0;

  // initial scores
  for (i64 c = 0; c < n; c++) {
    if (!S.col_alive[c]) continue;
    i64 s = 0;
    for (i64 r : S.colrows[c]) s += S.rowlen[r] - 1;
    if (s > n - 1) s = n - 1;
    if (s < 0) s = 0;
    S.score[c] = s;
    S.deg_insert(c, s);
  }
  S.minscore = 0;

  // rows created by pivoting get ids >= m in col lists; store their data in
  // growable parallel arrays indexed by (id - m).
  std::vector<std::vector<i64>> newrows;
  std::vector<char> newrow_alive;
  std::vector<i64> newrow_len, newrow_stamp;
  auto row_live = [&](i64 r) {
    return r < m ? (bool)S.row_alive[r] : (bool)newrow_alive[r - m];
  };
  auto row_kill = [&](i64 r) {
    if (r < m) S.row_alive[r] = 0; else newrow_alive[r - m] = 0;
  };
  auto row_list = [&](i64 r) -> std::vector<i64> & {
    return r < m ? S.rowcols[r] : newrows[r - m];
  };
  auto row_len = [&](i64 r) -> i64 & {
    return r < m ? S.rowlen[r] : newrow_len[r - m];
  };
  auto row_mark = [&](i64 r) -> i64 & {
    return r < m ? S.row_stamp[r] : newrow_stamp[r - m];
  };

  i64 k = 0;
  std::vector<i64> pivot_cols;
  std::vector<i64> hash_bucket_ids;
  while (true) {
    // --- select the min-score live column ---------------------------------
    i64 p = -1;
    while (S.minscore <= n) {
      if (S.minscore == n) break;
      p = S.head[S.minscore];
      if (p != -1) break;
      S.minscore++;
    }
    if (p == -1) break;
    S.deg_remove(p);
    S.col_alive[p] = 0;

    // emit the supercolumn's members contiguously
    for (i64 c : S.members[p]) perm[k++] = c;

    // --- pivot row = union of p's live rows (all of which die) ------------
    S.stamp++;
    pivot_cols.clear();
    for (i64 r : S.colrows[p]) {
      if (!row_live(r)) continue;
      for (i64 c : row_list(r)) {
        if (c == p || !S.col_alive[c]) continue;
        if (S.col_stamp[c] == S.stamp) continue;
        S.col_stamp[c] = S.stamp;
        pivot_cols.push_back(c);
      }
      row_kill(r);
    }
    S.colrows[p].clear();
    if (pivot_cols.empty()) continue;

    const i64 newid = m + (i64)newrows.size();
    newrows.push_back(pivot_cols);
    newrow_alive.push_back(1);
    newrow_len.push_back((i64)pivot_cols.size());
    newrow_stamp.push_back(-1);

    // --- prune, absorb, rescore the columns of the pivot row --------------
    for (i64 c : pivot_cols) {
      auto &rows = S.colrows[c];
      i64 w = 0;
      for (i64 r : rows) {
        if (!row_live(r)) continue;
        // aggressive absorption: a row whose live columns all sit inside
        // the pivot row adds nothing beyond the new element -> kill it.
        if (row_mark(r) != S.stamp) {
          row_mark(r) = S.stamp;
          if (row_len(r) <= (i64)pivot_cols.size()) {
            bool subset = true;
            i64 live = 0;
            auto &rc = row_list(r);
            i64 wr = 0;
            for (i64 cc : rc) {
              if (!S.col_alive[cc]) continue;
              rc[wr++] = cc;
              live++;
              if (S.col_stamp[cc] != S.stamp) subset = false;
            }
            rc.resize(wr);
            row_len(r) = live;
            if (live == 0 || subset) {
              row_kill(r);
              continue;
            }
          }
        }
        if (!row_live(r)) continue;
        rows[w++] = r;
      }
      rows.resize(w);
      rows.push_back(newid);
    }

    // --- supercolumn detection (hash row patterns) -------------------------
    if (pivot_cols.size() > 1) {
      // hash by sum of live row ids
      std::vector<std::pair<i64, i64>> hc;  // (hash, col)
      hc.reserve(pivot_cols.size());
      for (i64 c : pivot_cols) {
        if (!S.col_alive[c]) continue;
        i64 h = 0;
        for (i64 r : S.colrows[c])
          if (row_live(r)) h += r * 2654435761LL;
        hc.emplace_back(h, c);
      }
      std::sort(hc.begin(), hc.end());
      for (size_t a = 0; a + 1 < hc.size(); a++) {
        if (!S.col_alive[hc[a].second]) continue;
        for (size_t b = a + 1; b < hc.size() && hc[b].first == hc[a].first;
             b++) {
          i64 c1 = hc[a].second, c2 = hc[b].second;
          if (!S.col_alive[c2]) continue;
          // exact pattern compare over live rows
          std::vector<i64> p1, p2;
          for (i64 r : S.colrows[c1]) if (row_live(r)) p1.push_back(r);
          for (i64 r : S.colrows[c2]) if (row_live(r)) p2.push_back(r);
          std::sort(p1.begin(), p1.end());
          std::sort(p2.begin(), p2.end());
          if (p1 != p2) continue;
          // merge c2 into c1: every shared row loses one live column
          for (i64 r : p2) row_len(r)--;
          S.col_alive[c2] = 0;
          S.deg_remove(c2);
          auto &mb = S.members[c1];
          mb.insert(mb.end(), S.members[c2].begin(), S.members[c2].end());
          S.members[c2].clear();
          S.colrows[c2].clear();
        }
      }
    }

    // --- new scores for the surviving pivot-row columns -------------------
    for (i64 c : pivot_cols) {
      if (!S.col_alive[c]) continue;
      i64 s = 0;
      auto &rows = S.colrows[c];
      i64 w = 0;
      for (i64 r : rows) {
        if (!row_live(r)) continue;
        rows[w++] = r;
        s += row_len(r) - 1;
      }
      rows.resize(w);
      if (s > n - 1) s = n - 1;
      if (s < 0) s = 0;
      S.deg_remove(c);
      S.score[c] = s;
      S.deg_insert(c, s);
    }
    if (S.minscore < 0) S.minscore = 0;
  }

  const i64 nordered = k;
  for (i64 c : dense_cols) perm[k++] = c;  // dense columns last (colamd.h)
  return nordered;
}
