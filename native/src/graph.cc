// Native graph/structure kernels: etree, postorder, column counts.
// C++ twins of suitesparse_tpu/graph/structure.py (same algorithms —
// Liu's etree with path compression, stack DFS postorder, row-subtree
// column counts).  These are the host-analysis hot loops (reference
// equivalents: CHOLMOD/Cholesky/cholmod_etree.c, cholmod_postorder.c,
// cholmod_rowcolcounts.c).

#include <cstdint>
#include <vector>

typedef int64_t i64;

// Elimination tree of A (upper triangle used), or of A'A when col != 0.
extern "C" void sstpu_etree(i64 n, i64 nrow, const i64 *Ap, const i64 *Ai,
                            i64 col, i64 *parent) {
  std::vector<i64> ancestor(n, -1);
  std::vector<i64> prev;
  if (col) prev.assign(nrow, -1);
  for (i64 j = 0; j < n; j++) parent[j] = -1;
  for (i64 k = 0; k < n; k++) {
    for (i64 p = Ap[k]; p < Ap[k + 1]; p++) {
      i64 r = Ai[p];
      i64 i;
      if (col) {
        i = prev[r];
        prev[r] = k;
      } else {
        i = r;
      }
      while (i != -1 && i < k) {
        i64 nxt = ancestor[i];
        ancestor[i] = k;
        if (nxt == -1) {
          parent[i] = k;
          break;
        }
        i = nxt;
      }
    }
  }
}

// Postorder of a forest; children visited in natural (ascending) order.
extern "C" void sstpu_postorder(i64 n, const i64 *parent, i64 *post) {
  std::vector<i64> head(n, -1), next(n, -1), stack(n);
  for (i64 j = n - 1; j >= 0; j--) {
    i64 p = parent[j];
    if (p != -1) {
      next[j] = head[p];
      head[p] = j;
    }
  }
  i64 k = 0;
  for (i64 root = 0; root < n; root++) {
    if (parent[root] != -1) continue;
    i64 top = 0;
    stack[0] = root;
    while (top >= 0) {
      i64 node = stack[top];
      i64 child = head[node];
      if (child == -1) {
        post[k++] = node;
        top--;
      } else {
        head[node] = next[child];
        stack[++top] = child;
      }
    }
  }
}

// Column counts of the Cholesky factor of A (symmetric, upper stored):
// row-subtree traversal per row (exact; O(sum |subtree|)).
extern "C" void sstpu_colcounts(i64 n, const i64 *Ap, const i64 *Ai,
                                const i64 *parent, i64 *counts) {
  std::vector<char> flag(n, 0);
  std::vector<i64> touched;
  touched.reserve(64);
  for (i64 j = 0; j < n; j++) counts[j] = 1;  // diagonal
  for (i64 k = 0; k < n; k++) {
    flag[k] = 1;
    touched.clear();
    for (i64 p = Ap[k]; p < Ap[k + 1]; p++) {
      i64 i = Ai[p];
      if (i >= k) continue;
      while (!flag[i]) {
        flag[i] = 1;
        touched.push_back(i);
        counts[i] += 1;
        i = parent[i];
        if (i == -1 || i >= k) break;
      }
    }
    for (i64 t : touched) flag[t] = 0;
    flag[k] = 0;
  }
}
