"""Foundation-layer tests: containers, conversions, structural ops, I/O.

Oracle = scipy.sparse (the analog of the reference's Tcov result checking,
CHOLMOD/Tcov/README.txt:18-20).
"""
import io

import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.core.sparse import (SYM_UPPER, SparseCSC, Triplet, aat,
                                         add, eye, horzcat, invert_permutation,
                                         spzeros, submatrix, symmetry, vertcat)
from suitesparse_tpu.io import generators, mmread, mmwrite, rbread, rbwrite


def _rand(m, n, d=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return sp.random(m, n, density=d, random_state=rng, format="csc")


class TestContainers:
    def test_from_to_scipy_roundtrip(self):
        S = _rand(10, 8)
        A = SparseCSC.from_scipy(S)
        assert A.check()
        assert np.allclose((A.to_scipy() - S).toarray(), 0)

    def test_triplet_roundtrip_with_duplicates(self):
        row = np.array([0, 1, 0, 2, 0])
        col = np.array([0, 1, 0, 2, 1])
        val = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        A = Triplet(row, col, val, (3, 3)).to_csc()
        D = A.to_scipy().toarray()
        assert D[0, 0] == 4.0 and D[1, 1] == 2.0 and D[2, 2] == 4.0 and D[0, 1] == 5.0
        t2 = A.to_triplet()
        assert Triplet(t2.row, t2.col, t2.data, t2.shape).to_csc().to_scipy().toarray() == pytest.approx(D)

    def test_transpose(self):
        S = _rand(7, 12, seed=1)
        A = SparseCSC.from_scipy(S)
        T = A.transpose()
        assert T.check() and T.sorted
        assert np.allclose(T.to_scipy().toarray(), S.T.toarray())

    def test_permute(self, rng):
        S = _rand(9, 9, seed=2)
        A = SparseCSC.from_scipy(S)
        p = rng.permutation(9)
        q = rng.permutation(9)
        C = A.permute(p, q)
        D = S.toarray()[np.ix_(p, q)]
        assert np.allclose(C.to_scipy().toarray(), D)

    def test_symperm(self, rng):
        S = _rand(8, 8, seed=3)
        S = S + S.T + 8 * sp.identity(8)
        U = sp.triu(S).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        p = rng.permutation(8)
        C = A.symperm(p)
        full = C.to_scipy().toarray()
        expect = S.toarray()[np.ix_(p, p)]
        assert np.allclose(full, expect)

    def test_band_tril_triu(self):
        S = _rand(10, 10, d=0.5, seed=4)
        A = SparseCSC.from_scipy(S)
        assert np.allclose(A.tril().to_scipy().toarray(), sp.tril(S).toarray())
        assert np.allclose(A.triu().to_scipy().toarray(), sp.triu(S).toarray())
        assert np.allclose(A.band(-1, 1).to_scipy().toarray(),
                           sp.tril(sp.triu(S, -1), 1).toarray())

    def test_add_and_cats(self):
        S1, S2 = _rand(6, 6, seed=5), _rand(6, 6, seed=6)
        A, B = SparseCSC.from_scipy(S1), SparseCSC.from_scipy(S2)
        assert np.allclose(add(A, B, 2.0, -1.0).to_scipy().toarray(),
                           (2 * S1 - S2).toarray())
        assert np.allclose(horzcat(A, B).to_scipy().toarray(),
                           sp.hstack([S1, S2]).toarray())
        assert np.allclose(vertcat(A, B).to_scipy().toarray(),
                           sp.vstack([S1, S2]).toarray())

    def test_submatrix(self):
        S = _rand(10, 10, seed=7)
        A = SparseCSC.from_scipy(S)
        r = np.array([2, 5, 7])
        c = np.array([1, 3, 9, 0])
        assert np.allclose(submatrix(A, r, c).to_scipy().toarray(),
                           S.toarray()[np.ix_(r, c)])

    def test_norms(self):
        S = _rand(9, 9, seed=8)
        A = SparseCSC.from_scipy(S)
        assert A.norm(1) == pytest.approx(np.abs(S.toarray()).sum(0).max())
        assert A.norm(np.inf) == pytest.approx(np.abs(S.toarray()).sum(1).max())

    def test_eye_spzeros_aat(self):
        assert np.allclose(eye(4).to_scipy().toarray(), np.eye(4))
        assert spzeros(3, 5).nnz == 0
        S = _rand(6, 4, seed=9)
        A = SparseCSC.from_scipy(S)
        C = aat(A, mode="numeric")
        assert np.allclose(C.to_scipy().toarray(), (S @ S.T).toarray())

    def test_symmetry(self):
        S = _rand(8, 8, seed=10)
        sym, _ = symmetry(SparseCSC.from_scipy(S))
        assert sym < 0.5
        T = S + S.T + sp.identity(8)
        sym2, nzd = symmetry(SparseCSC.from_scipy(T.tocsc()))
        assert sym2 == 1.0 and nzd == 8

    def test_invert_permutation(self, rng):
        p = rng.permutation(20)
        pinv = invert_permutation(p)
        assert np.array_equal(pinv[p], np.arange(20))

    def test_matmul(self):
        S1, S2 = _rand(5, 6, seed=11), _rand(6, 3, seed=12)
        A, B = SparseCSC.from_scipy(S1), SparseCSC.from_scipy(S2)
        assert np.allclose((A @ B).to_scipy().toarray(), (S1 @ S2).toarray())
        X = np.random.default_rng(0).standard_normal((6, 2))
        assert np.allclose(A @ X, S1 @ X)


class TestIO:
    def test_mm_roundtrip_general(self, tmp_path):
        S = _rand(7, 5, seed=13)
        A = SparseCSC.from_scipy(S)
        p = tmp_path / "a.mtx"
        mmwrite(p, A)
        B = mmread(p)
        assert np.allclose(B.to_scipy().toarray(), S.toarray())

    def test_mm_roundtrip_symmetric(self, tmp_path):
        S = _rand(6, 6, seed=14)
        S = S + S.T + 6 * sp.identity(6)
        U = sp.triu(S).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        p = tmp_path / "s.mtx"
        mmwrite(p, A)
        B = mmread(p)
        assert B.stype != 0
        assert np.allclose(B.to_scipy().toarray(), S.toarray())

    def test_mm_pattern(self, tmp_path):
        A = SparseCSC.from_scipy(_rand(5, 5, seed=15))
        A.data = None
        p = tmp_path / "p.mtx"
        mmwrite(p, A)
        B = mmread(p)
        assert B.data is None and B.nnz == A.nnz

    def test_mm_array_and_dense(self, tmp_path):
        M = np.random.default_rng(1).standard_normal((4, 3))
        p = tmp_path / "d.mtx"
        mmwrite(p, M)
        from suitesparse_tpu.io import mmread_dense
        assert np.allclose(mmread_dense(p), M)

    def test_mm_parser_inline(self):
        text = """%%MatrixMarket matrix coordinate real general
% comment
3 3 4
1 1 2.5
2 2 -1
3 1 4
3 3 1e-3
"""
        A = mmread(io.StringIO(text))
        D = A.to_scipy().toarray()
        assert D[0, 0] == 2.5 and D[1, 1] == -1 and D[2, 0] == 4 and D[2, 2] == 1e-3

    def test_rb_roundtrip(self, tmp_path):
        S = _rand(8, 6, seed=16)
        A = SparseCSC.from_scipy(S)
        p = tmp_path / "a.rb"
        rbwrite(p, A)
        B = rbread(p)
        assert np.allclose(B.to_scipy().toarray(), S.toarray())

    def test_rb_symmetric(self, tmp_path):
        S = _rand(6, 6, seed=17)
        S = S + S.T + 6 * sp.identity(6)
        U = sp.triu(S).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        p = tmp_path / "s.rb"
        rbwrite(p, A)
        from suitesparse_tpu.io import rbkind
        assert rbkind(p)[1] == "s"
        B = rbread(p)
        assert np.allclose(B.to_scipy().toarray(), S.toarray())


class TestGenerators:
    def test_laplacians_spd(self):
        for A in (generators.laplacian_2d(6), generators.laplacian_3d(4)):
            D = A.to_scipy().toarray()
            assert np.allclose(D, D.T)
            assert np.linalg.eigvalsh(D).min() > 0

    def test_collection_genuine_fixture(self):
        """Real names resolve to the genuine reference fixtures (n=48 for
        the real HB/bcsstk01), never a synthetic stand-in."""
        from suitesparse_tpu.io import collection
        A = collection.get("HB/bcsstk01")
        assert A.nrow == 48

    def test_collection_honest_synthetic_names(self):
        from suitesparse_tpu.io import collection
        A = collection.get("lap3d_6")
        assert A.nrow == 216
        with pytest.raises(FileNotFoundError):
            collection.get("nd6k")   # real name, no file: must NOT serve a standin


class TestTortureInputs:
    """Deliberately-corrupted inputs must fail cleanly, never hang
    (the reference's Tcov mangle*.mtx pattern, CHOLMOD/Tcov)."""

    def test_mangled_header_fields(self, tmp_path):
        import pytest as _pytest
        from suitesparse_tpu import SparseError
        cases = [
            "%%MatrixMarket junk coordinate real general\n",
            "%%MatrixMarket matrix junk real general\n",
            "%%MatrixMarket matrix coordinate junk general\n",
            "%%MatrixMarket matrix coordinate real junk\n",
            "%%MatrixMarket matrix coordinate real general\n%only comments\n",
            "hello world\n",
        ]
        for k, text in enumerate(cases):
            p = tmp_path / f"m{k}.mtx"
            p.write_text(text)
            with _pytest.raises(SparseError):
                mmread(p)

    def test_reference_demo_matrices_read(self):
        import os
        d = "/root/reference/CHOLMOD/Demo/Matrix"
        if not os.path.isdir(d):
            import pytest as _pytest
            _pytest.skip("reference not mounted")
        A = mmread(f"{d}/can___24.mtx")      # pattern symmetric
        assert A.data is None and A.stype != 0 and A.shape == (24, 24)
        C = mmread(f"{d}/c.mtx")             # complex hermitian
        assert np.iscomplexobj(C.data) and C.stype != 0


class TestCollectionStats:
    def test_stats_and_index(self):
        from suitesparse_tpu.io import collection
        rec = collection.stats("HB/bcsstk01")
        assert rec["nrows"] == 48 and rec["nnz"] > 0
        idx = collection.index(["bcsstk01", "west0067"])
        assert len(idx) == 2 and idx[0]["nnz"] > 0

    def test_ssstats_index(self):
        """ssstats.csv parse (ssgui.java:1055-1105 column layout)."""
        from suitesparse_tpu.io import collection
        idx = collection.stats_index()
        if not idx:
            pytest.skip("no ssstats.csv available")
        assert len(idx) > 2000
        rec = collection.lookup("HB/bcsstk16")
        assert rec is not None and rec["nrows"] == 4884 and rec["posdef"]
        # property-driven selection: big SPD matrices
        picks = collection.search(min_n=4000, max_n=20000, posdef=True)
        assert any(r["name"] == "bcsstk16" for r in picks)

    def test_genuine_fixture_loaders(self):
        from suitesparse_tpu.io import fixtures
        if fixtures.reference_root() is None:
            pytest.skip("reference not mounted")
        A = fixtures.load("bcsstk16")      # CSparse triplet format
        assert A.shape == (4884, 4884)
        W = fixtures.load("west0479")      # Rutherford-Boeing
        assert W.shape == (479, 479)
        K = fixtures.load("impcol_a")      # MatrixMarket
        assert K.shape == (207, 207)
