"""GraphBLAS-lite tests — oracle = dense numpy (the reference's
MATLAB-oracle pattern, GraphBLAS/Test, SURVEY.md §4.3)."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from suitesparse_tpu.core.sparse import SparseCSC
from suitesparse_tpu.graphblas import (apply, bfs_levels, ewise_add,
                                       ewise_mult, kron, mxm, mxv, pagerank,
                                       reduce_rows, reduce_scalar, select,
                                       semiring, triangle_count, vxm)


def _rand(m, n, d=0.15, seed=0):
    return sp.random(m, n, density=d,
                     random_state=np.random.default_rng(seed), format="csc")


class TestSemiringOps:
    def test_mxv_plus_times(self):
        S = _rand(25, 25)
        A = SparseCSC.from_scipy(S)
        x = np.random.default_rng(1).standard_normal(25)
        assert np.allclose(np.asarray(mxv(A, x)), S.toarray() @ x)

    def test_mxv_min_plus(self):
        S = _rand(20, 20, seed=2)
        A = SparseCSC.from_scipy(S)
        x = np.random.default_rng(2).standard_normal(20)
        D = S.toarray()
        got = np.asarray(mxv(A, x, "min_plus"))
        for i in range(20):
            nz = D[i] != 0
            if nz.any():
                assert got[i] == pytest.approx((D[i, nz] + x[nz]).min())

    def test_mxv_max_times_and_lor_land(self):
        S = _rand(15, 15, seed=3)
        A = SparseCSC.from_scipy(S)
        x = np.abs(np.random.default_rng(3).standard_normal(15)) + 0.1
        D = S.toarray()
        got = np.asarray(mxv(A, x, "max_times"))
        for i in range(15):
            nz = D[i] != 0
            if nz.any():
                assert got[i] == pytest.approx((D[i, nz] * x[nz]).max())
        gb = np.asarray(mxv(A, (x > 0).astype(np.float32), "lor_land"))
        for i in range(15):
            assert bool(gb[i]) == bool((D[i] != 0).any())

    def test_mxm_plus_times_vs_scipy(self):
        SA, SB = _rand(20, 15, seed=4), _rand(15, 10, seed=5)
        C = mxm(SparseCSC.from_scipy(SA), SparseCSC.from_scipy(SB))
        assert np.allclose(C.to_scipy().toarray(), (SA @ SB).toarray())

    def test_mxm_min_plus(self):
        SA, SB = _rand(12, 12, seed=6), _rand(12, 12, seed=7)
        C = mxm(SparseCSC.from_scipy(SA), SparseCSC.from_scipy(SB), "min_plus")
        DA, DB = SA.toarray(), SB.toarray()
        D = C.to_scipy().toarray()
        for i in range(12):
            for j in range(12):
                ks = (DA[i] != 0) & (DB[:, j] != 0)
                if ks.any():
                    assert D[i, j] == pytest.approx((DA[i, ks] + DB[ks, j]).min())

    def test_ewise_and_apply_and_select(self):
        SA, SB = _rand(18, 18, seed=8), _rand(18, 18, seed=9)
        A, B = SparseCSC.from_scipy(SA), SparseCSC.from_scipy(SB)
        assert np.allclose(ewise_add(A, B).to_scipy().toarray(),
                           (SA + SB).toarray())
        assert np.allclose(ewise_mult(A, B).to_scipy().toarray(),
                           SA.toarray() * SB.toarray())
        assert np.allclose(apply(A, "abs").to_scipy().toarray(),
                           np.abs(SA.toarray()))
        assert np.allclose(select(A, "tril").to_scipy().toarray(),
                           np.tril(SA.toarray()))

    def test_reduce(self):
        S = _rand(14, 14, seed=10)
        A = SparseCSC.from_scipy(S)
        assert np.allclose(np.asarray(reduce_rows(A)), S.toarray().sum(1))
        assert float(reduce_scalar(A)) == pytest.approx(S.toarray().sum())

    def test_kron(self):
        SA, SB = _rand(4, 3, 0.5, 11), _rand(3, 2, 0.6, 12)
        C = kron(SparseCSC.from_scipy(SA), SparseCSC.from_scipy(SB))
        assert np.allclose(C.to_scipy().toarray(),
                           np.kron(SA.toarray(), SB.toarray()))


class TestAlgorithms:
    def test_pagerank_power_iteration_oracle(self):
        G = _rand(40, 40, 0.08, 13)
        G.data[:] = 1.0
        pr = pagerank(SparseCSC.from_scipy(G))
        D = G.toarray()
        outdeg = np.maximum(D.sum(1), 1)
        W = D / outdeg[:, None]
        r = np.full(40, 1 / 40)
        for _ in range(300):
            rn = 0.85 * W.T @ r + 0.15 / 40
            rn += (1 - rn.sum()) / 40
            r = rn
        assert np.abs(pr - r).max() < 1e-8
        assert pr.sum() == pytest.approx(1.0)

    def test_bfs(self):
        P = sp.diags([np.ones(9)], [1], shape=(10, 10)).tocsc()
        lv = bfs_levels(SparseCSC.from_scipy(P), 0)
        assert lv.tolist() == list(range(10))
        # unreachable component
        B = sp.block_diag([P[:5, :5], P[:5, :5]]).tocsc()
        lv2 = bfs_levels(SparseCSC.from_scipy(sp.csc_matrix(B)), 0)
        assert (lv2[5:] == -1).all()

    def test_triangles(self):
        K4 = sp.csc_matrix(np.ones((4, 4)) - np.eye(4))
        assert triangle_count(SparseCSC.from_scipy(K4)) == 4
        P = sp.diags([np.ones(5)], [1], shape=(6, 6)).tocsc()
        Psym = sp.csc_matrix(P + P.T)
        assert triangle_count(SparseCSC.from_scipy(Psym)) == 0


class TestModels:
    def test_backslash_auto_selection(self):
        from suitesparse_tpu.models import Factorize, backslash
        from suitesparse_tpu.io import generators
        # SPD -> cholesky
        A = generators.random_spd(40, 0.1, seed=1)
        F = Factorize(A)
        assert F.kind == "cholesky"
        b = np.ones(40)
        assert np.abs(A.to_scipy() @ F.solve(b) - b).max() < 1e-8
        # unsymmetric -> lu
        B = generators.random_unsym(40, 0.1, seed=2)
        F2 = Factorize(B)
        assert F2.kind == "lu"
        assert np.abs(B.to_scipy() @ F2.solve(b) - b).max() < 1e-8
        # rectangular -> qr
        S = _rand(30, 20, 0.3, 3)
        S = S + sp.csc_matrix((np.ones(20), (range(20), range(20))), shape=(30, 20))
        C = SparseCSC.from_scipy(S.tocsc())
        F3 = Factorize(C)
        assert F3.kind == "qr"
        x = backslash(C, np.ones(30))
        assert len(x) == 20

    def test_csparse_layer(self):
        from suitesparse_tpu.models import csparse as cs
        from suitesparse_tpu.io import generators
        A = generators.random_unsym(30, 0.1, seed=4)
        b = np.ones(30)
        x = cs.cs_lusol(A, b)
        assert np.abs(A.to_scipy() @ x - b).max() < 1e-10
        Aspd = generators.random_spd(30, 0.1, seed=5)
        x2 = cs.cs_cholsol(Aspd, b)
        assert np.abs(Aspd.to_scipy() @ x2 - b).max() < 1e-8
        # triangular solves vs scipy
        L = sp.tril(_rand(12, 12, 0.4, 6) + 2 * sp.identity(12)).tocsc()
        Ls = SparseCSC.from_scipy(L)
        y = cs.cs_lsolve(Ls, b[:12])
        import scipy.linalg as sla
        assert np.allclose(y, sla.solve_triangular(L.toarray(), b[:12], lower=True))
        yt = cs.cs_ltsolve(Ls, b[:12])
        assert np.allclose(yt, sla.solve_triangular(L.toarray().T, b[:12]))

    def test_ldl_layer(self):
        from suitesparse_tpu.models import ldl
        from suitesparse_tpu.io import generators
        A = generators.random_spd(25, 0.15, seed=7)
        sym = ldl.ldl_symbolic(A)
        f = ldl.ldl_numeric(A, sym)
        b = np.arange(25.0)
        pb = ldl.ldl_perm(f.perm, b)
        x = ldl.ldl_ltsolve(f, ldl.ldl_dsolve(f, ldl.ldl_lsolve(f, pb)))
        xout = ldl.ldl_permt(f.perm, x)
        assert np.abs(A.to_scipy() @ xout - b).max() < 1e-10
        assert ldl.ldl_valid_perm(25, f.perm)
        assert ldl.ldl_valid_matrix(A)


class TestStorageFormats:
    """The 8 storage variants + iso (GB_matrix.h:10-50) and conversions."""

    def _mat(self, m=30, n=25, d=0.15, seed=40):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        S = sp.random(m, n, density=d, random_state=rng, format="csc")
        return SparseCSC.from_scipy(S)

    def test_roundtrip_all_formats(self):
        from suitesparse_tpu.graphblas import realize, to_csc, BY_ROW, BY_COL
        from suitesparse_tpu.graphblas.objects import FORMATS
        A = self._mat()
        ref = A.to_scipy().toarray()
        for fmt in FORMATS:
            for orient in (BY_ROW, BY_COL):
                st = realize(A, fmt, orient)
                back = to_csc(st).to_scipy().toarray()
                assert np.allclose(back, ref), (fmt, orient)
                assert st.nnz == A.nnz or fmt == "full"

    def test_auto_format_heuristic(self):
        from suitesparse_tpu.graphblas import auto_format
        import scipy.sparse as sp
        dense = SparseCSC.from_scipy(sp.csc_matrix(np.ones((10, 10))))
        assert auto_format(dense) == "full"
        half = SparseCSC.from_scipy(sp.random(20, 20, density=0.5,
                                              format="csc", random_state=1))
        assert auto_format(half) == "bitmap"
        hyper = SparseCSC.from_scipy(sp.csc_matrix(
            (np.ones(3), ([0, 1, 2], [0, 0, 0])), shape=(100, 100)))
        assert auto_format(hyper) == "hypersparse"
        assert auto_format(self._mat(100, 100, 0.01, 2)) in ("sparse",
                                                             "hypersparse")

    def test_iso_detection(self):
        from suitesparse_tpu.graphblas import realize
        import scipy.sparse as sp
        S = sp.random(15, 15, density=0.2, random_state=3, format="csc")
        S.data[:] = 7.0
        st = realize(SparseCSC.from_scipy(S), "sparse")
        assert st.iso and st.iso_value == 7.0
        st2 = realize(self._mat(seed=4), "sparse")
        assert not st2.iso

    def test_mxv_dense_path_matches_sparse(self):
        from suitesparse_tpu.graphblas import realize, mxv
        A = self._mat(20, 20, 0.4, 5)
        x = np.random.default_rng(5).standard_normal(20)
        y_sparse = np.asarray(mxv(A, x))
        for fmt in ("bitmap", "full"):
            y_dense = np.asarray(mxv(realize(A, fmt), x))
            assert np.allclose(y_dense, y_sparse), fmt
        # non-plus_times semiring on the bitmap path
        ymin = np.asarray(mxv(realize(A, "bitmap"), x, ring="min_plus"))
        ymin_ref = np.asarray(mxv(A, x, ring="min_plus"))
        assert np.allclose(ymin, ymin_ref)

    def test_hypersparse_nonempty_list(self):
        from suitesparse_tpu.graphblas import realize
        import scipy.sparse as sp
        S = sp.csc_matrix((np.ones(2), ([1, 5], [3, 9])), shape=(20, 50))
        st = realize(SparseCSC.from_scipy(S), "hypersparse")
        assert st.nonempty.tolist() == [3, 9]


class TestDescriptorsVectorsIterators:
    def _mat(self, seed=50):
        import scipy.sparse as sp
        S = sp.random(12, 12, density=0.3, random_state=seed, format="csc")
        return SparseCSC.from_scipy(S), S

    def test_descriptor_transpose_and_mask(self):
        from suitesparse_tpu.graphblas import mxv, DESC_T0, Descriptor
        A, S = self._mat()
        x = np.arange(1.0, 13.0)
        yt = np.asarray(mxv(A, x, desc=DESC_T0))
        assert np.allclose(yt, S.T @ x)
        mask = np.zeros(12, dtype=bool); mask[:6] = True
        y = np.asarray(mxv(A, x, mask=mask))
        assert np.allclose(y[:6], (S @ x)[:6]) and np.allclose(y[6:], 0.0)
        yc = np.asarray(mxv(A, x, mask=mask,
                            desc=Descriptor(mask_complement=True)))
        assert np.allclose(yc[6:], (S @ x)[6:]) and np.allclose(yc[:6], 0.0)

    def test_mxm_descriptor_and_accum(self):
        from suitesparse_tpu.graphblas import mxm, Descriptor
        A, S = self._mat(51)
        B, T = self._mat(52)
        C = mxm(A, B, desc=Descriptor(transpose0=True))
        assert np.allclose(C.to_scipy().toarray(), (S.T @ T).toarray(),
                           atol=1e-12)
        C2 = mxm(A, B, accum="plus", C0=A)
        assert np.allclose(C2.to_scipy().toarray(),
                           (S + S @ T).toarray(), atol=1e-12)

    def test_grb_vector(self):
        from suitesparse_tpu.graphblas import GrBVector
        v = GrBVector.build(10, [3, 1, 3], [1.0, 2.0, 5.0], dup="plus")
        assert v.nnz == 2
        d = v.to_dense()
        assert d[3] == 6.0 and d[1] == 2.0 and d.sum() == 8.0
        idx, vals = v.extract_tuples()
        assert idx.tolist() == [1, 3]
        v2 = GrBVector.build(5, [0, 0, 2], [4.0, 9.0, 1.0], dup="max")
        assert v2.to_dense()[0] == 9.0
        from suitesparse_tpu.graphblas import mxv
        A, S = self._mat(53)
        v3 = GrBVector.from_dense(np.ones(12))
        assert np.allclose(np.asarray(mxv(A, v3)), S @ np.ones(12))

    def test_iterators(self):
        from suitesparse_tpu.graphblas import MatrixIterator, iterate_entries
        A, S = self._mat(54)
        ref = {(int(i), int(j)): S[i, j] for i, j in zip(*S.nonzero())}
        seen = {(i, j): x for i, j, x in iterate_entries(A)}
        assert seen.keys() == ref.keys()
        assert all(abs(seen[k] - ref[k]) < 1e-15 for k in ref)
        # row iteration covers every nonempty row once
        it = MatrixIterator(A, "row")
        rows = [r for r, idx, vals in it]
        assert rows == sorted(set(S.tocsr().nonzero()[0].tolist()))
        # stateful protocol
        it2 = MatrixIterator(A, "entry")
        it2.seek(0)
        first = it2.next()
        assert first is not None and len(first) == 3

    def test_build_dup_ops(self):
        from suitesparse_tpu.graphblas import build
        C = build([0, 0, 1], [0, 0, 1], [3.0, 4.0, 5.0], (2, 2), dup="max")
        D = C.to_scipy().toarray()
        assert D[0, 0] == 4.0 and D[1, 1] == 5.0
        C2 = build([0, 0], [0, 0], [3.0, 4.0], (2, 2), dup="first")
        assert C2.to_scipy()[0, 0] == 3.0

    def test_ewise_masks(self):
        from suitesparse_tpu.graphblas import ewise_add, ewise_mult, Descriptor
        import scipy.sparse as sp
        A, S = self._mat(55)
        B, T = self._mat(56)
        mask = SparseCSC.from_scipy(sp.triu(sp.csc_matrix(np.ones((12, 12)))).tocsc())
        C = ewise_add(A, B, mask=mask)
        ref = np.triu((S + T).toarray())
        assert np.allclose(C.to_scipy().toarray(), ref, atol=1e-12)
        Cc = ewise_mult(A, B, mask=mask, desc=Descriptor(mask_complement=True))
        ref2 = np.tril(np.asarray((S.multiply(T)).toarray()), -1)
        assert np.allclose(Cc.to_scipy().toarray(), ref2, atol=1e-12)


class TestUnionConcatSplitReshapeSort:
    """GxB_eWiseUnion / concat / split / reshape / Matrix_sort analogs."""

    def _rand(self, m, n, seed, d=0.2):
        rng = np.random.default_rng(seed)
        S = sp.random(m, n, density=d, random_state=rng, format="csc")
        return SparseCSC.from_scipy(S)

    def test_ewise_union_fill_scalars(self):
        from suitesparse_tpu.graphblas import ewise_union
        A = self._rand(10, 10, 0)
        B = self._rand(10, 10, 1)
        C = ewise_union(A, B, "minus", alpha=5.0, beta=3.0)
        SA, SB = A.to_scipy(), B.to_scipy()
        D = C.to_scipy().toarray()
        for i in range(10):
            for j in range(10):
                a, b = SA[i, j], SB[i, j]
                ina, inb = a != 0, b != 0
                if not ina and not inb:
                    assert D[i, j] == 0
                else:
                    ref = (a if ina else 5.0) - (b if inb else 3.0)
                    assert np.isclose(D[i, j], ref)

    def test_concat_split_roundtrip(self):
        from suitesparse_tpu.graphblas import concat, split
        A = self._rand(9, 7, 2)
        tiles = split(A, [4, 5], [3, 4])
        B = concat(tiles)
        assert (A.to_scipy() != B.to_scipy()).nnz == 0

    def test_reshape_column_major(self):
        from suitesparse_tpu.graphblas import reshape
        A = self._rand(6, 4, 3)
        C = reshape(A, 8, 3)
        a = A.to_scipy().toarray().reshape(-1, order="F")
        c = C.to_scipy().toarray().reshape(-1, order="F")
        assert np.allclose(a, c)

    def test_sort_columns(self):
        from suitesparse_tpu.graphblas import sort
        A = self._rand(12, 5, 4, d=0.5)
        C, P = sort(A, "lt")
        S = A.to_scipy().tocsc()
        Cd = C.to_scipy().toarray()
        for j in range(5):
            col = S.data[S.indptr[j]:S.indptr[j + 1]]
            got = Cd[:len(col), j]
            assert np.allclose(np.sort(col), got)


class TestSerialize:
    """GxB_Matrix_serialize/deserialize analog (zstd block compression)."""

    @pytest.mark.parametrize("method", ["zstd", "zlib", "none"])
    def test_roundtrip(self, method):
        from suitesparse_tpu.graphblas import (matrix_deserialize,
                                               matrix_serialize)
        rng = np.random.default_rng(0)
        S = sp.random(60, 45, density=0.1, random_state=rng, format="csc")
        A = SparseCSC.from_scipy(S)
        blob = matrix_serialize(A, method)
        B = matrix_deserialize(blob)
        assert B.shape == A.shape
        assert (A.to_scipy() != B.to_scipy()).nnz == 0

    def test_pattern_and_sym(self):
        from suitesparse_tpu.graphblas import (matrix_deserialize,
                                               matrix_serialize)
        from suitesparse_tpu.core.sparse import SYM_UPPER
        A = SparseCSC(np.array([0, 1, 2]), np.array([0, 1]), None, (2, 2),
                      stype=SYM_UPPER)
        B = matrix_deserialize(matrix_serialize(A))
        assert B.data is None and B.stype == SYM_UPPER

    def test_bad_blob_raises(self):
        from suitesparse_tpu.graphblas import matrix_deserialize
        from suitesparse_tpu.core.status import SparseError
        with pytest.raises((SparseError, Exception)):
            matrix_deserialize(b"\x10\x00\x00\x00\x00\x00\x00\x00garbage!!!")


class TestTypedOps:
    """Round-3: dtype-true semiring semantics (no float casts), user-defined
    op registration, and sparse-mask complement without dense detours."""

    def _graph(self, n=40, seed=3):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        S = sp.random(n, n, 0.12, random_state=rng, format="csc",
                      data_rvs=lambda k: rng.integers(1, 9, k).astype(float))
        return SparseCSC.from_scipy(S.tocsc())

    def test_integer_semiring_stays_integer(self):
        from suitesparse_tpu.graphblas import core as g
        A = self._graph()
        Ai = SparseCSC(A.indptr, A.indices, A.data.astype(np.int32), A.shape)
        C = g.mxm(Ai, Ai, "plus_times")
        assert np.issubdtype(C.data.dtype, np.integer)
        ref = (A.to_scipy().astype(np.int64) @ A.to_scipy().astype(np.int64))
        Cs = C.to_scipy().astype(np.int64)
        assert (abs(Cs - ref) > 0).nnz == 0

    def test_lor_land_true_semantics_on_negatives(self):
        from suitesparse_tpu.graphblas import core as g
        # -1 must count as TRUE (the float-cast bug was a > 0)
        a = jnp.asarray(np.array([-1.0, 0.0, 2.0]))
        b = jnp.asarray(np.array([0.0, 0.0, -3.0]))
        assert list(np.asarray(g.BINOPS["lor"](a, b))) == [1.0, 0.0, 1.0]
        assert list(np.asarray(g.BINOPS["land"](a, b))) == [0.0, 0.0, 1.0]

    def test_typed_identities(self):
        from suitesparse_tpu.graphblas.core import MONOIDS
        assert MONOIDS["min"].identity_for(np.int32) == np.iinfo(np.int32).max
        assert MONOIDS["max"].identity_for(np.int8) == np.iinfo(np.int8).min
        assert MONOIDS["lor"].identity_for(np.bool_) is False
        assert MONOIDS["land"].identity_for(np.bool_) is True
        assert MONOIDS["plus"].identity_for(np.float32) == np.float32(0)

    def test_user_registered_semiring(self):
        from suitesparse_tpu.graphblas import core as g
        g.register_binop("absdiff", lambda a, b: jnp.abs(a - b))
        g.register_semiring("max_absdiff", "max", "absdiff")
        A = self._graph(20, seed=5)
        C = g.mxm(A, A, "max_absdiff")
        # oracle: dense max-plus style computation
        Ad = A.to_scipy().toarray()
        n = Ad.shape[0]
        ref = np.zeros((n, n))
        pat = (Ad != 0)
        for i in range(n):
            for j in range(n):
                ks = np.nonzero(pat[i] & pat[:, j])[0]
                if len(ks):
                    ref[i, j] = np.abs(Ad[i, ks] - Ad[ks, j]).max()
        got = C.to_scipy().toarray()
        assert np.allclose(got, ref)

    def test_bitwise_semiring(self):
        from suitesparse_tpu.graphblas import core as g
        A = self._graph(16, seed=7)
        Ai = SparseCSC(A.indptr, A.indices, A.data.astype(np.int32), A.shape)
        C = g.mxm(Ai, Ai, "bor_band")
        Ad = Ai.to_scipy().toarray().astype(np.int32)
        n = Ad.shape[0]
        pat = Ad != 0
        ref = np.zeros((n, n), np.int32)
        for i in range(n):
            for j in range(n):
                ks = np.nonzero(pat[i] & pat[:, j])[0]
                acc = 0
                for k in ks:
                    acc |= int(Ad[i, k]) & int(Ad[k, j])
                ref[i, j] = acc
        assert np.array_equal(C.to_scipy().toarray().astype(np.int32), ref)

    def test_complement_mask_no_dense(self):
        from suitesparse_tpu.graphblas import core as g
        from suitesparse_tpu.graphblas.objects import Descriptor
        A = self._graph(50, seed=9)
        mask = self._graph(50, seed=11)
        desc = Descriptor(mask_complement=True)
        C = g.ewise_mult(A, A, "times", mask=mask, desc=desc)
        ref = A.to_scipy().multiply(A.to_scipy()).tocsc()
        mk = (mask.to_scipy() != 0).toarray()
        ref = ref.multiply(~mk).tocsc()
        assert abs(C.to_scipy() - ref).nnz == 0

    def test_bfs_levels_int32(self):
        from suitesparse_tpu.graphblas.algorithms import bfs_levels
        A = self._graph(60, seed=13)
        S = A.to_scipy()
        Ssym = ((S + S.T) != 0).astype(float).tocsc()
        lev = bfs_levels(SparseCSC.from_scipy(Ssym), 0, method="device")
        assert lev.dtype == np.int32
        import scipy.sparse.csgraph as cg
        d = cg.shortest_path(Ssym, unweighted=True, indices=0)
        ref = np.where(np.isinf(d), -1, d).astype(np.int32)
        assert np.array_equal(lev, ref)


class TestPositionalOps:
    """GxB positional binary ops (FIRSTI..SECONDJ1) via index-valued
    operand substitution (graphblas/extra.py)."""

    def _grid(self):
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        rng = np.random.default_rng(0)
        S = sp.random(6, 6, density=0.4, random_state=rng, format="csc")
        S.data[:] = rng.uniform(1, 2, len(S.data))
        return SparseCSC.from_scipy(S), S

    def test_min_firsti_value_is_row_index(self):
        from suitesparse_tpu.graphblas import positional_mxm
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        A, S = self._grid()
        B = SparseCSC.from_scipy(sp.csc_matrix(np.ones((6, 1))))
        # firsti yields the A-entry's row index i, so C[i,0] = i wherever
        # row i of A is nonempty
        C = positional_mxm(A, B, "min_firsti").to_scipy().toarray()
        rowhas = (S.toarray() != 0).any(axis=1)
        for i in range(6):
            if rowhas[i]:
                assert C[i, 0] == i

    def test_min_firstj_and_i1_offset(self):
        from suitesparse_tpu.graphblas import positional_mxm
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        A, S = self._grid()
        B = SparseCSC.from_scipy(sp.csc_matrix(np.ones((6, 1))))
        # firstj = the contraction index k: min over row i's nonzero
        # columns = the smallest column index of row i
        C = positional_mxm(A, B, "min_firstj").to_scipy().toarray()
        D = S.toarray()
        for i in range(6):
            cols = np.nonzero(D[i])[0]
            if len(cols):
                assert C[i, 0] == cols.min()
        # the I1 variants add one
        C1 = positional_mxm(A, B, "min_firstj1").to_scipy().toarray()
        for i in range(6):
            cols = np.nonzero(D[i])[0]
            if len(cols):
                assert C1[i, 0] == cols.min() + 1

    def test_positional_mxv_bfs_parent(self):
        """min_firsti mxv = the BFS 'parent' pattern: for each frontier
        column, the smallest source row index."""
        from suitesparse_tpu.graphblas import positional_mxv
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        # path graph 0-1-2-3
        S = sp.csc_matrix(np.array([
            [0, 1, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0]],
            dtype=float))
        A = SparseCSC.from_scipy(S)
        x = np.array([0.0, 1.0, 0.0, 0.0])   # frontier at node 1
        y = np.asarray(positional_mxv(A, x, "min_firsti"))
        # neighbors of node 1 are 0 and 2; each reached entry carries the
        # reaching row index i
        assert y[0] == 0 and y[2] == 2


class TestIndexUnaryOps:
    def test_apply_rowindex_colindex(self):
        from suitesparse_tpu.graphblas import apply_indexop
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        S = sp.random(5, 7, density=0.5, random_state=np.random.default_rng(1),
                      format="csc")
        A = SparseCSC.from_scipy(S)
        R = apply_indexop(A, "rowindex", 1).to_triplet()
        assert np.all(R.data == R.row + 1)
        Cc = apply_indexop(A, "colindex").to_triplet()
        assert np.all(Cc.data == Cc.col)
        Dg = apply_indexop(A, "diagindex").to_triplet()
        assert np.all(Dg.data == Dg.col - Dg.row)

    def test_select_structural_and_value(self):
        from suitesparse_tpu.graphblas import select_indexop
        import scipy.sparse as sp
        from suitesparse_tpu.core.sparse import SparseCSC
        rng = np.random.default_rng(2)
        S = sp.random(8, 8, density=0.6, random_state=rng, format="csc")
        A = SparseCSC.from_scipy(S)
        T = select_indexop(A, "tril", -1).to_scipy().toarray()
        assert np.all(np.triu(T) == 0)
        U = select_indexop(A, "rowle", 2).to_triplet()
        assert np.all(U.row <= 2)
        med = np.median(S.data)
        V = select_indexop(A, "valuegt", med).to_triplet()
        assert np.all(V.data > med)
        W = select_indexop(A, "colgt", 5).to_triplet()
        assert np.all(W.col > 5)


class TestPackUnpack:
    def test_csc_roundtrip_and_jumbled(self):
        from suitesparse_tpu.graphblas import pack_csc, unpack_csc
        import scipy.sparse as sp
        S = sp.random(6, 5, density=0.5,
                      random_state=np.random.default_rng(3), format="csc")
        A = pack_csc(6, 5, S.indptr, S.indices, S.data)
        p, i, x = unpack_csc(A)
        S2 = sp.csc_matrix((x, i, p), shape=(6, 5))
        assert (abs(S - S2)).nnz == 0
        # jumbled rows get sorted
        idx = S.indices.copy()
        dat = S.data.copy()
        for j in range(5):
            lo, hi = S.indptr[j], S.indptr[j + 1]
            idx[lo:hi] = idx[lo:hi][::-1]
            dat[lo:hi] = dat[lo:hi][::-1]
        B = pack_csc(6, 5, S.indptr, idx, dat, jumbled=True)
        assert (abs(B.to_scipy() - S)).nnz == 0

    def test_csr_coo_full_bitmap(self):
        from suitesparse_tpu.graphblas import (pack_csr, unpack_csr,
                                               pack_coo, unpack_coo,
                                               pack_full, unpack_full,
                                               pack_bitmap, unpack_bitmap)
        import scipy.sparse as sp
        S = sp.random(4, 6, density=0.5,
                      random_state=np.random.default_rng(4), format="csr")
        A = pack_csr(4, 6, S.indptr, S.indices, S.data)
        assert (abs(A.to_scipy() - S.tocsc())).nnz == 0
        p, i, x = unpack_csr(A)
        S2 = sp.csr_matrix((x, i, p), shape=(4, 6))
        assert (abs(S2 - S)).nnz == 0
        coo = S.tocoo()
        B = pack_coo(4, 6, coo.row, coo.col, coo.data)
        assert (abs(B.to_scipy() - S.tocsc())).nnz == 0
        r, c, v = unpack_coo(B)
        assert len(r) == S.nnz
        D = np.arange(12, dtype=float).reshape(3, 4) + 1
        F = pack_full(D)
        assert np.array_equal(unpack_full(F), D)
        bm = D > 6
        Bm = pack_bitmap(bm, D)
        bm2, v2 = unpack_bitmap(Bm)
        assert np.array_equal(bm2, bm)
        assert np.array_equal(v2[bm2], D[bm])
