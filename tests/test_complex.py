"""Complex dtype support: hermitian Cholesky, complex KLU (the reference's
z* type variants collapsed into dtype polymorphism)."""
import numpy as np
import pytest
import scipy.sparse as sp

from suitesparse_tpu.cholesky import factorize_simplicial, solve
from suitesparse_tpu.core.sparse import SYM_UPPER, SparseCSC
from suitesparse_tpu.lu import klu_analyze, klu_factor, klu_refactor, klu_solve


def _hermitian_pd(n, seed):
    rng = np.random.default_rng(seed)
    B = sp.random(n, n, density=0.1, random_state=rng, format="csc")
    B = B + 1j * sp.random(n, n, density=0.1, random_state=rng, format="csc")
    return (B @ B.conj().T + n * sp.identity(n)).tocsc()


class TestHermitianCholesky:
    @pytest.mark.parametrize("ll", [False, True])
    def test_upper_stored(self, ll):
        H = _hermitian_pd(40, 1)
        U = sp.triu(H).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        f = factorize_simplicial(A, ll=ll)
        assert f.ok
        rng = np.random.default_rng(2)
        b = rng.standard_normal(40) + 1j * rng.standard_normal(40)
        x = solve(f, b)
        assert np.abs(H @ x - b).max() < 1e-12

    def test_lower_stored_conjugation(self):
        """MM 'hermitian' files store the lower triangle (reference c.mtx)."""
        import os
        f = "/root/reference/CHOLMOD/Demo/Matrix/c.mtx"
        if not os.path.exists(f):
            pytest.skip("reference not mounted")
        from suitesparse_tpu.io import mmread
        C = mmread(f)
        assert C.stype < 0 and np.iscomplexobj(C.data)
        D = C.to_scipy().toarray()
        assert np.abs(D - D.conj().T).max() == 0     # hermitian expansion
        fc = factorize_simplicial(C)
        b = np.ones(3, dtype=complex)
        assert np.abs(D @ solve(fc, b) - b).max() < 1e-14

    def test_logdet_real(self):
        H = _hermitian_pd(20, 3)
        U = sp.triu(H).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        f = factorize_simplicial(A)
        _, ld = np.linalg.slogdet(H.toarray())
        assert f.logdet() == pytest.approx(ld, rel=1e-8)


class TestComplexKLU:
    def test_factor_solve_refactor(self):
        rng = np.random.default_rng(4)
        n = 90
        S = sp.random(n, n, density=0.05, random_state=rng, format="csc")
        S = S + 1j * sp.random(n, n, density=0.05, random_state=rng,
                               format="csc")
        S = sp.csc_matrix(S + (4 + 3j) * sp.identity(n))
        A = SparseCSC.from_scipy(S)
        sym = klu_analyze(A)
        num = klu_factor(A, sym)
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        assert np.abs(S @ klu_solve(num, b) - b).max() < 1e-12
        assert np.abs(S.T @ klu_solve(num, b, transpose=True) - b).max() < 1e-12
        A2 = SparseCSC(A.indptr, A.indices, A.data * (2 - 1j), A.shape)
        num = klu_refactor(A2, sym, num)
        assert np.abs(A2.to_scipy() @ klu_solve(num, b) - b).max() < 1e-12

    def test_reference_complex_matrix(self):
        import os
        f = "/root/reference/KLU/Matrix/1c.mtx"
        if not os.path.exists(f):
            pytest.skip("reference not mounted")
        from suitesparse_tpu.io import mmread
        C = mmread(f)
        num = klu_factor(C, klu_analyze(C))
        b = np.ones(C.ncol)
        assert np.abs(C.to_scipy() @ klu_solve(num, b) - b).max() < 1e-10


class TestComplexKLUDevice:
    def test_device_refactor_complex(self):
        import jax.numpy as jnp
        from suitesparse_tpu.lu import klu_device
        rng = np.random.default_rng(5)
        n = 60
        S = sp.random(n, n, density=0.06, random_state=rng, format="csc")
        S = sp.csc_matrix(S + 1j * sp.random(n, n, density=0.06,
                                             random_state=rng, format="csc")
                          + (5 + 2j) * sp.identity(n))
        A = SparseCSC.from_scipy(S)
        sym = klu_analyze(A)
        num = klu_factor(A, sym)
        plan, refactor, solve = klu_device(A, sym, num)
        av = jnp.asarray(A.data * (1.5 - 0.5j))
        f, Rs, ok = refactor(av)
        assert bool(ok)
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        x = np.asarray(solve(f, Rs, av, jnp.asarray(b)))
        S2 = S * (1.5 - 0.5j)
        assert np.abs(S2 @ x - b).max() < 1e-10


class TestComplexSupernodalRouting:
    def test_supernodal_config_routes_to_simplicial(self):
        """A complex matrix under supernodal config must NOT hit the
        real-only pf/wave device programs: CholeskySolver routes it to the
        simplicial path explicitly and still solves correctly."""
        from suitesparse_tpu.cholesky.api import cholesky
        from suitesparse_tpu.cholesky.simplicial import Factor

        H = _hermitian_pd(40, 3)
        U = sp.triu(H).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        solver = cholesky(A, mode="supernodal")
        assert isinstance(solver.factor, Factor)  # simplicial, not super
        rng = np.random.default_rng(4)
        b = rng.standard_normal(40) + 1j * rng.standard_normal(40)
        x = solver.solve(b)
        assert np.abs(H @ x - b).max() < 1e-12

    def test_factorize_super_rejects_complex(self):
        from suitesparse_tpu.cholesky import analyze, super_symbolic
        from suitesparse_tpu.cholesky.super_numeric import factorize_super
        from suitesparse_tpu.core.common import default_common

        H = _hermitian_pd(30, 5)
        U = sp.triu(H).tocsc()
        A = SparseCSC(U.indptr, U.indices, U.data, U.shape, stype=SYM_UPPER)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym = analyze(A, cm)
        ss = super_symbolic(A, sym, cm)
        with pytest.raises(TypeError):
            factorize_super(A, sym, ss, common=cm)
