"""Distributed elimination tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh8():
    from suitesparse_tpu.parallel.dist import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestDistributed:
    def test_distributed_factorize_matches_single(self, mesh8):
        from suitesparse_tpu.cholesky import (analyze, factorize_super,
                                              residual_norm, solve_super,
                                              super_symbolic)
        from suitesparse_tpu.core.common import default_common
        from suitesparse_tpu.io import generators
        from suitesparse_tpu.parallel.dist import distributed_factorize

        A = generators.laplacian_3d(6)
        f_dist, sym = distributed_factorize(A, mesh8, dtype=np.float64)
        cm = default_common()
        cm.cholesky.supernodal = "supernodal"
        sym2 = analyze(A, cm)
        ss2 = super_symbolic(A, sym2, cm)
        f_single = factorize_super(A, sym2, ss2, common=cm, dtype=np.float64)
        # identical panels (same plan, same math, deterministic);
        # exclude the trash slot (last element), which holds scatter garbage
        assert np.allclose(np.asarray(f_dist.Lx)[:-1],
                           np.asarray(f_single.Lx)[:-1], atol=1e-10)
        b = np.random.default_rng(0).standard_normal(A.ncol)
        x = solve_super(f_dist, b)
        assert residual_norm(A, x, b) < 1e-13

    def test_mesh_sizes(self):
        from suitesparse_tpu.parallel.dist import make_mesh, distributed_factorize
        from suitesparse_tpu.cholesky import residual_norm, solve_super
        from suitesparse_tpu.io import generators
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        A = generators.laplacian_2d(8)
        for nd in (2, 4):
            mesh = make_mesh(nd)
            f, _ = distributed_factorize(A, mesh, dtype=np.float64)
            b = np.ones(A.ncol)
            assert residual_norm(A, solve_super(f, b), b) < 1e-12, nd


class TestBlockCyclic:
    """Distributed 2D block-cyclic root-front Cholesky (SURVEY §7.6)."""

    def test_matches_dense_cholesky(self):
        from suitesparse_tpu.parallel.dist import make_mesh
        from suitesparse_tpu.parallel.block_cyclic import block_cyclic_cholesky
        rng = np.random.default_rng(60)
        for N, nb in [(130, 32), (64, 64), (35, 8)]:
            M = rng.standard_normal((N, N))
            F = M @ M.T + N * np.eye(N)
            L = block_cyclic_cholesky(F, make_mesh(8), nb=nb)
            ref = np.linalg.cholesky(F)
            assert np.abs(L - ref).max() / np.abs(ref).max() < 1e-12

    def test_distributed_factorize_uses_2d_root(self):
        from suitesparse_tpu.parallel.dist import make_mesh, distributed_factorize
        from suitesparse_tpu.cholesky import solve_super, residual_norm
        from suitesparse_tpu.io import generators
        A = generators.laplacian_3d(6)
        mesh = make_mesh(8)
        f, sym = distributed_factorize(A, mesh, dtype=np.float64,
                                       root_2d_min=8, root_2d_nb=8)
        b = np.ones(A.ncol)
        x = solve_super(f, b)
        assert residual_norm(A, x, b) < 1e-10
