"""Single-device CG/BiCGSTAB on the BASELINE Laplacian config — the
minimum end-to-end slice of SURVEY §7 M1: format → SpMV → device-resident
Krylov loop matches the dense solve within fp64 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from spgpu_tpu import convert, ops, solvers
from spgpu_tpu.utils import laplacian_2d, random_banded


def test_cg_laplacian_ell():
    coo = laplacian_2d(16, 16)
    ell = convert.coo_to_ell(coo)
    rng = np.random.default_rng(0)
    x_true = rng.standard_normal(coo.n_rows)
    b = jnp.asarray(coo.spmv(x_true))

    res = solvers.cg(lambda v: ops.ell_spmv(ell, v), b, tol=1e-12, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-8)


def test_cg_jacobi_preconditioned_hell():
    coo = laplacian_2d(20, 12)
    hell = convert.coo_to_hell(coo)
    m_inv = solvers.jacobi_preconditioner(coo)
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(coo.n_rows)
    b = jnp.asarray(coo.spmv(x_true))

    plain = solvers.cg(lambda v: ops.hell_spmv(hell, v), b, tol=1e-12, maxiter=2000)
    prec = solvers.cg(
        lambda v: ops.hell_spmv(hell, v), b, tol=1e-12, maxiter=2000, m_inv=m_inv
    )
    assert bool(prec.converged)
    np.testing.assert_allclose(np.asarray(prec.x), x_true, rtol=1e-7, atol=1e-8)
    assert int(prec.iterations) <= int(plain.iterations) + 5


def test_cg_fully_jitted_hdia():
    coo = laplacian_2d(12, 12)
    hdia = convert.coo_to_hdia(coo)
    b = jnp.ones(coo.n_rows)

    @jax.jit
    def solve(a, b):
        return solvers.cg(lambda v: ops.hdia_spmv(a, v), b, tol=1e-11, maxiter=1000)

    res = solve(hdia, b)
    assert bool(res.converged)
    ref = np.linalg.solve(coo.to_dense(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=1e-6, atol=1e-8)


def test_bicgstab_nonsymmetric():
    coo = random_banded(400, bands=5, wander=0, seed=9)  # diag-dominant, nonsym
    dia = convert.coo_to_dia(coo)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(coo.n_rows)
    b = jnp.asarray(coo.spmv(x_true))
    res = solvers.bicgstab(lambda v: ops.dia_spmv(dia, v), b, tol=1e-12, maxiter=4000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-6, atol=1e-7)


def test_cg_complex_hermitian():
    """Complex hermitian positive-definite solve — the Z-precision CG
    workload (the reference's C/Z kernels fed PSBLAS complex solvers)."""
    import jax.numpy as jnp

    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops import spmv
    from spgpu_tpu.convert import coo_to_hell
    from spgpu_tpu.solvers import cg

    rng = np.random.default_rng(5)
    n = 60
    b_mat = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    dense = b_mat @ b_mat.conj().T + n * np.eye(n)  # HPD
    rows, cols = np.nonzero(dense)
    coo = CooMatrix(rows, cols, dense[rows, cols].astype(np.complex128), n, n)
    a = coo_to_hell(coo)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    res = cg(lambda v: spmv(a, v), jnp.asarray(b), tol=1e-10, maxiter=500)
    assert bool(res.converged)
    np.testing.assert_allclose(dense @ np.asarray(res.x), b, atol=1e-7)


def test_high_level_solve_auto():
    """solve(): format auto-selection + relabel + CG, original numbering."""
    import jax.numpy as jnp

    from spgpu_tpu.solvers import solve
    from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded

    lap = laplacian_2d(24, 26, np.float32)
    b = np.random.default_rng(9).standard_normal(lap.n_rows).astype(np.float32)
    res = solve(lap, b, tol=1e-5, maxiter=4000)
    assert bool(res.converged)
    np.testing.assert_allclose(lap.spmv(np.asarray(res.x)), b, atol=1e-3)

    band = random_banded(700, bands=5, wander=0, seed=3, dtype=np.float32)
    b2 = np.random.default_rng(10).standard_normal(700).astype(np.float32)
    res2 = solve(band, b2, symmetric=False, tol=1e-6, maxiter=4000)
    assert bool(res2.converged)
    np.testing.assert_allclose(band.sum_duplicates().spmv(np.asarray(res2.x)),
                               b2, atol=1e-2)


def test_whell_forced_solve_roundtrips_permutation():
    import jax.numpy as jnp

    from spgpu_tpu.solvers import solve
    from spgpu_tpu.utils.fixtures import random_fem_like

    rng = np.random.default_rng(11)
    coo0 = random_fem_like(1500, 10.0, span=120, far_frac=0.0, seed=12,
                           dtype=np.float32)
    # symmetrise + diagonal-dominate -> SPD
    d = coo0.to_dense()
    d = (d + d.T) / 2 + np.eye(1500) * (np.abs(d).sum(1).max() + 1)
    rows, cols = np.nonzero(d)
    from spgpu_tpu.formats.coo import CooMatrix

    coo = CooMatrix(rows, cols, d[rows, cols].astype(np.float32), 1500, 1500)
    b = rng.standard_normal(1500).astype(np.float32)
    res = solve(coo, b, fmt="whell", tol=1e-5, maxiter=3000)
    assert bool(res.converged)
    np.testing.assert_allclose(d @ np.asarray(res.x), b, atol=1e-2)


def test_solve_routes_large_whell_to_blocks(monkeypatch):
    """solve() on a whell system whose x exceeds the VMEM budget runs
    the row-blocked packed layout (parallel/blocks.py) end-to-end."""
    import jax.numpy as jnp

    from spgpu_tpu.solvers import auto as _auto
    from spgpu_tpu.utils.fixtures import laplacian_2d

    monkeypatch.setattr(_auto, "_BLOCKS_X_BYTES", 4096)  # force blocks
    lap = laplacian_2d(40, 60, np.float32)
    b = np.random.default_rng(3).standard_normal(lap.n_rows).astype(
        np.float32)
    res = _auto.solve(lap, b, tol=1e-5, maxiter=6000, fmt="whell")
    x = np.asarray(res.x)
    assert np.linalg.norm(b - lap.spmv(x)) / np.linalg.norm(b) < 1e-3

    # dd (float64) through the blocked path
    lap64 = laplacian_2d(31, 23, np.float64)
    b64 = np.random.default_rng(4).standard_normal(lap64.n_rows)
    res64 = _auto.solve(lap64, b64, tol=1e-11, fmt="whell")
    x64 = np.asarray(res64.x, np.float64)
    assert np.linalg.norm(b64 - lap64.spmv(x64)) / np.linalg.norm(b64) < 1e-10
