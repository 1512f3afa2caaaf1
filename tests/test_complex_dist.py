"""Distributed complex (C/Z) on the packed production path (r4):
plane-pair partitions, 4-plane-product shard matvec overlapped with the
halo all-to-all, and mesh-wide hermitian-CG / BiCGSTAB with psum (C) or
error-free dd (Z) reductions.  The reference ships C/Z unconditionally
(``hdia_zspmv.cu``, ``zdot.cu``)."""

import numpy as np
import pytest

from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.parallel import make_row_mesh
from spgpu_tpu.parallel.dist_solve import dist_bicgstab, dist_cg
from spgpu_tpu.parallel.dist_spmv import dist_spmv
from spgpu_tpu.parallel.partition_packed import (
    ComplexPackedPartition, partition_coo_rows_packed)
from spgpu_tpu.utils.fixtures import random_banded

pytestmark = pytest.mark.slow

_rng = np.random.default_rng(6)


def _herm_banded(n, dt):
    """Hermitian PD tridiagonal-ish band."""
    r = np.arange(n)
    rows = np.concatenate([r, r[:-1], r[1:]])
    cols = np.concatenate([r, r[1:], r[:-1]])
    off = (_rng.standard_normal(n - 1)
           + 1j * _rng.standard_normal(n - 1)) * 0.3
    vals = np.concatenate([np.full(n, 4.0 + 0j), off,
                           np.conj(off)]).astype(dt)
    return CooMatrix(rows, cols, vals, n, n)


@pytest.mark.parametrize("dt,tol", [(np.complex64, 1e-5),
                                    (np.complex128, 1e-12)])
def test_complex_dist_spmv_matches_golden(dt, tol):
    base = random_banded(2048, bands=7, wander=3, seed=3,
                         dtype=np.float64).sum_duplicates()
    vals = (base.values + 1j * _rng.standard_normal(base.nnz)).astype(dt)
    coo = CooMatrix(base.rows, base.cols, vals, base.n_rows, base.n_cols)
    for S in (2, 4):
        pm = partition_coo_rows_packed(coo, S)
        assert isinstance(pm, ComplexPackedPartition)
        assert pm.overlapped
        x = (_rng.standard_normal(coo.n_cols)
             + 1j * _rng.standard_normal(coo.n_cols)).astype(dt)
        z = np.asarray(dist_spmv(pm, x, mesh=make_row_mesh(S)))
        g = coo.spmv(x)
        assert np.abs(z - g).max() / np.abs(g).max() < tol


@pytest.mark.parametrize("dt,tol,xtol", [(np.complex64, 1e-6, 1e-4),
                                         (np.complex128, 1e-11, 1e-8)])
def test_complex_dist_herm_cg(dt, tol, xtol):
    coo = _herm_banded(1024, dt)
    pm = partition_coo_rows_packed(coo, 4)
    xt = (_rng.standard_normal(1024)
          + 1j * _rng.standard_normal(1024)).astype(dt)
    b = coo.spmv(xt)
    res = dist_cg(pm, b, make_row_mesh(4), tol=tol, maxiter=2000)
    assert bool(np.asarray(res.converged).any())
    np.testing.assert_allclose(np.asarray(res.x), xt, rtol=xtol, atol=xtol)


@pytest.mark.parametrize("dt,tol,xtol", [(np.complex64, 1e-6, 1e-3),
                                         (np.complex128, 1e-11, 1e-7)])
def test_complex_dist_bicgstab(dt, tol, xtol):
    base = _herm_banded(512, dt)
    vals = base.values + (0.1 + 0.05j) * np.where(
        base.rows < base.cols, 1, 0).astype(dt)
    coo = CooMatrix(base.rows, base.cols, vals, 512, 512)
    xt = (_rng.standard_normal(512)
          + 1j * _rng.standard_normal(512)).astype(dt)
    b = coo.spmv(xt)
    pm = partition_coo_rows_packed(coo, 2)
    res = dist_bicgstab(pm, b, make_row_mesh(2), tol=tol, maxiter=3000)
    np.testing.assert_allclose(np.asarray(res.x), xt, rtol=xtol, atol=xtol)
