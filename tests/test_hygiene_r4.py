"""Round-4 hygiene: generic dispatch covers every layout the package
returns, explicit fused/complex requests fail loudly instead of
silently downgrading, and traced dd scalars keep dd precision
(VERDICT r3 weak #4 / missing #3, ADVICE r3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgpu_tpu import convert, ops, solvers
from spgpu_tpu.utils import laplacian_2d, random_irregular


def test_spmv_dispatch_pcell():
    from spgpu_tpu.convert.pcell import coo_to_whell_percell

    coo = random_irregular(600, 600, avg_nnz_per_row=7.0, seed=3,
                           dtype=np.float32)
    a = coo_to_whell_percell(coo)
    x = np.random.default_rng(0).standard_normal(coo.n_cols).astype(np.float32)
    z = ops.spmv(a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z), coo.spmv(x), rtol=2e-5,
                               atol=1e-5)


def test_spmv_dispatch_blocked_packed():
    from spgpu_tpu.parallel.blocks import coo_to_whell_blocks

    coo = random_irregular(800, 800, avg_nnz_per_row=6.0, seed=4,
                           dtype=np.float32)
    a = coo_to_whell_blocks(coo, n_blocks=2)
    x = np.random.default_rng(1).standard_normal(coo.n_cols).astype(np.float32)
    xs = jnp.asarray(a.embed(x))
    z = ops.spmv(a, xs)
    np.testing.assert_allclose(a.extract(np.asarray(z)), coo.spmv(x),
                               rtol=2e-5, atol=1e-5)


def test_solve_fmt_blocks_and_pcell():
    coo = laplacian_2d(16, 16)
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(coo.n_rows).astype(np.float32)
    coo32 = type(coo)(coo.rows, coo.cols, coo.values.astype(np.float32),
                      coo.n_rows, coo.n_cols)
    b = coo32.spmv(x_true)
    for fmt in ("blocks", "pcell"):
        res = solvers.solve(coo32, b, symmetric=True, tol=1e-6,
                            maxiter=2000, fmt=fmt)
        assert bool(res.converged), fmt
        np.testing.assert_allclose(np.asarray(res.x, np.float64), x_true,
                                   rtol=1e-3, atol=1e-3)


def test_packed_partition_complex_routing():
    # complex COOs partition as ComplexPackedPartition plane pairs (r4
    # distributed C/Z); the row-blocked single-device layout still
    # rejects them loudly
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.parallel.blocks import coo_to_whell_blocks
    from spgpu_tpu.parallel.partition_packed import (
        ComplexPackedPartition, partition_coo_rows_packed)

    rng = np.random.default_rng(6)
    n = 256
    r = np.arange(n, dtype=np.int64)
    vals = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    coo = CooMatrix(r, r, vals, n, n)
    pm = partition_coo_rows_packed(coo, 2)
    assert isinstance(pm, ComplexPackedPartition)
    with pytest.raises(ValueError, match="complex"):
        coo_to_whell_blocks(coo, n_blocks=2)


def test_spmm_fused_true_rejected_for_dd():
    coo = laplacian_2d(12, 12)  # float64 values -> dd layout
    a = convert.coo_to_whell(coo, packed=True)
    assert a.is_dd
    from spgpu_tpu.ops import dd as _dd

    x = np.random.default_rng(7).standard_normal((2, coo.n_cols))
    xs = jnp.asarray(np.stack([
        _dd.split(a.embed(x[r])) for r in range(2)]))
    with pytest.raises(NotImplementedError, match="fused"):
        ops.whell_spmm(a, xs, fused=True)
    # the default (loop-of-SpMV) still runs
    z = ops.whell_spmm(a, xs)
    assert z.shape[0] == 2


def test_dd_pair_traced_float64_keeps_precision():
    # a traced float64 alpha must not round to one fp32 word
    coo = laplacian_2d(10, 10)
    a = convert.coo_to_whell(coo, packed=True)
    from spgpu_tpu.ops import dd as _dd

    rng = np.random.default_rng(8)
    xv = rng.standard_normal(coo.n_rows)
    alpha = 1.0 + 1e-9  # not representable in fp32
    xs = jnp.asarray(_dd.split(a.embed(xv)))

    @jax.jit
    def f(xs, al):
        return ops.whell_spmv(a, xs, alpha=al)

    z = f(xs, jnp.float64(alpha))
    want = alpha * coo.spmv(xv)
    got = _dd.join(np.asarray(z))[np.asarray(a.lane_of_row)[: coo.n_rows]]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
