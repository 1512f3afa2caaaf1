"""SDIA (static-offset DIA) — conversion + Pallas kernel (interpret mode).

Parity target: ``spgpu?diaspmv`` (``dia_spmv_base_template.cuh``); the
golden is the host COO SpMV, as in the reference's ctest pattern.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spgpu_tpu import convert, ops
from spgpu_tpu.formats import SdiaMatrix
from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded, random_irregular


def _check(coo, rtol=5e-6):
    a = convert.coo_to_sdia(coo)
    x = np.random.default_rng(0).standard_normal(coo.n_cols).astype(coo.dtype)
    gold = coo.spmv(x)
    z = np.asarray(ops.sdia_spmv(a, jnp.asarray(x)))
    scale = max(np.abs(gold).max(), 1e-30)
    np.testing.assert_allclose(z, gold, rtol=0, atol=rtol * scale)
    return a


def test_laplacian():
    a = _check(laplacian_2d(40, 40, dtype=np.float32))
    assert a.n_diags == 5
    assert a.offsets == (-40, -1, 0, 1, 40)


def test_banded():
    _check(random_banded(3000, bands=9, seed=1, dtype=np.float32))


def test_banded_wide_band():
    _check(random_banded(2000, bands=31, seed=2, dtype=np.float32))


def test_tall_rectangular():
    coo = random_irregular(700, 90, avg_nnz_per_row=4.0, seed=3,
                           dtype=np.float32)
    _check(coo)


def test_wide_rectangular():
    coo = random_irregular(90, 700, avg_nnz_per_row=12.0, seed=4,
                           dtype=np.float32)
    _check(coo)


def test_alpha_beta():
    coo = laplacian_2d(24, 24, dtype=np.float32)
    a = convert.coo_to_sdia(coo)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    y = rng.standard_normal(coo.n_rows).astype(np.float32)
    gold = 2.5 * coo.spmv(x) - 0.5 * y
    z = np.asarray(ops.sdia_spmv(a, jnp.asarray(x), alpha=2.5, beta=-0.5,
                                 y=jnp.asarray(y)))
    np.testing.assert_allclose(z, gold, rtol=0,
                               atol=5e-6 * np.abs(gold).max())


def test_empty():
    from spgpu_tpu.formats.coo import CooMatrix

    coo = CooMatrix(rows=np.zeros(0, np.int64), cols=np.zeros(0, np.int64),
                    values=np.zeros(0, np.float32), n_rows=64, n_cols=64)
    a = convert.coo_to_sdia(coo)
    assert a.n_diags == 0
    z = np.asarray(ops.sdia_spmv(a, jnp.ones(64, jnp.float32)))
    assert np.all(z == 0)


def test_dia_to_sdia_matches():
    coo = random_banded(1500, bands=7, seed=6, dtype=np.float32)
    d = convert.coo_to_dia(coo)
    a = convert.dia_to_sdia(d)
    b = convert.coo_to_sdia(coo)
    assert a.offsets == b.offsets
    np.testing.assert_array_equal(np.asarray(a.values), np.asarray(b.values))


def test_spmm_and_generic_dispatch():
    coo = random_banded(1200, bands=5, seed=7, dtype=np.float32)
    a = convert.coo_to_sdia(coo)
    x = np.random.default_rng(8).standard_normal((3, coo.n_cols)).astype(
        np.float32)
    gold = np.stack([coo.spmv(x[r]) for r in range(3)])
    z = np.asarray(ops.sdia_spmm(a, jnp.asarray(x)))
    np.testing.assert_allclose(z, gold, rtol=0,
                               atol=5e-6 * np.abs(gold).max())
    z1 = np.asarray(ops.spmv(a, jnp.asarray(x[0])))
    np.testing.assert_allclose(z1, gold[0], rtol=0,
                               atol=5e-6 * np.abs(gold).max())


def test_sdia_is_pytree_leaf_static_offsets():
    import jax

    coo = laplacian_2d(16, 16, dtype=np.float32)
    a = convert.coo_to_sdia(coo)
    leaves, treedef = jax.tree_util.tree_flatten(a)
    assert len(leaves) == 1  # only values; offsets/shape are static
    b = jax.tree_util.tree_unflatten(treedef, leaves)
    assert b.offsets == a.offsets


def test_dd_fp64():
    coo = laplacian_2d(30, 30, dtype=np.float64)
    a = convert.coo_to_sdia(coo)
    assert a.is_dd
    from spgpu_tpu.ops import dd

    x = np.random.default_rng(9).standard_normal(coo.n_cols)
    gold = coo.spmv(x)
    xp = jnp.asarray(dd.split(x))
    z = ops.sdia_spmv(a, xp)
    z64 = dd.join(np.asarray(z))
    np.testing.assert_allclose(z64, gold, rtol=0,
                               atol=1e-13 * np.abs(gold).max())


def test_solve_auto_picks_sdia():
    from spgpu_tpu.solvers import solve

    coo = laplacian_2d(24, 24, dtype=np.float32)
    b = np.ones(coo.n_rows, np.float32)
    res = solve(coo, b, tol=1e-5, fmt="sdia")
    r = b - coo.spmv(np.asarray(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4
    # auto selection routes the stencil class to sdia
    from spgpu_tpu.convert import suggest_format

    assert suggest_format(coo) == "dia"


def test_solve_dd_sdia():
    from spgpu_tpu.solvers import solve

    coo = laplacian_2d(16, 16, dtype=np.float64)
    b = np.ones(coo.n_rows, np.float64)
    res = solve(coo, b, tol=1e-11, fmt="sdia")
    r = b - coo.spmv(np.asarray(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_complex_fused_one_pass_sdia(rng):
    """r5: the fused one-pass complex SDIA kernel (shared per-diagonal
    x rotations, 4 fmas — ``dia_cspmv.cu:28-33`` parity) matches the
    plane-product path and the host golden with complex alpha/beta."""
    import jax.numpy as jnp

    from spgpu_tpu import convert, ops
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import laplacian_2d

    base = laplacian_2d(40, 40, np.float64)
    cm = CooMatrix(base.rows, base.cols,
                   (base.values + 1j * rng.standard_normal(base.nnz))
                   .astype(np.complex64), base.n_rows, base.n_cols)
    a = convert.coo_to_sdia(cm)
    xc = (rng.standard_normal(cm.n_cols)
          + 1j * rng.standard_normal(cm.n_cols)).astype(np.complex64)
    x = jnp.asarray(np.stack([xc.real, xc.imag]).astype(np.float32))
    yc = np.stack([rng.standard_normal(cm.n_rows),
                   rng.standard_normal(cm.n_rows)]).astype(np.float32)
    al, be = 2 - 1j, 0.5 + 2j
    zf = np.asarray(ops.sdia_spmv(a, x, al, be, jnp.asarray(yc)))
    zp = np.asarray(ops.sdia_spmv(a, x, al, be, jnp.asarray(yc),
                                  fused=False))
    g = al * cm.spmv(xc.astype(np.complex128)) + be * (yc[0] + 1j * yc[1])
    err = np.linalg.norm(zf[0] + 1j * zf[1] - g) / np.linalg.norm(g)
    assert err < 2e-5, err
    np.testing.assert_allclose(zf, zp, rtol=2e-4, atol=2e-4)


def test_z_fused_one_pass_sdia(rng):
    """r5: the fused one-pass Z (complex128) SDIA kernel — 4 dd slabs,
    shared per-diagonal window builds, 4 error-free products
    (``dia_zspmv.cu`` parity) — matches the dd plane path and the host
    golden at D precision."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import laplacian_2d

    base = laplacian_2d(40, 40, np.float64)
    cm = CooMatrix(base.rows, base.cols,
                   (base.values + 1j * rng.standard_normal(base.nnz))
                   .astype(np.complex128), base.n_rows, base.n_cols)
    a = convert.coo_to_sdia(cm)
    assert a.is_dd
    xc = rng.standard_normal(cm.n_cols) + 1j * rng.standard_normal(
        cm.n_cols)
    x = jnp.asarray(a.embed_complex(xc))
    zf = np.asarray(ops.sdia_spmv(a, x))
    zp = np.asarray(ops.sdia_spmv(a, x, fused=False))
    np.testing.assert_allclose(zf[:, 0], zp[:, 0], rtol=1e-6, atol=1e-6)
    g = cm.spmv(xc)
    got = (zf[0, 0].astype(np.float64) + zf[0, 1]) \
        + 1j * (zf[1, 0].astype(np.float64) + zf[1, 1])
    err = np.linalg.norm(got - g) / np.linalg.norm(g)
    assert err < 1e-13, err
