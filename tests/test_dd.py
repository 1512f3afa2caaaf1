"""Double-float (fp64 emulation) arithmetic, SpMV, and CG.

The reference ships D-precision natively (``hell_dspmv.cu:28-33``); TPU
v5e has no fp64 ALU, so D is two fp32 words with error-free transforms
(``spgpu_tpu.ops.dd``).  These tests pin the accuracy contract: ~2^-48
per operation, 1e-13-class SpMV, and a CG trajectory that matches a
native-float64 shadow run.

The EFTs are fragile under compiler rewrites: XLA's simplifier cancels
TwoSum error terms without the ``_ob`` barriers, and fusion into
reduction trees rewrites producers unless solver state is pinned
(cg.py ``pin``).  test_cg_dd_jitted_matches_float64 is the regression
for both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spgpu_tpu.convert.whell import coo_to_whell
from spgpu_tpu.ops import dd
from spgpu_tpu.ops.pallas_kernels import whell_spmv_dd_pallas
from spgpu_tpu.utils.fixtures import laplacian_2d, random_fem_like


def test_eft_helpers_accuracy():
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal(2000) * 10.0 ** rng.integers(-6, 6, 2000)
    b64 = rng.standard_normal(2000)
    ap = jnp.asarray(dd.split(a64))
    bp = jnp.asarray(dd.split(b64))

    def f(ap, bp):
        h, l = dd.dd_mul(ap[0], ap[1], bp[0], bp[1])
        d = dd.dd_dot(ap, bp)
        q = dd.dd_div(ap[0], ap[1], bp[0], bp[1])
        return jnp.stack([h, l]), jnp.stack(d), jnp.stack([q[0], q[1]])

    for fn in (f, jax.jit(f)):
        prod, dot, quot = fn(ap, bp)
        assert np.abs(dd.join(np.asarray(prod)) - a64 * b64).max() / np.abs(
            a64 * b64).max() < 1e-13
        ref = float(a64 @ b64)
        assert abs(dd.join(np.asarray(dot)) - ref) / abs(ref) < 1e-12
        assert np.abs(dd.join(np.asarray(quot)) - a64 / b64).max() / np.abs(
            a64 / b64).max() < 1e-13


def test_split_join_roundtrip():
    """A dd pair carries ~49 significant bits (24 + 24 + sign gap);
    split/join round-trips to 2^-48 relative, not bit-exactly."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal(500) * 10.0 ** rng.integers(-20, 20, 500)
    back = dd.join(dd.split(a))
    assert np.abs(back - a).max() / np.abs(a).max() < 2.0 ** -48 or \
        (np.abs(back - a) <= np.abs(a) * 2.0 ** -47).all()


@pytest.mark.parametrize("fixture", ["laplacian", "fem"])
def test_dd_spmv_matches_float64_golden(fixture):
    if fixture == "laplacian":
        coo = laplacian_2d(37, 29, np.float64)
    else:
        coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=5,
                              dtype=np.float64)
    a = coo_to_whell(coo, packed=True)
    assert a.is_dd
    rng = np.random.default_rng(2)
    x = rng.standard_normal(coo.n_cols)
    xl = np.zeros(a.n_rows)
    xl[np.asarray(a.lane_of_row)] = x
    z = whell_spmv_dd_pallas(a, jnp.asarray(dd.split(xl)), interpret=True)
    z64 = dd.join(np.asarray(z))[np.asarray(a.lane_of_row)]
    ref = coo.spmv(x)
    assert np.abs(z64 - ref).max() / np.abs(ref).max() < 1e-12


def test_cg_dd_jitted_matches_float64():
    """The D-precision solve workload: jitted dd CG must track a native
    float64 CG (same algorithm) to the 1e-11 class — the regression for
    the XLA EFT-rewrite hazards (barriers + state pinning)."""
    from spgpu_tpu.ops import whell_spmv
    from spgpu_tpu.solvers.cg import cg_dd

    coo = laplacian_2d(37, 29, np.float64)
    a = coo_to_whell(coo, packed=True)
    lor = np.asarray(a.lane_of_row)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(coo.n_cols)
    bl = np.zeros(a.n_rows)
    bl[lor] = b
    res = cg_dd(lambda v: whell_spmv(a, v, interpret=True),
                jnp.asarray(dd.split(bl)), tol=1e-12, maxiter=1000)
    x64 = dd.join(np.asarray(res.x))[lor]
    # true residual, not the recursive one
    true_r = np.linalg.norm(b - coo.spmv(x64)) / np.linalg.norm(b)
    assert true_r < 5e-11
    assert bool(res.converged)

    # float64 shadow of the same algorithm
    import scipy.sparse as sp

    A = sp.coo_matrix((coo.values, (coo.rows, coo.cols)),
                      shape=coo.shape).tocsr()
    x = np.zeros_like(b)
    r = b.copy()
    p = r.copy()
    rz = r @ r
    bn = np.linalg.norm(b)
    it = 0
    while np.linalg.norm(r) > 1e-12 * bn and it < 1000:
        ap = A @ p
        al = rz / (p @ ap)
        x += al * p
        r -= al * ap
        rz2 = r @ r
        p = r + (rz2 / rz) * p
        rz = rz2
        it += 1
    assert abs(int(res.iterations) - it) <= 2  # same trajectory class
    assert np.abs(x64 - x).max() < 1e-8 * max(np.abs(x).max(), 1.0)


def test_whdia_dd_spmv_and_solve():
    """D-precision WHDIA (hdia_dspmv parity): dd SpMV vs float64 golden,
    and solve() routing a float64 banded SPD system through cg_dd."""
    from spgpu_tpu import solvers
    from spgpu_tpu.convert.whdia import coo_to_whdia
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops.pallas_kernels import whdia_spmv_dd_pallas
    from spgpu_tpu.utils.fixtures import random_banded

    coo = random_banded(900, bands=7, wander=13, seed=4,
                        dtype=np.float64).sum_duplicates()
    a = coo_to_whdia(coo)
    assert a.is_dd
    x = np.random.default_rng(0).standard_normal(coo.n_cols)
    z = whdia_spmv_dd_pallas(a, jnp.asarray(dd.split(x)), interpret=True)
    ref = coo.spmv(x)
    assert np.abs(dd.join(np.asarray(z)) - ref).max() / np.abs(ref).max() < 1e-12

    band = random_banded(1024, bands=5, wander=1, seed=9,
                         dtype=np.float64).sum_duplicates()
    n = 1024
    rows = np.concatenate([band.rows, band.cols, np.arange(n)])
    cols = np.concatenate([band.cols, band.rows, np.arange(n)])
    vals = np.concatenate([np.abs(band.values) * .01,
                           np.abs(band.values) * .01, np.ones(n) * 5.0])
    A = CooMatrix(rows, cols, vals, n, n).sum_duplicates()
    b = np.random.default_rng(1).standard_normal(n)
    res = solvers.solve(A, b, tol=1e-12, fmt="whdia")
    xs = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - A.spmv(xs)) / np.linalg.norm(b) < 1e-11


@pytest.mark.parametrize("cdt,tol", [(np.complex64, 3e-5),
                                     (np.complex128, 1e-12)])
def test_complex_fast_path(cdt, tol):
    """C/Z SpMV on the packed fast path: two real-plane matrices, four
    plane products (Z planes are dd) — the C/Z kernel coverage the
    reference gets from template instantiation (hell_cspmv.cu)."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops import whell_spmv

    rng = np.random.default_rng(0)
    base = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=5,
                           dtype=np.float64)
    vals = (rng.standard_normal(base.nnz)
            + 1j * rng.standard_normal(base.nnz)).astype(cdt)
    coo = CooMatrix(base.rows, base.cols, vals, base.n_rows, base.n_cols)
    a = coo_to_whell(coo, packed=True)
    x = (rng.standard_normal(coo.n_cols)
         + 1j * rng.standard_normal(coo.n_cols)).astype(cdt)
    z = whell_spmv(a, jnp.asarray(a.embed_complex(x)), interpret=True)
    zo = a.extract_complex(np.asarray(z))
    ref = coo.spmv(x)
    assert np.abs(zo - ref).max() / np.abs(ref).max() < tol
    assert zo.dtype == np.dtype(cdt)


@pytest.mark.parametrize("cdt,tol,check", [(np.complex64, 1e-5, 1e-4),
                                           (np.complex128, 1e-12, 1e-10)])
def test_hermitian_cg_fast_path(cdt, tol, check):
    """C/Z hermitian positive-definite solve through the packed complex
    plane fast path (Z = dd planes) — the Z-precision CG workload the
    reference's zdot/zhellspmv kernels fed."""
    from spgpu_tpu import solvers
    from spgpu_tpu.formats.coo import CooMatrix

    rng = np.random.default_rng(0)
    n = 600
    d = np.ones(n) * 6.0
    off = (rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)) * 0.5
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([d.astype(np.complex128), off, np.conj(off)])
    A = CooMatrix(rows, cols, vals.astype(cdt), n, n)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(cdt)
    res = solvers.solve(A, b, tol=tol, maxiter=500)
    x = np.asarray(res.x)
    assert x.dtype == np.dtype(cdt)
    assert np.linalg.norm(b - A.spmv(x)) / np.linalg.norm(b) < check


def test_bicgstab_dd_nonsymmetric():
    """Non-symmetric fp64 solve on the fast path (dd BiCGSTAB)."""
    from spgpu_tpu import solvers
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import random_banded

    rng = np.random.default_rng(0)
    n = 1024
    band = random_banded(n, bands=5, wander=2, seed=3, dtype=np.float64)
    rows = np.concatenate([band.rows, np.arange(n)])
    cols = np.concatenate([band.cols, np.arange(n)])
    vals = np.concatenate([band.values * 0.1, np.ones(n) * 4.0])
    A = CooMatrix(rows, cols, vals, n, n).sum_duplicates()
    b = rng.standard_normal(n)
    res = solvers.solve(A, b, symmetric=False, tol=1e-12, fmt="whell")
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(b - A.spmv(x)) / np.linalg.norm(b) < 1e-10


def test_solve_float64_routes_dd():
    """solve() on a float64 SPD system runs the dd fast path end-to-end."""
    from spgpu_tpu import solvers

    coo = laplacian_2d(31, 23, np.float64)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(coo.n_rows)
    res = solvers.solve(coo, b, tol=1e-11, fmt="whell")
    x = np.asarray(res.x, dtype=np.float64)
    resid = np.linalg.norm(b - coo.spmv(x)) / np.linalg.norm(b)
    assert resid < 1e-10


@pytest.mark.parametrize("cdt,tol", [(np.complex64, 2e-4),
                                     (np.complex128, 1e-10)])
def test_bicgstab_complex_planes(cdt, tol):
    """C/Z non-hermitian solve through solve() — plane-stacked BiCGSTAB
    (bicgstab_planes / bicgstab_planes_dd).  Z coverage parity with the
    reference's unconditional Z instantiation (zdot.cu, zaxpby.cu)."""
    from spgpu_tpu import solvers
    from spgpu_tpu.formats.coo import CooMatrix

    rng = np.random.default_rng(7)
    n = 500
    # diag-dominant NON-hermitian tridiagonal complex system
    d = 5.0 + 1j * rng.standard_normal(n)
    up = (rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)) * .4
    lo = (rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)) * .4
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([d, up, lo]).astype(cdt)
    A = CooMatrix(rows, cols, vals, n, n)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(cdt)
    solver_tol = 1e-6 if cdt == np.complex64 else 1e-12
    res = solvers.solve(A, b, symmetric=False, tol=solver_tol, maxiter=800)
    x = np.asarray(res.x)
    assert x.dtype == np.dtype(cdt)
    assert np.linalg.norm(b - A.spmv(x)) / np.linalg.norm(b) < tol


@pytest.mark.parametrize("cdt,tol", [(np.complex64, 3e-5),
                                     (np.complex128, 1e-12)])
def test_complex_alpha_beta_epilogue(cdt, tol):
    """alpha/beta on the complex fast path (reference signature parity:
    hell_spmv_base.cuh:103-157 honours alpha/beta in every precision)."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops import whell_spmv

    rng = np.random.default_rng(1)
    base = random_fem_like(1200, 8.0, span=100, far_frac=0.01, seed=2,
                           dtype=np.float64)
    vals = (rng.standard_normal(base.nnz)
            + 1j * rng.standard_normal(base.nnz)).astype(cdt)
    coo = CooMatrix(base.rows, base.cols, vals, base.n_rows, base.n_cols)
    a = coo_to_whell(coo, packed=True)
    x = (rng.standard_normal(coo.n_cols)
         + 1j * rng.standard_normal(coo.n_cols)).astype(cdt)
    y = (rng.standard_normal(coo.n_rows)
         + 1j * rng.standard_normal(coo.n_rows)).astype(cdt)
    alpha, beta = 1.5 - 0.5j, -0.75 + 0.25j
    z = whell_spmv(a, jnp.asarray(a.embed_complex(x)), alpha=alpha,
                   beta=beta, y=jnp.asarray(a.embed_complex(y)),
                   interpret=True)
    zo = a.extract_complex(np.asarray(z))
    ref = alpha * coo.spmv(x) + beta * y
    assert np.abs(zo - ref).max() / np.abs(ref).max() < tol


def test_dd_whdia_alpha_beta_epilogue():
    """alpha/beta on the dd WHDIA path (was NotImplementedError in r2)."""
    from spgpu_tpu.convert import coo_to_whdia
    from spgpu_tpu.ops import whdia_spmv
    from spgpu_tpu.utils.fixtures import random_banded

    coo = random_banded(1024, bands=5, wander=1, seed=4,
                        dtype=np.float64).sum_duplicates()
    rng = np.random.default_rng(2)
    x = rng.standard_normal(coo.n_cols)
    y = rng.standard_normal(coo.n_rows)
    a = coo_to_whdia(coo)
    alpha, beta = 2.5, -1.25
    z = whdia_spmv(a, jnp.asarray(dd.split(x)), alpha=alpha, beta=beta,
                   y=jnp.asarray(dd.split(y)), interpret=True)
    ref = alpha * coo.spmv(x) + beta * y
    assert np.abs(dd.join(np.asarray(z)) - ref).max() / np.abs(ref).max() < 1e-12


def test_spmm_dd_and_complex_loop_path():
    """whell_spmm dispatches dd and complex matrices per-RHS (was an
    unguarded whell_spmv_pallas call in r2 — confusing dtype errors)."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops import whell_spmm

    rng = np.random.default_rng(3)
    base = random_fem_like(900, 8.0, span=90, far_frac=0.0, seed=6,
                           dtype=np.float64)
    # dd (float64) matrix, 3 RHS
    a = coo_to_whell(base, packed=True)
    xs = rng.standard_normal((3, base.n_cols))
    x_st = jnp.asarray(np.stack([dd.split(a.embed(x)) for x in xs]))
    z = whell_spmm(a, x_st, interpret=True)
    for r in range(3):
        ref = base.spmv(xs[r])
        zr = dd.join(np.asarray(z[r]))[np.asarray(a.lane_of_row)]
        assert np.abs(zr - ref).max() / np.abs(ref).max() < 1e-12

    # complex64 matrix, 2 RHS
    cvals = (base.values + 1j * rng.standard_normal(base.nnz)).astype(
        np.complex64)
    cco = CooMatrix(base.rows, base.cols, cvals, base.n_rows, base.n_cols)
    ac = coo_to_whell(cco, packed=True)
    xc = (rng.standard_normal((2, base.n_cols))
          + 1j * rng.standard_normal((2, base.n_cols))).astype(np.complex64)
    xc_st = jnp.asarray(np.stack([ac.embed_complex(x) for x in xc]))
    zc = whell_spmm(ac, xc_st, interpret=True)
    for r in range(2):
        ref = cco.spmv(xc[r])
        zr = ac.extract_complex(np.asarray(zc[r]))
        assert np.abs(zr - ref).max() / np.abs(ref).max() < 3e-5


@pytest.mark.parametrize("cdt,tol", [(np.complex64, 3e-5),
                                     (np.complex128, 1e-12)])
@pytest.mark.parametrize("which", ["whdia", "sdia"])
def test_complex_dia_class_fast_path(cdt, tol, which):
    """C/Z SpMV on the DIA-class fast paths — plane-pair WHDIA/SDIA
    (reference parity: dia_cspmv.cu:28, dia_zspmv.cu, hdia_cspmv.cu,
    hdia_zspmv.cu)."""
    from spgpu_tpu.convert import coo_to_sdia, coo_to_whdia
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.formats.cplanes import ComplexPlanes
    from spgpu_tpu.ops import sdia_spmv, spmv, whdia_spmv
    from spgpu_tpu.utils.fixtures import random_banded

    rng = np.random.default_rng(8)
    base = random_banded(1500, bands=7, wander=2 if which == "whdia" else 0,
                         seed=3, dtype=np.float64).sum_duplicates()
    vals = (base.values + 1j * rng.standard_normal(base.nnz)).astype(cdt)
    coo = CooMatrix(base.rows, base.cols, vals, base.n_rows, base.n_cols)
    a = coo_to_whdia(coo) if which == "whdia" else coo_to_sdia(coo)
    assert isinstance(a, ComplexPlanes)
    x = (rng.standard_normal(coo.n_cols)
         + 1j * rng.standard_normal(coo.n_cols)).astype(cdt)
    y = (rng.standard_normal(coo.n_rows)
         + 1j * rng.standard_normal(coo.n_rows)).astype(cdt)
    op = whdia_spmv if which == "whdia" else sdia_spmv
    z = op(a, jnp.asarray(a.embed_complex(x)), interpret=True)
    zo = a.extract_complex(np.asarray(z))
    ref = coo.spmv(x)
    assert np.abs(zo - ref).max() / np.abs(ref).max() < tol
    assert zo.dtype == np.dtype(cdt)
    # generic dispatch + alpha/beta epilogue
    alpha, beta = 0.5 + 2.0j, -1.0 + 0.5j
    z2 = spmv(a, jnp.asarray(a.embed_complex(x)), alpha=alpha, beta=beta,
              y=jnp.asarray(a.embed_complex(y)), interpret=True)
    ref2 = alpha * ref + beta * y
    zo2 = a.extract_complex(np.asarray(z2))
    assert np.abs(zo2 - ref2).max() / np.abs(ref2).max() < tol


@pytest.mark.parametrize("cdt,tol", [(np.complex64, 2e-4),
                                     (np.complex128, 1e-10)])
def test_complex_solve_routes_dia_class(cdt, tol):
    """solve() on a banded hermitian complex system routes to a DIA-class
    plane layout and converges (C and Z)."""
    from spgpu_tpu import solvers
    from spgpu_tpu.formats.coo import CooMatrix

    rng = np.random.default_rng(9)
    n = 800
    d = np.full(n, 6.0 + 0.0j)
    off = (rng.standard_normal(n - 1) + 1j * rng.standard_normal(n - 1)) * .4
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([d, off, np.conj(off)]).astype(cdt)
    A = CooMatrix(rows, cols, vals, n, n)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(cdt)
    solver_tol = 1e-6 if cdt == np.complex64 else 1e-12
    res = solvers.solve(A, b, tol=solver_tol, maxiter=600)
    x = np.asarray(res.x)
    assert x.dtype == np.dtype(cdt)
    assert np.linalg.norm(b - A.spmv(x)) / np.linalg.norm(b) < tol


def test_dd_epilogue_traced_alpha():
    """alpha/beta as TRACED scalars through the dd fast path (r2 allowed
    this; the r3 epilogue refactor must not regress it)."""
    import jax

    from spgpu_tpu.convert import coo_to_whdia
    from spgpu_tpu.ops import whdia_spmv
    from spgpu_tpu.utils.fixtures import random_banded

    coo = random_banded(512, bands=5, wander=1, seed=4,
                        dtype=np.float64).sum_duplicates()
    rng = np.random.default_rng(2)
    x = rng.standard_normal(coo.n_cols)
    a = coo_to_whdia(coo)

    @jax.jit
    def f(xp, alpha):
        return whdia_spmv(a, xp, alpha=alpha, interpret=True)

    z = f(jnp.asarray(dd.split(x)), jnp.float32(2.5))
    ref = 2.5 * coo.spmv(x)
    assert np.abs(dd.join(np.asarray(z)) - ref).max() / np.abs(ref).max() < 1e-6
