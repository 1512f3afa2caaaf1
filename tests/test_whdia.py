"""WHDIA format + Pallas kernel tests (interpret mode on CPU).

Duplicate policy parity: ``coo_to_whdia`` plain-stores into the
(hack, diagonal) cell so the LAST entry in file order wins — matching
``coo2dia``/``cooToHdia`` (``dia.c:95-100``, SURVEY §2.3); golden
comparisons therefore run on deduplicated COO.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spgpu_tpu import convert, ops
from spgpu_tpu.convert.whdia import coo_to_whdia
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.ops.pallas_kernels import whdia_spmv_pallas
from spgpu_tpu.utils.fixtures import laplacian_2d, laplacian_3d, random_banded


CASES = {
    "laplace2d": lambda: laplacian_2d(23, 31, np.float32),
    "laplace2d_wide": lambda: laplacian_2d(200, 30, np.float32),
    "laplace3d": lambda: laplacian_3d(12, 11, 9, np.float32),
    "banded": lambda: random_banded(900, bands=7, wander=13, seed=4, dtype=np.float32),
    "banded_wide": lambda: random_banded(2000, bands=31, wander=0, seed=5, dtype=np.float32),
    "banded_neg": lambda: random_banded(700, bands=5, wander=3, seed=6, dtype=np.float32),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_layout_roundtrip(name):
    coo = CASES[name]().sum_duplicates()
    a = coo_to_whdia(coo)
    np.testing.assert_array_equal(a.to_dense(), coo.to_dense())
    assert a.total_slots % 64 == 0
    # r0 values fit the window (slab mode: lane-replicated; pattern
    # mode: reconstructed per-slot scalars)
    if a.slot_r0 is not None:
        r0w = np.asarray(a.slot_r0).astype(np.int64)
        assert (r0w == r0w[:, :1]).all()
        r0 = r0w[:, 0]
    else:
        r0 = a.slot_r0_host()
    assert r0.max() < 1024 * (a.window_pages // 8 + 1) and r0.min() >= -127


@pytest.mark.parametrize("name", sorted(CASES))
def test_spmv_matches_golden(name):
    coo = CASES[name]().sum_duplicates()
    a = coo_to_whdia(coo)
    x = np.random.default_rng(0).standard_normal(coo.n_cols).astype(np.float32)
    z = whdia_spmv_pallas(a, jnp.asarray(x), interpret=True)
    ref = coo.spmv(x)
    np.testing.assert_allclose(np.asarray(z), ref, rtol=2e-5, atol=2e-5)


def test_duplicates_last_write_wins():
    i = np.arange(6, dtype=np.int64) % 3
    coo = CooMatrix(i, i, np.asarray([1, 2, 3, 10, 20, 30], np.float32), 3, 3)
    a = coo_to_whdia(coo)
    d = a.to_dense()
    np.testing.assert_array_equal(np.diag(d), [10, 20, 30])


def test_alpha_beta_y():
    coo = laplacian_2d(16, 16, np.float32).sum_duplicates()
    a = coo_to_whdia(coo)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    y = rng.standard_normal(coo.n_rows).astype(np.float32)
    z = whdia_spmv_pallas(a, jnp.asarray(x), alpha=2.0, beta=0.5,
                          y=jnp.asarray(y), interpret=True)
    np.testing.assert_allclose(
        np.asarray(z), 2.0 * coo.spmv(x) + 0.5 * y, rtol=2e-5, atol=2e-5
    )


def test_empty_matrix():
    coo = CooMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float32), 200, 200)
    a = coo_to_whdia(coo)
    z = whdia_spmv_pallas(a, jnp.ones(200, jnp.float32), interpret=True)
    np.testing.assert_array_equal(np.asarray(z), np.zeros(200, np.float32))


def test_row_blocked_whdia(monkeypatch):
    """Banded matrices beyond the x-VMEM / SMEM budgets must row-block
    (BlockedWhdia) instead of raising; the reference bar is diaPerf's
    memory-fit fallback (``diaPerf.cpp:174-183``) + the ELL chunk loop
    (no size cliff).  Forced here with tiny budgets."""
    import spgpu_tpu.convert.whdia as W
    from spgpu_tpu.convert import coo_to_whdia
    from spgpu_tpu.formats.whdia import BlockedWhdia
    from spgpu_tpu.ops.pallas_kernels import whdia_spmv_pallas

    coo = random_banded(4000, bands=9, wander=5, seed=4,
                        dtype=np.float32).sum_duplicates()
    monkeypatch.setattr(W, "_ROWBLOCK_X_BUDGET", 1024 * 4 * 2)  # 2k cols
    a = coo_to_whdia(coo)
    assert isinstance(a, BlockedWhdia)
    assert len(a.blocks) >= 2
    assert sum(b.n_rows for b in a.blocks) == coo.n_rows
    x = np.random.default_rng(5).standard_normal(coo.n_cols).astype(
        np.float32)
    z = np.asarray(whdia_spmv_pallas(a, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(z, coo.spmv(x), rtol=3e-5, atol=3e-5)


def test_row_blocked_whdia_dd(monkeypatch):
    """Double-float row blocks (hi/lo slabs stay paired per block)."""
    import spgpu_tpu.convert.whdia as W
    from spgpu_tpu.convert import coo_to_whdia
    from spgpu_tpu.formats.whdia import BlockedWhdia
    from spgpu_tpu.ops import dd as ddm
    from spgpu_tpu.ops.pallas_kernels import whdia_spmv_dd_pallas

    coo = random_banded(2000, bands=5, wander=3, seed=6,
                        dtype=np.float64).sum_duplicates()
    monkeypatch.setattr(W, "_ROWBLOCK_X_BUDGET", 1024 * 8)  # 1k dd cols
    a = coo_to_whdia(coo)
    assert isinstance(a, BlockedWhdia) and a.is_dd
    x = np.random.default_rng(5).standard_normal(coo.n_cols)
    z = whdia_spmv_dd_pallas(
        a, jnp.asarray(np.stack(ddm.split(x)), jnp.float32),
        interpret=True)
    np.testing.assert_allclose(ddm.join(np.asarray(z)), coo.spmv(x),
                               rtol=1e-12, atol=1e-12)


def test_complex_fused_one_pass(rng):
    """r5: the fused one-pass complex kernel (one decode, shared xr/xi
    gathers, 4 fmas — ``hell_cspmv.cu:29`` ``cuCfma`` parity) matches
    both the plane-product path and the host golden, in pattern AND
    slab r0 modes, with complex alpha/beta."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded

    for base in (random_banded(2000, bands=9, wander=5, seed=3,
                               dtype=np.float64).sum_duplicates(),
                 laplacian_2d(40, 40, np.float64)):
        cm = CooMatrix(base.rows, base.cols,
                       (base.values + 1j * rng.standard_normal(base.nnz))
                       .astype(np.complex64), base.n_rows, base.n_cols)
        a = convert.coo_to_whdia(cm)
        xc = (rng.standard_normal(cm.n_cols)
              + 1j * rng.standard_normal(cm.n_cols)).astype(np.complex64)
        x = jnp.asarray(np.stack([xc.real, xc.imag]).astype(np.float32))
        yc = (rng.standard_normal(cm.n_rows)
              + 1j * rng.standard_normal(cm.n_rows)).astype(np.complex64)
        y = jnp.asarray(np.stack([yc.real, yc.imag]).astype(np.float32))
        al, be = 2 - 1j, 0.5 + 2j
        zf = np.asarray(ops.whdia_spmv(a, x, al, be, y))
        zp = np.asarray(ops.whdia_spmv(a, x, al, be, y, fused=False))
        g = al * cm.spmv(xc.astype(np.complex128)) + be * yc
        for z, tag in ((zf, "fused"), (zp, "plane")):
            err = np.linalg.norm(z[0] + 1j * z[1] - g) / np.linalg.norm(g)
            assert err < 2e-5, (tag, err)
        np.testing.assert_allclose(zf, zp, rtol=2e-5, atol=2e-5)


def test_z_fused_one_pass(rng):
    """r5: the fused one-pass Z (complex128 = dd-complex) kernel — four
    dd slabs + shared r0 decode + 4 error-free products per tile
    (``hdia_zspmv.cu`` parity) — matches the dd plane-product path and
    the host golden at D precision, incl. complex alpha/beta."""
    base = random_banded(2500, bands=9, wander=5, seed=2,
                         dtype=np.float64).sum_duplicates()
    cm = CooMatrix(base.rows, base.cols,
                   (base.values + 1j * rng.standard_normal(base.nnz))
                   .astype(np.complex128), base.n_rows, base.n_cols)
    a = convert.coo_to_whdia(cm)
    assert a.is_dd
    xc = rng.standard_normal(cm.n_cols) + 1j * rng.standard_normal(
        cm.n_cols)
    x = jnp.asarray(a.embed_complex(xc))
    yc = jnp.asarray(a.embed_complex(
        rng.standard_normal(cm.n_rows)
        + 1j * rng.standard_normal(cm.n_rows)))
    al, be = 2 - 1j, 0.5 + 2j
    zf = np.asarray(ops.whdia_spmv(a, x, al, be, yc))
    zp = np.asarray(ops.whdia_spmv(a, x, al, be, yc, fused=False))
    np.testing.assert_allclose(zf[:, 0], zp[:, 0], rtol=1e-6, atol=1e-6)
    z0 = np.asarray(ops.whdia_spmv(a, x))
    g = cm.spmv(xc)
    got = (z0[0, 0].astype(np.float64) + z0[0, 1]) \
        + 1j * (z0[1, 0].astype(np.float64) + z0[1, 1])
    err = np.linalg.norm(got - g) / np.linalg.norm(g)
    assert err < 1e-13, err
