"""Fused multi-RHS SpMM for the values-only DIA classes (VERDICT r3
missing #2): golden equality vs host COO, fused/loop agreement,
alpha/beta epilogues, multi-pass splitting, and the dd/complex walls."""

import jax.numpy as jnp
import numpy as np
import pytest

from spgpu_tpu import ops
from spgpu_tpu.convert import coo_to_sdia, coo_to_whdia
from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded


def _golden(coo, x):
    return np.stack([coo.spmv(x[r]) for r in range(x.shape[0])])


def test_sdia_spmm_fused_golden():
    lap = laplacian_2d(40, 40, np.float32)
    a = coo_to_sdia(lap)
    x = np.random.default_rng(1).standard_normal(
        (5, lap.n_cols)).astype(np.float32)
    g = _golden(lap, x)
    # default (loop, the measured-faster path) and the opt-in fused
    # kernel both match the host golden
    z = np.asarray(ops.sdia_spmm(a, jnp.asarray(x)))
    np.testing.assert_allclose(z, g, rtol=2e-5, atol=2e-5)
    z_fused = np.asarray(ops.sdia_spmm(a, jnp.asarray(x), fused=True))
    np.testing.assert_allclose(z_fused, g, rtol=2e-5, atol=2e-5)


def test_whdia_spmm_fused_golden_and_epilogue():
    band = random_banded(4000, bands=11, wander=7, seed=2,
                         dtype=np.float32).sum_duplicates()
    a = coo_to_whdia(band)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, band.n_cols)).astype(np.float32)
    g = _golden(band, x)
    z = np.asarray(ops.whdia_spmm(a, jnp.asarray(x), fused=True))
    np.testing.assert_allclose(z, g, rtol=2e-5,
                               atol=2e-5 * np.abs(g).max())
    zl = np.asarray(ops.whdia_spmm(a, jnp.asarray(x)))
    np.testing.assert_allclose(zl, g, rtol=2e-5,
                               atol=2e-5 * np.abs(g).max())
    y = rng.standard_normal((8, band.n_rows)).astype(np.float32)
    z2 = np.asarray(ops.whdia_spmm(a, jnp.asarray(x), fused=True,
                                   alpha=2.0, beta=0.5, y=jnp.asarray(y)))
    np.testing.assert_allclose(z2, 2 * g + 0.5 * y, rtol=2e-5,
                               atol=2e-5 * np.abs(g).max())


def test_whdia_spmm_multi_pass():
    # force 2 passes via rhs_per_pass to cover the concat path
    from spgpu_tpu.ops.pallas_kernels import whdia_spmm_pallas

    band = random_banded(2000, bands=5, wander=3, seed=4,
                         dtype=np.float32).sum_duplicates()
    a = coo_to_whdia(band)
    x = np.random.default_rng(5).standard_normal(
        (4, band.n_cols)).astype(np.float32)
    z = np.asarray(whdia_spmm_pallas(a, jnp.asarray(x), interpret=True,
                                     rhs_per_pass=2))
    g = _golden(band, x)
    np.testing.assert_allclose(z, g, rtol=2e-5,
                               atol=2e-5 * np.abs(g).max())


def test_sdia_spmm_multi_pass():
    from spgpu_tpu.ops.pallas_kernels import sdia_spmm_pallas

    lap = laplacian_2d(24, 24, np.float32)
    a = coo_to_sdia(lap)
    x = np.random.default_rng(6).standard_normal(
        (3, lap.n_cols)).astype(np.float32)
    z = np.asarray(sdia_spmm_pallas(a, jnp.asarray(x), interpret=True,
                                    rhs_per_pass=1))
    np.testing.assert_allclose(z, _golden(lap, x), rtol=2e-5, atol=2e-5)


def test_dia_spmm_fused_true_rejected_for_dd():
    from spgpu_tpu.ops import dd as _dd

    lap64 = laplacian_2d(16, 16)  # float64 -> dd
    for conv, op in ((coo_to_sdia, ops.sdia_spmm),
                     (coo_to_whdia, ops.whdia_spmm)):
        a = conv(lap64)
        xs = jnp.asarray(np.stack([
            _dd.split(np.random.default_rng(7).standard_normal(
                lap64.n_cols)) for _ in range(2)]))
        with pytest.raises(NotImplementedError, match="fused"):
            op(a, xs, fused=True)
        z = op(a, xs)  # the default loop path still runs
        assert z.shape[0] == 2
