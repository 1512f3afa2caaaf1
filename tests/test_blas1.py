"""BLAS-1 suite vs NumPy golden, incl. complex semantics, gath/scat
negative-index skipping, scat duplicate policy, and fused m-variants.

Tolerance-based comparisons by design — the reference compares against
cuBLAS with exact float equality (testDenseVector.c:51-76), flagged
fragile in SURVEY §4."""

import jax.numpy as jnp
import numpy as np
import pytest

from spgpu_tpu import ops

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _vec(rng, n, dtype):
    v = rng.standard_normal(n)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        v = v + 1j * rng.standard_normal(n)
    return v.astype(dtype)


@pytest.mark.parametrize("dtype", DTYPES)
def test_elementwise_suite(dtype, rng):
    n = 1000
    x, y, z = (_vec(rng, n, dtype) for _ in range(3))
    a, b = dtype(1.3), dtype(-0.7)
    tol = dict(rtol=1e-5) if np.dtype(dtype).itemsize <= 8 else dict(rtol=1e-13)
    np.testing.assert_allclose(np.asarray(ops.scal(a, jnp.asarray(x))), a * x, **tol)
    np.testing.assert_allclose(
        np.asarray(ops.axpby(a, jnp.asarray(x), b, jnp.asarray(y))), a * x + b * y, **tol
    )
    np.testing.assert_allclose(
        np.asarray(ops.axy(a, jnp.asarray(x), jnp.asarray(y))), a * x * y, **tol
    )
    np.testing.assert_allclose(
        np.asarray(ops.axypbz(a, jnp.asarray(x), jnp.asarray(y), b, jnp.asarray(z))),
        a * x * y + b * z,
        **tol,
    )
    np.testing.assert_allclose(np.asarray(ops.abs_(jnp.asarray(x))), np.abs(x), **tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_reductions(dtype, rng):
    n = 3000
    x, y = _vec(rng, n, dtype), _vec(rng, n, dtype)
    tol = dict(rtol=1e-4) if np.dtype(dtype).itemsize <= 8 else dict(rtol=1e-12)
    # dot is NON-conjugated for complex (zdot.cu parity)
    np.testing.assert_allclose(
        np.asarray(ops.dot(jnp.asarray(x), jnp.asarray(y))), np.sum(x * y), **tol
    )
    np.testing.assert_allclose(
        np.asarray(ops.dot(jnp.asarray(x), jnp.asarray(y), conjugate=True)),
        np.vdot(x, y),
        **tol,
    )
    np.testing.assert_allclose(
        np.asarray(ops.nrm2(jnp.asarray(x))), np.linalg.norm(x), **tol
    )
    np.testing.assert_allclose(
        np.asarray(ops.asum(jnp.asarray(x))), np.sum(np.abs(x)), **tol
    )
    np.testing.assert_allclose(
        np.asarray(ops.amax(jnp.asarray(x))), np.max(np.abs(x)), **tol
    )
    # nrm2/asum/amax of complex return real
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        assert not np.iscomplexobj(np.asarray(ops.nrm2(jnp.asarray(x))))


def test_asum_amax_full_contribution(rng):
    """Anti-regression for the reference's discarded-return reduction bug
    (asum_base.cuh:167-187): every element must contribute, including the
    tail lanes of the final block."""
    for n in [1, 31, 32, 33, 320 * 128 + 17]:
        x = np.ones(n, dtype=np.float64)
        assert float(ops.asum(jnp.asarray(x))) == n
        x[n // 2] = -50.0
        assert float(ops.amax(jnp.asarray(x))) == 50.0


def test_setscal():
    y = jnp.zeros(100)
    out = np.asarray(ops.setscal(y, 7.5, first=10, last=20))
    assert (out[10:20] == 7.5).all() and (out[:10] == 0).all() and (out[20:] == 0).all()


def test_gath_skips_negative(rng):
    y = jnp.asarray(rng.standard_normal(50))
    idx = jnp.asarray(np.array([3, -1, 7, 0, -5]))
    prior = jnp.asarray(np.full(5, 99.0))
    out = np.asarray(ops.gath(y, idx, out=prior))
    np.testing.assert_allclose(out, [y[3], 99.0, y[7], y[0], 99.0])


def test_gath_base_index(rng):
    y = jnp.asarray(rng.standard_normal(10))
    out = np.asarray(ops.gath(y, jnp.asarray(np.array([1, 10])), base_index=1))
    np.testing.assert_allclose(out, [y[0], y[9]])


def test_scat_semantics(rng):
    y0 = rng.standard_normal(20)
    idx = np.array([2, 5, -3, 19])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    # beta==0: plain store at touched slots (scat_base.cuh:44-46)
    out = np.asarray(ops.scat(jnp.asarray(y0), jnp.asarray(idx), jnp.asarray(vals), 0.0))
    ref = y0.copy()
    ref[[2, 5, 19]] = [1.0, 2.0, 4.0]
    np.testing.assert_allclose(out, ref)
    # beta!=0: fma at touched slots only (vector.h:299-316)
    out = np.asarray(ops.scat(jnp.asarray(y0), jnp.asarray(idx), jnp.asarray(vals), 0.5))
    ref = y0.copy()
    ref[[2, 5, 19]] = 0.5 * y0[[2, 5, 19]] + np.array([1.0, 2.0, 4.0])
    np.testing.assert_allclose(out, ref)


def test_scat_duplicates():
    y0 = jnp.zeros(4)
    idx = jnp.asarray(np.array([1, 1, 1]))
    vals = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    # store mode: one of the writes wins (reference's documented race)
    out = float(np.asarray(ops.scat(y0, idx, vals, 0.0))[1])
    assert out in (1.0, 2.0, 3.0)
    # add mode (extension): deterministic accumulation
    out = np.asarray(ops.scat(y0, idx, vals, 0.0, mode="add"))
    np.testing.assert_allclose(out, [0.0, 6.0, 0.0, 0.0])
    out = np.asarray(
        ops.scat(jnp.ones(4), idx, vals, 2.0, mode="add")
    )
    np.testing.assert_allclose(out, [1.0, 8.0, 1.0, 1.0])


def test_multivector_variants(rng):
    """m-variants: one fused op over a (count, n) slab (SURVEY §2.5)."""
    X = rng.standard_normal((8, 500))
    Y = rng.standard_normal((8, 500))
    np.testing.assert_allclose(
        np.asarray(ops.mdot(jnp.asarray(X), jnp.asarray(Y))), np.sum(X * Y, axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(ops.mnrm2(jnp.asarray(X))), np.linalg.norm(X, axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(ops.masum(jnp.asarray(X))), np.abs(X).sum(axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(ops.mamax(jnp.asarray(X))), np.abs(X).max(axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(ops.maxpby(2.0, jnp.asarray(X), 3.0, jnp.asarray(Y))), 2 * X + 3 * Y
    )


def test_int_gath_scat_setscal(rng):
    """TYPE_INT parity: the reference instantiates gath/scat/setscal for
    int too (``igath.cu``/``iscat.cu``/``isetscal.cu``, ``gath_base.cuh``
    i-instantiations) — the indexed/fill ops must work on integer data,
    not just the four float/complex types."""
    y = jnp.asarray(np.arange(20, dtype=np.int32) * 3)
    idx = jnp.asarray(np.array([4, -1, 7, 0], dtype=np.int32))
    prior = jnp.asarray(np.full(4, -99, dtype=np.int32))
    out = np.asarray(ops.gath(y, idx, out=prior))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [12, -99, 21, 0])

    y0 = jnp.asarray(np.full(8, 5, dtype=np.int32))
    vals = jnp.asarray(np.array([10, 20], dtype=np.int32))
    out = np.asarray(ops.scat(y0, jnp.asarray(np.array([2, 6])), vals, 0))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [5, 5, 10, 5, 5, 5, 20, 5])

    out = np.asarray(ops.setscal(jnp.asarray(np.zeros(10, np.int32)), 7,
                                 first=3, last=6))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out[3:6], 7)
    assert out[:3].sum() == 0 and out[6:].sum() == 0
