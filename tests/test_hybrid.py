"""Hybrid banded+irregular (HYB-class) layout: split, SpMV golden,
alpha/beta contract, dd precision, auto-selection, solve routing, and
the not-part-banded refusal (``cusparsePerf.cpp:668-680`` HYB parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spgpu_tpu.convert import (
    coo_to_hybrid, estimate_formats, hybrid_split_stats, suggest_format)
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.hybrid import lane_runs, run_embed, run_extract
from spgpu_tpu.ops import hybrid_spmv, spmv
from spgpu_tpu.utils.fixtures import random_fem_like, random_mixed

N = 1 << 12


@pytest.fixture(scope="module")
def mix():
    return random_mixed(N, bands=9, wander=3, extra_avg=4.0, span=500,
                        far_frac=0.02, seed=1, dtype=np.float32)


@pytest.fixture(scope="module")
def hyb(mix):
    return coo_to_hybrid(mix)


def test_split_partitions_nnz(mix, hyb):
    assert hyb.nnz == mix.nnz
    assert 0 < hyb.band_nnz < mix.nnz
    assert hyb.band_nnz + hyb.rest_nnz == mix.nnz
    assert hyb.band_nnz / mix.nnz > 0.5  # the banded core dominates
    # every band entry really sits on a dense (hack, diagonal) slot
    _, occ = hybrid_split_stats(mix)
    assert (occ >= hyb.tau_lanes).sum() == hyb.band_nnz


def test_spmv_golden(mix, hyb, rng):
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    z = np.asarray(hybrid_spmv(hyb, x))
    g = mix.spmv(np.asarray(x, np.float64))
    assert np.linalg.norm(z - g) / np.linalg.norm(g) < 1e-5


def test_alpha_beta_and_dispatch(mix, hyb, rng):
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    y = jnp.asarray(rng.standard_normal(N), jnp.float32)
    z = np.asarray(spmv(hyb, x, alpha=2.0, beta=-0.5, y=y))
    g = 2.0 * mix.spmv(np.asarray(x, np.float64)) - 0.5 * np.asarray(
        y, np.float64)
    assert np.linalg.norm(z - g) / np.linalg.norm(g) < 1e-5


def test_dd_precision(mix, rng):
    from spgpu_tpu.ops import dd as _dd

    food = CooMatrix(mix.rows, mix.cols, mix.values.astype(np.float64),
                     N, N)
    h = coo_to_hybrid(food)
    assert h.is_dd
    xv = rng.standard_normal(N)
    x = jnp.asarray(np.stack(_dd.split(xv)), jnp.float32)
    z = np.asarray(hybrid_spmv(h, x))
    g = food.spmv(xv)
    err = np.linalg.norm(z[0].astype(np.float64) + z[1] - g) \
        / np.linalg.norm(g)
    assert err < 1e-13


def test_lane_runs_roundtrip(hyb, rng):
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    xe = hyb.embed_rest(x)
    assert xe.shape[-1] == hyb.rest.n_rows
    back = np.asarray(hyb.extract_rest(xe))
    np.testing.assert_array_equal(back, np.asarray(x))
    # runs reproduce lane_of_row exactly
    lor = np.asarray(hyb.rest.lane_of_row)
    rebuilt = np.concatenate([np.arange(d, d + ln)
                              for d, ln in hyb.runs])
    np.testing.assert_array_equal(rebuilt, lor)


def test_refuses_unbanded():
    fem = random_fem_like(N, 27.0, span=700, far_frac=0.01, seed=0,
                          dtype=np.float32)
    with pytest.raises(ValueError, match="not part-banded"):
        coo_to_hybrid(fem)
    # ... and the estimator never proposes hybrid for it
    assert "hybrid" not in estimate_formats(fem)


def test_select_estimates_but_never_suggests_hybrid(mix):
    # the traffic estimate exists for tooling, but the hybrid is
    # chip-refuted as a selection target (DESIGN §2i): the crossing +
    # second kernel make it 0.68x pure WHELL despite 0.7x the bytes
    est = estimate_formats(mix)
    assert "hybrid" in est
    assert suggest_format(mix) != "hybrid"
    from spgpu_tpu.utils.fixtures import random_banded

    band = random_banded(N, bands=9, wander=3, seed=0, dtype=np.float32)
    assert suggest_format(band.sum_duplicates()) != "hybrid"


def test_solve_routes_hybrid(mix):
    from spgpu_tpu import solvers

    rng = np.random.default_rng(5)
    # the overlay breaks the band core's diagonal dominance; shift the
    # diagonal so BiCGSTAB (the matrix is unsymmetric) converges
    idx = np.arange(N, dtype=np.int64)
    shifted = CooMatrix(
        np.concatenate([mix.rows, idx]),
        np.concatenate([mix.cols, idx]),
        np.concatenate([mix.values,
                        np.full(N, 25.0, np.float32)]).astype(np.float32),
        N, N).sum_duplicates()
    b = rng.standard_normal(N).astype(np.float32)
    res = solvers.solve(shifted, b, symmetric=False, tol=1e-5,
                        maxiter=500, fmt="hybrid")
    x = np.asarray(res.x, np.float64)
    resid = np.linalg.norm(b - shifted.spmv(x)) / np.linalg.norm(b)
    assert resid < 1e-4
