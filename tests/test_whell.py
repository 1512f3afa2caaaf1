"""WHELL format + Pallas kernel tests (interpret mode on CPU).

The compiled kernel is exercised on the real chip by the verify drive
and bench harness; interpret mode checks the same kernel logic
element-exactly against the host COO golden (SURVEY §4 pattern 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spgpu_tpu.convert.whell import (
    coo_to_whell,
    degree_sort_perm,
    symmetric_relabel,
)
from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.ops.pallas_kernels import whell_spmv_pallas
from spgpu_tpu.utils.fixtures import (
    ctest_fixture,
    laplacian_2d,
    random_banded,
    random_fem_like,
    random_irregular,
)


CASES = {
    "ctest": lambda: ctest_fixture(np.float32),
    "laplace": lambda: laplacian_2d(23, 31, np.float32),
    "laplace_wide": lambda: laplacian_2d(200, 30, np.float32),
    "irregular": lambda: random_irregular(1000, 1000, 9.0, seed=3, dtype=np.float32),
    "banded": lambda: random_banded(900, bands=7, wander=13, seed=4, dtype=np.float32),
    "fem": lambda: random_fem_like(4000, 16.0, span=256, far_frac=0.02, seed=5, dtype=np.float32),
    "rect": lambda: random_irregular(700, 1200, 6.0, seed=8, dtype=np.float32),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_layout_roundtrip(name):
    coo = CASES[name]()
    a = coo_to_whell(coo)
    np.testing.assert_array_equal(a.to_dense(), coo.to_dense())
    from spgpu_tpu.core import CHUNK_TILES

    assert a.total_slots % (CHUNK_TILES * 8) == 0  # whole chunks
    # chunks never straddle 8-hack output groups
    cg = np.asarray(a.chunk_group)
    assert (np.diff(cg) >= 0).all()
    # page-table deltas stay inside the 8-page window; residues 7-bit
    assert np.asarray(a.residue).min() >= 0
    assert int(np.asarray(a.page_tab).max()) < 8


@pytest.mark.parametrize("name", sorted(CASES))
def test_spmv_matches_golden(name):
    coo = CASES[name]()
    a = coo_to_whell(coo)
    x = np.random.default_rng(0).standard_normal(coo.n_cols).astype(np.float32)
    z = whell_spmv_pallas(a, jnp.asarray(x), interpret=True)
    ref = coo.spmv(x)
    np.testing.assert_allclose(np.asarray(z), ref, rtol=2e-5, atol=2e-5)


def test_alpha_beta_y():
    coo = laplacian_2d(16, 16, np.float32)
    a = coo_to_whell(coo)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    y = rng.standard_normal(coo.n_rows).astype(np.float32)
    z = whell_spmv_pallas(a, jnp.asarray(x), alpha=2.5, beta=-0.5,
                          y=jnp.asarray(y), interpret=True)
    ref = 2.5 * coo.spmv(x) - 0.5 * y
    np.testing.assert_allclose(np.asarray(z), ref, rtol=2e-5, atol=2e-5)


def test_sorted_rows_oell_output_perm():
    coo = random_irregular(500, 500, 7.0, seed=11, dtype=np.float32)
    a = coo_to_whell(coo, sort_rows=True)
    assert a.row_perm is not None
    x = np.random.default_rng(2).standard_normal(500).astype(np.float32)
    z = whell_spmv_pallas(a, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(z), coo.spmv(x), rtol=2e-5, atol=2e-5)


def test_symmetric_relabel_preserves_solution_space():
    coo = laplacian_2d(20, 20, np.float32)
    perm = degree_sort_perm(coo)
    rel = symmetric_relabel(coo, perm)
    x = np.random.default_rng(3).standard_normal(coo.n_rows).astype(np.float32)
    # (P A P^T)(P x) = P (A x)
    lhs = rel.spmv(x[perm])
    rhs = coo.spmv(x)[perm]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6, atol=1e-6)


def test_duplicates_accumulate():
    # ctest fixture: every diagonal hit twice -> SpMV sees 2.0
    coo = ctest_fixture(np.float32)
    a = coo_to_whell(coo)
    x = np.ones(100, np.float32)
    z = whell_spmv_pallas(a, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.full(100, 2.0), rtol=1e-6)


def test_empty_matrix():
    coo = CooMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float32), 300, 300)
    a = coo_to_whell(coo)
    z = whell_spmv_pallas(a, jnp.ones(300, jnp.float32), interpret=True)
    np.testing.assert_array_equal(np.asarray(z), np.zeros(300, np.float32))


def test_spmm_multi_rhs():
    coo = random_fem_like(3000, 12.0, span=200, far_frac=0.02, seed=9,
                          dtype=np.float32)
    a = coo_to_whell(coo)
    X = np.random.default_rng(4).standard_normal((8, coo.n_cols)).astype(np.float32)
    from spgpu_tpu.ops.pallas_kernels import whell_spmm_pallas

    Z = whell_spmm_pallas(a, jnp.asarray(X), interpret=True)
    np.testing.assert_allclose(np.asarray(Z), coo.spmv(X), rtol=3e-5, atol=3e-5)
    # alpha/beta/Y combine
    Y = np.random.default_rng(5).standard_normal((8, coo.n_rows)).astype(np.float32)
    Z2 = whell_spmm_pallas(a, jnp.asarray(X), alpha=1.5, beta=-2.0,
                           y=jnp.asarray(Y), interpret=True)
    np.testing.assert_allclose(np.asarray(Z2), 1.5 * coo.spmv(X) - 2.0 * Y,
                               rtol=3e-5, atol=3e-5)


def test_bf16_value_slabs():
    """bf16 value slabs with fp32 x/accumulation (mixed precision; the
    TPU-native low-precision story the reference never had)."""
    coo = random_fem_like(3000, 12.0, span=200, far_frac=0.02, seed=9,
                          dtype=np.float32)
    a = coo_to_whell(coo, dtype=jnp.bfloat16)
    x = np.random.default_rng(6).standard_normal(coo.n_cols).astype(np.float32)
    z = whell_spmv_pallas(a, jnp.asarray(x), interpret=True)
    ref = coo.spmv(x)
    rel = np.abs(np.asarray(z) - ref).max() / np.abs(ref).max()
    assert rel < 0.03  # bf16 has ~8 mantissa bits
    assert np.asarray(z).dtype == np.float32


@pytest.mark.parametrize("w", [8, 16, 32])
def test_packed_lane_layout(w):
    """Packed-lane WHELL (proportional lane segments + in-kernel
    segment-scan flush): golden SpMV match in lane space across window
    sizes, and dense reconstruction equals the original matrix."""
    coo = random_fem_like(3000, 12.0, span=200, far_frac=0.02, seed=9,
                          dtype=np.float32)
    a = coo_to_whell(coo, packed=True, window_pages=w)
    x = np.random.default_rng(1).standard_normal(coo.n_cols).astype(np.float32)
    xl = a.embed(jnp.asarray(x))
    z = whell_spmv_pallas(a, xl, interpret=True)
    zo = np.asarray(a.extract(z))
    ref = coo.spmv(x)
    np.testing.assert_allclose(zo, ref, rtol=3e-5, atol=3e-5)
    lor = np.asarray(a.lane_of_row)
    np.testing.assert_allclose(
        a.to_dense()[np.ix_(lor, lor)], coo.sum_duplicates().to_dense(),
        rtol=1e-6, atol=1e-7)


def test_packed_beats_classic_padding():
    """The anti-raggedness design goal: packed padding must be well below
    classic on a power-law degree profile."""
    coo = random_fem_like(20000, 27.0, span=768, far_frac=0.01, seed=0,
                          dtype=np.float32)
    coo = symmetric_relabel(coo, __import__(
        "spgpu_tpu.convert.whell", fromlist=["local_degree_perm"]
    ).local_degree_perm(coo))
    classic = coo_to_whell(coo)
    packed = coo_to_whell(coo, packed=True)
    assert packed.values.size < 0.7 * classic.values.size


def test_packed_alpha_beta_duplicates_empty():
    coo = ctest_fixture(np.float32)  # duplicate diagonal entries add
    a = coo_to_whell(coo, packed=True)
    x = np.ones(100, np.float32)
    xl = a.embed(jnp.asarray(x))
    z = a.extract(whell_spmv_pallas(a, xl, interpret=True))
    np.testing.assert_allclose(np.asarray(z), np.full(100, 2.0), rtol=1e-6)
    # alpha/beta path (y in lane space)
    y = jnp.ones(a.n_rows, jnp.float32)
    z2 = whell_spmv_pallas(a, xl, alpha=2.0, beta=-1.0, y=y, interpret=True)
    ref = 2.0 * np.asarray(whell_spmv_pallas(a, xl, interpret=True)) - 1.0
    np.testing.assert_allclose(np.asarray(z2), ref, rtol=1e-6)
    # empty matrix
    e = CooMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                  np.zeros(0, np.float32), 300, 300)
    ae = coo_to_whell(e, packed=True)
    ze = whell_spmv_pallas(ae, jnp.ones(ae.n_rows, jnp.float32), interpret=True)
    np.testing.assert_array_equal(np.asarray(ze), np.zeros(ae.n_rows, np.float32))


def test_packed_column_panels():
    """x beyond the VMEM budget splits into window-aligned column panels
    whose products sum exactly (removes the r1 size cliff; reference
    bar: the ELL chunk loop ell_spmv_base.cuh:118-136)."""
    from spgpu_tpu.formats.whell import PanelledWhell

    coo = random_fem_like(4000, 10.0, span=300, far_frac=0.03, seed=4,
                          dtype=np.float32)
    a = coo_to_whell(coo, packed=True, panel_x_bytes=32 * 128 * 4)
    assert isinstance(a, PanelledWhell) and len(a.panels) >= 2
    x = np.random.default_rng(0).standard_normal(coo.n_cols).astype(np.float32)
    xl = a.embed(jnp.asarray(x))
    z = np.asarray(a.extract(whell_spmv_pallas(a, xl, interpret=True)))
    ref = coo.spmv(x)
    np.testing.assert_allclose(z, ref, rtol=3e-5, atol=3e-5)
    # identical to the unpanelled product
    b = coo_to_whell(coo, packed=True)
    zb = np.asarray(b.extract(whell_spmv_pallas(b, b.embed(jnp.asarray(x)),
                                                interpret=True)))
    # panel partial sums reassociate fp32 addition; equality is modulo
    # rounding of the split accumulation
    np.testing.assert_allclose(z, zb, rtol=1e-5, atol=1e-5)


def test_spmm_fused_packed():
    """Fused multi-RHS SpMM on the packed layout: one slab decode per
    tile serves every RHS (whell_spmm(fused=True) routes here)."""
    from spgpu_tpu.ops import whell_spmm

    coo = random_fem_like(3000, 12.0, span=200, far_frac=0.02, seed=9,
                          dtype=np.float32)
    a = coo_to_whell(coo, packed=True)
    X = np.random.default_rng(4).standard_normal((4, coo.n_cols)).astype(np.float32)
    Xl = np.zeros((4, a.n_rows), np.float32)
    Xl[:, np.asarray(a.lane_of_row)] = X
    Z = np.asarray(whell_spmm(a, jnp.asarray(Xl), fused=True, interpret=True))
    np.testing.assert_allclose(Z[:, np.asarray(a.lane_of_row)], coo.spmv(X),
                               rtol=3e-5, atol=3e-5)


def test_spmm_fused_bf16_values_fp32_x():
    """Fused SpMM with bf16 value slabs and fp32 X must stage X and
    accumulate in fp32 (regression: scratch/out used values.dtype)."""
    from spgpu_tpu.ops.pallas_kernels import whell_spmm_pallas

    coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=12,
                          dtype=np.float32)
    a = coo_to_whell(coo, dtype=jnp.bfloat16)
    X = np.random.default_rng(8).standard_normal((4, coo.n_cols)).astype(np.float32)
    Z = whell_spmm_pallas(a, jnp.asarray(X), interpret=True)
    assert np.asarray(Z).dtype == np.float32
    ref = coo.spmv(X)
    rel = np.abs(np.asarray(Z) - ref).max() / np.abs(ref).max()
    assert rel < 0.03


def test_spmm_fused_way_split():
    """Fused SpMM on a ways>1 matrix must reduce way groups (regression:
    it returned unreduced virtual rows)."""
    from spgpu_tpu.ops.pallas_kernels import whell_spmm_pallas

    coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=13,
                          dtype=np.float32)
    a = coo_to_whell(coo, ways=2)
    X = np.random.default_rng(9).standard_normal((3, coo.n_cols)).astype(np.float32)
    Z = whell_spmm_pallas(a, jnp.asarray(X), interpret=True)
    assert Z.shape == (3, coo.n_rows)
    np.testing.assert_allclose(np.asarray(Z), coo.spmv(X), rtol=3e-5, atol=3e-5)


def test_update_values_same_pattern():
    """Pattern-reuse value refresh (the ellcsput analogue for
    time-dependent problems)."""
    from spgpu_tpu.convert.whell import whell_update_values
    from spgpu_tpu.formats.coo import CooMatrix

    coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=11,
                          dtype=np.float32)
    a, plan = coo_to_whell(coo, return_plan=True)
    rng = np.random.default_rng(3)
    newv = rng.standard_normal(coo.nnz).astype(np.float32)
    a2 = whell_update_values(a, plan, newv)
    coo2 = CooMatrix(coo.rows, coo.cols, newv, coo.n_rows, coo.n_cols)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    z = whell_spmv_pallas(a2, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(z), coo2.spmv(x), rtol=2e-5,
                               atol=2e-5)
    # layout metadata untouched
    np.testing.assert_array_equal(np.asarray(a.residue), np.asarray(a2.residue))


def test_update_values_packed_plan():
    """Pattern-reuse refresh on the packed layout (single panel fp32 and
    multi-panel dd) — the ellcsput analogue for time-dependent PDEs."""
    from spgpu_tpu.convert.whell import whell_update_values
    from spgpu_tpu.formats.whell import PanelledWhell
    from spgpu_tpu.ops import dd
    from spgpu_tpu.ops.pallas_kernels import whell_spmv_dd_pallas

    rng = np.random.default_rng(3)
    coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=11,
                          dtype=np.float32)
    a, plan = coo_to_whell(coo, packed=True, return_plan=True)
    newv = rng.standard_normal(coo.nnz).astype(np.float32)
    a2 = whell_update_values(a, plan, newv)
    coo2 = CooMatrix(coo.rows, coo.cols, newv, coo.n_rows, coo.n_cols)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    xl = np.asarray(a2.embed(jnp.asarray(x)))
    z = np.asarray(a2.extract(whell_spmv_pallas(a2, jnp.asarray(xl),
                                                interpret=True)))
    np.testing.assert_allclose(z, coo2.spmv(x), rtol=3e-5, atol=3e-5)

    coo64 = random_fem_like(4000, 10.0, span=300, far_frac=0.02, seed=11,
                            dtype=np.float64)
    a3, plan3 = coo_to_whell(coo64, packed=True, return_plan=True,
                             panel_x_bytes=32 * 128 * 8)
    assert isinstance(a3, PanelledWhell) and a3.is_dd
    newv64 = rng.standard_normal(coo64.nnz)
    a4 = whell_update_values(a3, plan3, newv64)
    coo3 = CooMatrix(coo64.rows, coo64.cols, newv64, 4000, 4000)
    x4 = rng.standard_normal(4000)
    xl2 = np.zeros(a4.n_rows)
    xl2[np.asarray(a4.lane_of_row)] = x4
    z2 = dd.join(np.asarray(whell_spmv_dd_pallas(
        a4, jnp.asarray(dd.split(xl2)), interpret=True)))
    ref = coo3.spmv(x4)
    assert np.abs(z2[np.asarray(a4.lane_of_row)] - ref).max() / \
        np.abs(ref).max() < 1e-12


def test_way_split_rows():
    """ways>1 splits rows into virtual rows and reduces way groups back;
    measured on v5e: padding got WORSE on the fem profile (group-count
    fragmentation beats max-smoothing at ~0.9 entries/row/page) — kept
    as an option for dense-row profiles, documented in DESIGN.md."""
    coo = random_fem_like(3000, 12.0, span=200, far_frac=0.02, seed=9,
                          dtype=np.float32)
    x = np.random.default_rng(7).standard_normal(coo.n_cols).astype(np.float32)
    ref = coo.spmv(x)
    for w in (2, 4):
        a = coo_to_whell(coo, ways=w)
        z = whell_spmv_pallas(a, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(z), ref, rtol=3e-5, atol=3e-5)


def test_slab_guard_and_padding_warning(monkeypatch):
    """Structure-less matrices defeat windowed layouts (measured ~32x
    padding on uniformly-random COO): the builder must warn on high
    padding and refuse runaway slabs with actionable guidance rather
    than allocate tens of GB (contrast diaPerf's memory-fit fallback,
    ``diaPerf.cpp:174-183``)."""
    import warnings
    import spgpu_tpu.convert.whell as W

    coo = random_irregular(100_000, 100_000, avg_nnz_per_row=16.0, seed=3,
                           dtype=np.float32)
    with warnings.catch_warnings(record=True) as wl:
        warnings.simplefilter("always")
        a = coo_to_whell(coo, packed=True)
    assert a.values.size / coo.nnz > 8.0  # precondition: bad layout fit
    assert any("padding" in str(w.message) for w in wl)

    monkeypatch.setattr(W, "_SLAB_GUARD_BYTES", 1_000_000)
    with pytest.raises(ValueError, match="column locality"):
        coo_to_whell(coo, packed=True)


def test_malloc_tuning_active():
    """Package import applies the host allocator tuning (hostmem.py);
    conversions rely on it for steady-state speed on microVM hosts."""
    from spgpu_tpu.utils.hostmem import prefault, tune_malloc

    assert tune_malloc()  # idempotent; True on linux/glibc
    prefault(1 << 20)  # smoke: touch 1 MiB through the tuned heap


def test_row_segmentation_smem_budget(monkeypatch):
    """Matrices whose per-tile scalar operands exceed the 1 MiB SMEM
    prefetch budget must row-segment (SegmentedWhell) instead of failing
    TPU compilation (measured "Used 1.17M of 1.00M smem" at the 4M-row
    class).  Reference bar: the ELL grid chunk loop has no size cliff
    (``ell_spmv_base.cuh:118-136``).  Forced here with a tiny budget."""
    import spgpu_tpu.convert.whell as W
    from spgpu_tpu.formats.whell import SegmentedWhell

    coo = random_fem_like(12_000, 9.0, span=300, far_frac=0.02, seed=11,
                          dtype=np.float32).sum_duplicates()
    ref_mat = coo_to_whell(coo, packed=True)
    monkeypatch.setattr(W, "_SMEM_SCALAR_BUDGET_WORDS", 120)
    a = coo_to_whell(coo, packed=True)
    assert isinstance(a, SegmentedWhell)
    assert len(a.segments) >= 2
    assert a.n_rows == ref_mat.n_rows
    assert sum(s.nnz for s in a.segments) == coo.nnz

    x = np.random.default_rng(7).standard_normal(coo.n_cols).astype(
        np.float32)
    gold = coo.spmv(x)
    z = np.asarray(a.extract(whell_spmv_pallas(a, a.embed(jnp.asarray(x)),
                                               interpret=True)))
    np.testing.assert_allclose(z, gold, rtol=3e-5, atol=3e-5)
    # segmented to_dense stitches the same lane-space matrix
    np.testing.assert_allclose(a.to_dense(), ref_mat.to_dense(),
                               rtol=1e-6, atol=1e-6)


def test_row_segmentation_dd(monkeypatch):
    """Double-float slabs segment too (hi/lo slices stay paired)."""
    import spgpu_tpu.convert.whell as W
    from spgpu_tpu.formats.whell import SegmentedWhell
    from spgpu_tpu.ops import dd as ddm
    from spgpu_tpu.ops.pallas_kernels import whell_spmv_dd_pallas

    coo = laplacian_2d(70, 70, np.float64)
    monkeypatch.setattr(W, "_SMEM_SCALAR_BUDGET_WORDS", 40)
    a = coo_to_whell(coo, packed=True)
    assert isinstance(a, SegmentedWhell) and a.is_dd
    assert len(a.segments) >= 2
    x = np.random.default_rng(3).standard_normal(coo.n_cols)
    xl = np.zeros(a.n_rows)
    xl[np.asarray(a.lane_of_row)] = x
    z = whell_spmv_dd_pallas(
        a, jnp.asarray(np.stack(ddm.split(xl)), jnp.float32),
        interpret=True)
    got = ddm.join(np.asarray(z))[np.asarray(a.lane_of_row)]
    np.testing.assert_allclose(got, coo.spmv(x), rtol=1e-12, atol=1e-12)


def test_pcell_layout_and_spmv():
    """Per-cell row-routing layout (convert/pcell.py): dense golden +
    SpMV vs host COO golden, including alpha/beta epilogue."""
    import jax.numpy as jnp

    from spgpu_tpu.convert import coo_to_whell_percell
    from spgpu_tpu.ops import whell_spmv
    from spgpu_tpu.utils.fixtures import random_fem_like

    coo = random_fem_like(2000, 10.0, span=150, far_frac=0.02, seed=5,
                          dtype=np.float32)
    a = coo_to_whell_percell(coo, group_hacks=32, chunk_tiles=16)
    assert np.abs(a.to_dense() - coo.to_dense()).max() == 0.0
    rng = np.random.default_rng(1)
    x = rng.standard_normal(coo.n_cols).astype(np.float32)
    y = rng.standard_normal(coo.n_rows).astype(np.float32)
    z = whell_spmv(a, jnp.asarray(x), interpret=True)
    ref = coo.spmv(x)
    assert np.abs(np.asarray(z) - ref).max() / np.abs(ref).max() < 1e-5
    z2 = whell_spmv(a, jnp.asarray(x), alpha=2.0, beta=-0.5,
                    y=jnp.asarray(y), interpret=True)
    ref2 = 2.0 * ref - 0.5 * y
    assert np.abs(np.asarray(z2) - ref2).max() / np.abs(ref2).max() < 1e-5


def test_pcell_duplicates_and_empty():
    """pcell: duplicates add (cooToEll semantics); empty matrix works."""
    import jax.numpy as jnp

    from spgpu_tpu.convert import coo_to_whell_percell
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.ops import whell_spmv

    rows = np.array([0, 0, 1, 300])
    cols = np.array([5, 5, 2, 300])
    vals = np.array([1.5, 2.5, -1.0, 3.0], np.float32)
    coo = CooMatrix(rows, cols, vals, 400, 400)
    a = coo_to_whell_percell(coo, group_hacks=32, chunk_tiles=16)
    x = np.ones(400, np.float32)
    z = np.asarray(whell_spmv(a, jnp.asarray(x), interpret=True))
    assert abs(z[0] - 4.0) < 1e-6  # duplicates added
    assert abs(z[1] + 1.0) < 1e-6
    assert abs(z[300] - 3.0) < 1e-6

    empty = CooMatrix(np.zeros(0, np.int64), np.zeros(0, np.int64),
                      np.zeros(0, np.float32), 256, 256)
    ae = coo_to_whell_percell(empty, group_hacks=32, chunk_tiles=16)
    ze = np.asarray(whell_spmv(ae, jnp.asarray(x[:256]), interpret=True))
    assert not ze.any()


def test_complex_fused_one_pass_whell(rng):
    """r5: the fused one-pass complex packed-WHELL kernel (one decode,
    shared xr/xi gathers, 4 fmas — ``hell_cspmv.cu:29`` parity) matches
    the plane-product path and the host golden, with complex
    alpha/beta, on scattered-window and banded layouts."""
    import jax.numpy as jnp

    from spgpu_tpu import ops
    from spgpu_tpu.convert import coo_to_whell
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import random_banded, random_fem_like

    for base in (random_fem_like(2500, 12.0, span=300, far_frac=0.02,
                                 seed=1, dtype=np.float64),
                 random_banded(2500, bands=9, wander=5, seed=2,
                               dtype=np.float64).sum_duplicates()):
        cm = CooMatrix(base.rows, base.cols,
                       (base.values + 1j * rng.standard_normal(base.nnz))
                       .astype(np.complex64), base.n_rows, base.n_cols)
        a = coo_to_whell(cm, packed=True)
        xc = (rng.standard_normal(cm.n_cols)
              + 1j * rng.standard_normal(cm.n_cols)).astype(np.complex64)
        x = jnp.asarray(a.embed_complex(xc))
        yc = np.stack([rng.standard_normal(a.n_rows),
                       rng.standard_normal(a.n_rows)]).astype(np.float32)
        al, be = 2 - 1j, 0.5 + 2j
        zf = np.asarray(ops.whell_spmv(a, x, al, be, jnp.asarray(yc)))
        zp = np.asarray(ops.whell_spmv(a, x, al, be, jnp.asarray(yc),
                                       fused=False))
        np.testing.assert_allclose(zf, zp, rtol=2e-4, atol=2e-4)
        lor = np.asarray(a.lane_of_row)
        zf0 = np.asarray(ops.whell_spmv(a, x))
        g = cm.spmv(xc.astype(np.complex128))
        err = np.linalg.norm((zf0[0] + 1j * zf0[1])[lor] - g) \
            / np.linalg.norm(g)
        assert err < 2e-5, err
