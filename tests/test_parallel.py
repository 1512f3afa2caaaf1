"""Distributed layer tests — 8 virtual CPU devices (conftest forces
``xla_force_host_platform_device_count=8``), the CPU-runnable multi-host
strategy of SURVEY §4.  Golden reference: host COO SpMV / scipy-style
dense solves."""

import numpy as np
import pytest

import jax

from spgpu_tpu.parallel.partition import (
    PartitionedMatrix,
    make_row_mesh,
    partition_coo_rows,
)
from spgpu_tpu.parallel.dist_spmv import dist_spmv
from spgpu_tpu.parallel.dist_solve import dist_bicgstab, dist_cg
from spgpu_tpu.solvers.cg import jacobi_preconditioner
from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded, random_irregular


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize("n_shards", [1, 2, 8])
@pytest.mark.parametrize(
    "make",
    [
        lambda: laplacian_2d(37, 41),
        lambda: random_irregular(1000, 1000, avg_nnz_per_row=9.0, seed=3),
        lambda: random_banded(900, bands=7, wander=13, seed=4),
    ],
    ids=["laplace", "irregular", "banded"],
)
def test_dist_spmv_matches_golden(n_shards, make):
    if n_shards > len(jax.devices()):
        pytest.skip("not enough devices")
    coo = make()
    pm = partition_coo_rows(coo, n_shards)
    mesh = make_row_mesh(n_shards)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(coo.n_rows)
    z = dist_spmv(pm, x, mesh)
    np.testing.assert_allclose(np.asarray(z), coo.spmv(x), rtol=1e-12, atol=1e-12)


@requires_8
def test_dist_spmv_fp32():
    coo = laplacian_2d(32, 32, dtype=np.float32)
    pm = partition_coo_rows(coo, 8)
    mesh = make_row_mesh(8)
    x = np.random.default_rng(1).standard_normal(coo.n_rows).astype(np.float32)
    z = dist_spmv(pm, x, mesh)
    np.testing.assert_allclose(np.asarray(z), coo.spmv(x), rtol=1e-5, atol=1e-5)


@requires_8
def test_partition_shapes_and_plan():
    coo = laplacian_2d(20, 20)  # n=400, not a multiple of 8*128
    pm = partition_coo_rows(coo, 8)
    assert pm.chunk % pm.hack_size == 0
    assert pm.padded_rows >= coo.n_rows
    assert pm.send_idx.shape[:2] == (8, 8)
    # interior slab columns stay inside the shard
    assert int(np.asarray(pm.int_cols).max()) < pm.chunk
    # exterior columns index the (S*K,) halo buffer
    assert int(np.asarray(pm.ext_cols).max()) < 8 * pm.halo_width


@requires_8
def test_dist_cg_laplacian():
    coo = laplacian_2d(31, 37)
    pm = partition_coo_rows(coo, 8)
    mesh = make_row_mesh(8)
    b = np.random.default_rng(2).standard_normal(coo.n_rows)
    res = dist_cg(pm, b, mesh, tol=1e-10, maxiter=3000)
    assert bool(res.converged)
    np.testing.assert_allclose(coo.spmv(np.asarray(res.x)), b, atol=1e-8)


@requires_8
def test_dist_cg_jacobi_preconditioned():
    coo = random_banded(700, bands=5, wander=0, seed=7)  # diag-dominant
    coo_sym_b = coo  # not symmetric; use normal-equations-free bicgstab below
    pm = partition_coo_rows(laplacian_2d(25, 28), 8)
    lap = laplacian_2d(25, 28)
    mesh = make_row_mesh(8)
    b = np.random.default_rng(3).standard_normal(lap.n_rows)
    res = dist_cg(pm, b, mesh, tol=1e-10, maxiter=3000,
                  m_inv=jacobi_preconditioner(lap))
    assert bool(res.converged)
    np.testing.assert_allclose(lap.spmv(np.asarray(res.x)), b, atol=1e-8)


@requires_8
def test_dist_bicgstab_nonsymmetric():
    coo = random_banded(640, bands=5, wander=0, seed=9)  # diag-dominant
    pm = partition_coo_rows(coo, 8)
    mesh = make_row_mesh(8)
    b = np.random.default_rng(4).standard_normal(coo.n_rows)
    res = dist_bicgstab(pm, b, mesh, tol=1e-9, maxiter=4000)
    assert bool(res.converged)
    np.testing.assert_allclose(coo.spmv(np.asarray(res.x)), b, atol=1e-6)


@requires_8
def test_dist_matches_single_device_cg():
    """N-shard CG and 1-shard CG agree (same math, different partition)."""
    coo = laplacian_2d(24, 24)
    b = np.random.default_rng(5).standard_normal(coo.n_rows)
    r1 = dist_cg(partition_coo_rows(coo, 1), b, make_row_mesh(1),
                 tol=1e-10, maxiter=2000)
    r8 = dist_cg(partition_coo_rows(coo, 8), b, make_row_mesh(8),
                 tol=1e-10, maxiter=2000)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r8.x), atol=1e-7)


@requires_8
def test_dist_spmv_whell_matches_golden():
    from spgpu_tpu.parallel.partition_whell import partition_coo_rows_whell

    coo = laplacian_2d(37, 41, np.float32)
    pm = partition_coo_rows_whell(coo, 8)
    mesh = make_row_mesh(8)
    x = np.random.default_rng(0).standard_normal(coo.n_rows).astype(np.float32)
    z = dist_spmv(pm, x, mesh)
    np.testing.assert_allclose(np.asarray(z), coo.spmv(x), rtol=2e-5, atol=2e-5)


@requires_8
def test_dist_cg_whell():
    from spgpu_tpu.parallel.partition_whell import partition_coo_rows_whell

    coo = laplacian_2d(25, 28, np.float32)
    pm = partition_coo_rows_whell(coo, 8)
    mesh = make_row_mesh(8)
    b = np.random.default_rng(2).standard_normal(coo.n_rows).astype(np.float32)
    res = dist_cg(pm, b, mesh, tol=1e-5, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(coo.spmv(np.asarray(res.x)), b, atol=1e-3)


def test_pad_stack_whell_rejects_divergent_metadata():
    """_pad_stack_whell shares metadata from shard 0; divergent shard
    geometry must raise instead of silently corrupting (VERDICT r2 #9)."""
    import pytest

    from spgpu_tpu.convert import coo_to_whell
    from spgpu_tpu.parallel.partition_whell import _pad_stack_whell
    from spgpu_tpu.utils.fixtures import random_fem_like

    m1 = coo_to_whell(random_fem_like(256, 4.0, span=64, far_frac=0.0,
                                      seed=0, dtype=np.float32))
    m2 = coo_to_whell(random_fem_like(2048, 4.0, span=64, far_frac=0.0,
                                      seed=1, dtype=np.float32))
    assert (m1.num_hacks, m1.x_pages) != (m2.num_hacks, m2.x_pages)
    with pytest.raises(ValueError, match="diverges"):
        _pad_stack_whell([m1, m2])


def test_packed_partition_dist_spmv_and_cg():
    """PACKED WHELL inside shard_map — the production path (VERDICT r2
    weak #3): halo exchange + one packed kernel per shard, vs host
    golden; fp32 CG and dd (float64) CG with error-free cross-shard
    reductions."""
    import jax.numpy as jnp

    from spgpu_tpu.parallel.dist_solve import dist_cg
    from spgpu_tpu.parallel.dist_spmv import dist_spmv
    from spgpu_tpu.parallel.partition import make_row_mesh
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.utils.fixtures import laplacian_2d

    coo = laplacian_2d(24, 64, dtype=np.float32)
    n = coo.n_rows
    mesh = make_row_mesh(8)
    pm = partition_coo_rows_packed(coo, 8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    z = np.asarray(dist_spmv(pm, jnp.asarray(x), mesh))
    ref = coo.spmv(x)
    assert np.abs(z - ref).max() / np.abs(ref).max() < 1e-5

    b = rng.standard_normal(n).astype(np.float32)
    res = dist_cg(pm, jnp.asarray(b), mesh, tol=1e-6, maxiter=3000)
    xs = np.asarray(res.x)
    assert np.linalg.norm(b - coo.spmv(xs)) / np.linalg.norm(b) < 1e-4

    # dd (float64): the D-precision distributed workload
    coo64 = laplacian_2d(24, 64, dtype=np.float64)
    pm64 = partition_coo_rows_packed(coo64, 8)
    assert pm64.is_dd
    b64 = rng.standard_normal(n)
    res64 = dist_cg(pm64, b64, mesh, tol=1e-11, maxiter=6000)
    x64 = np.asarray(res64.x)
    assert np.linalg.norm(b64 - coo64.spmv(x64)) / np.linalg.norm(b64) < 1e-10


def test_packed_partition_uneven_and_2shards():
    """Uneven last shard + 2-way mesh; dist_bicgstab on the packed path."""
    import jax.numpy as jnp

    from spgpu_tpu.parallel.dist_solve import dist_bicgstab
    from spgpu_tpu.parallel.dist_spmv import dist_spmv
    from spgpu_tpu.parallel.partition import make_row_mesh
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.utils.fixtures import random_banded

    coo = random_banded(700, bands=5, wander=0, seed=3,
                        dtype=np.float32)  # nonsym diag-dominant
    mesh = make_row_mesh(2)
    pm = partition_coo_rows_packed(coo.sum_duplicates(), 2)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(700).astype(np.float32)
    z = np.asarray(dist_spmv(pm, jnp.asarray(x), mesh))
    ref = coo.sum_duplicates().spmv(x)
    assert np.abs(z - ref).max() / np.abs(ref).max() < 1e-5

    b = rng.standard_normal(700).astype(np.float32)
    res = dist_bicgstab(pm, jnp.asarray(b), mesh, tol=1e-6, maxiter=4000)
    xs = np.asarray(res.x)
    assert np.linalg.norm(b - coo.sum_duplicates().spmv(xs)) / \
        np.linalg.norm(b) < 1e-3


def test_blocked_packed_whell_single_device():
    """Single-device row blocks for large packed matrices
    (parallel/blocks.py): each block a self-contained packed matrix over
    its phantom-halo-extended space; halo values come from a flat gather
    of the stacked state.  fp32 and dd, vs host golden; CG in the
    stacked lane space via a matvec closure."""
    import jax.numpy as jnp

    from spgpu_tpu.parallel.blocks import blocks_spmv, coo_to_whell_blocks
    from spgpu_tpu.solvers.cg import cg
    from spgpu_tpu.utils.fixtures import laplacian_2d, random_fem_like

    coo = random_fem_like(3000, 10.0, span=150, far_frac=0.02, seed=5,
                          dtype=np.float32)
    a = coo_to_whell_blocks(coo, n_blocks=3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(3000).astype(np.float32)
    z = blocks_spmv(a, jnp.asarray(a.embed(x)), interpret=True)
    ref = coo.spmv(x)
    err = np.abs(a.extract(np.asarray(z)) - ref).max() / np.abs(ref).max()
    assert err < 1e-5

    # dd blocks
    lap = laplacian_2d(40, 60, dtype=np.float64)
    a64 = coo_to_whell_blocks(lap, n_blocks=2)
    assert a64.is_dd
    x64 = rng.standard_normal(lap.n_rows)
    z64 = blocks_spmv(a64, jnp.asarray(a64.embed(x64)), interpret=True)
    ref64 = lap.spmv(x64)
    e64 = np.abs(a64.extract(np.asarray(z64)) - ref64).max() / \
        np.abs(ref64).max()
    assert e64 < 1e-12

    # CG over the FLATTENED stacked state (SPD Laplacian, fp32 blocks):
    # cg's reductions run over the last axis, so the (S, L) state
    # flattens to (S*L,) around the matvec
    lap32 = laplacian_2d(40, 60, dtype=np.float32)
    ab = coo_to_whell_blocks(lap32, n_blocks=2)
    S, L = ab.n_blocks, ab.n_lane
    b = rng.standard_normal(lap32.n_rows).astype(np.float32)
    bs = jnp.asarray(ab.embed(b)).reshape(-1)
    mv = lambda v: blocks_spmv(ab, v.reshape(S, L),
                               interpret=True).reshape(-1)
    res = cg(mv, bs, tol=1e-6, maxiter=4000)
    xs = ab.extract(np.asarray(res.x).reshape(S, L))
    assert np.linalg.norm(b - lap32.spmv(xs)) / np.linalg.norm(b) < 1e-4


def test_blocks_tuple_zero_copy_path():
    """The tuple zero-copy protocol (in-kernel halo splice): SpMV vs
    host golden and tuple-state CG."""
    import jax.numpy as jnp

    from spgpu_tpu.parallel.blocks import (
        blocks_cg, blocks_spmv_tuple, coo_to_whell_blocks, embed_tuple,
        extract_tuple)
    from spgpu_tpu.utils.fixtures import laplacian_2d, random_fem_like

    coo = random_fem_like(3000, 10.0, span=150, far_frac=0.02, seed=5,
                          dtype=np.float32)
    a = coo_to_whell_blocks(coo, n_blocks=3)
    assert a.halo_src is None  # interval plan active
    rng = np.random.default_rng(1)
    x = rng.standard_normal(3000).astype(np.float32)
    xs = tuple(jnp.asarray(v) for v in embed_tuple(a, x))
    z = blocks_spmv_tuple(a, xs, interpret=True)
    ref = coo.spmv(x)
    assert np.abs(extract_tuple(a, z) - ref).max() / np.abs(ref).max() < 1e-5

    lap = laplacian_2d(40, 60, dtype=np.float32)
    ab = coo_to_whell_blocks(lap, n_blocks=2)
    b = rng.standard_normal(lap.n_rows).astype(np.float32)
    res = blocks_cg(ab, b, tol=1e-6, maxiter=5000, interpret=True)
    rr = np.linalg.norm(b - lap.spmv(np.asarray(res.x))) / np.linalg.norm(b)
    assert rr < 1e-4


def test_dist_bicgstab_dd_packed():
    """dist_bicgstab on a float64 packed partition must run BiCGSTAB
    (dd), not silently CG (review finding)."""
    import jax.numpy as jnp

    from spgpu_tpu.parallel.dist_solve import dist_bicgstab
    from spgpu_tpu.parallel.partition import make_row_mesh
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.utils.fixtures import random_banded

    n = 512
    band = random_banded(n, bands=5, wander=0, seed=9, dtype=np.float64)
    rows = np.concatenate([band.rows, np.arange(n)])
    cols = np.concatenate([band.cols, np.arange(n)])
    vals = np.concatenate([band.values * 0.1, np.full(n, 4.0)])
    A = CooMatrix(rows, cols, vals, n, n).sum_duplicates()  # nonsymmetric
    mesh = make_row_mesh(2)
    pm = partition_coo_rows_packed(A, 2)
    assert pm.is_dd
    b = np.random.default_rng(4).standard_normal(n)
    res = dist_bicgstab(pm, b, mesh, tol=1e-11, maxiter=3000)
    x = np.asarray(res.x)
    assert np.linalg.norm(b - A.spmv(x)) / np.linalg.norm(b) < 1e-9


def test_packed_partition_every_group_has_a_chunk():
    """Stacked shards with UNEQUAL group counts: every group id must
    appear in every shard's chunk_group, else the kernel never writes
    the padded output blocks and they stay uninitialized on real TPUs
    (review finding; CPU interpret zero-fills and hides it)."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed

    rng = np.random.default_rng(3)
    n = 1024
    # skewed degrees: first half dense rows, second half singletons ->
    # different per-shard hack counts -> different num_groups
    rows = np.concatenate([
        np.repeat(np.arange(n // 2), 24),
        np.arange(n // 2, n)])
    cols = np.concatenate([
        rng.integers(0, n, (n // 2) * 24),
        np.arange(n // 2, n)])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    coo = CooMatrix(rows, cols, vals, n, n)
    pm = partition_coo_rows_packed(coo, 2)
    cg = np.asarray(pm.chunk_group)
    for s in range(2):
        ids = set(int(v) for v in cg[s][:-1])
        assert ids == set(range(pm.num_groups)), (s, ids, pm.num_groups)
    # and the product still matches the golden
    import jax.numpy as jnp

    from spgpu_tpu.parallel.dist_spmv import dist_spmv
    from spgpu_tpu.parallel.partition import make_row_mesh

    x = rng.standard_normal(n).astype(np.float32)
    z = np.asarray(dist_spmv(pm, jnp.asarray(x), make_row_mesh(2)))
    ref = coo.spmv(x)
    assert np.abs(z - ref).max() / max(np.abs(ref).max(), 1) < 1e-4


def test_dist_solve_handle_compile_once():
    """r5 pod-run API: DistSolveHandle traces each (symmetric, tol,
    maxiter) program ONCE — a second solve with a new b reuses the
    executable (the reference's one-handle-many-calls contract,
    core.h:60-82)."""
    from spgpu_tpu.parallel.dist_solve import DistSolveHandle
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.utils.fixtures import laplacian_2d

    coo = laplacian_2d(64, 64, np.float32)
    pm = partition_coo_rows_packed(coo, 4)
    mesh = make_row_mesh(4)
    h = DistSolveHandle(pm, mesh)
    rng = np.random.default_rng(0)
    b1 = rng.standard_normal(coo.n_rows).astype(np.float32)
    b2 = rng.standard_normal(coo.n_rows).astype(np.float32)
    r1 = h.solve(b1, tol=1e-6, maxiter=500)
    r2 = h.solve(b2, tol=1e-6, maxiter=500)
    key = (True, 1e-6, 500)
    assert h.trace_counts[key] == 1, h.trace_counts
    for b, r in ((b1, r1), (b2, r2)):
        resid = np.linalg.norm(b - coo.spmv(np.asarray(r.x, np.float64))) \
            / np.linalg.norm(b)
        assert resid < 1e-4


def test_sharded_handle_complex():
    """r5: ShardedHandle covers ComplexPackedPartition — device-resident
    plane-pair matvec loop with no per-call retrace."""
    from spgpu_tpu.formats.coo import CooMatrix
    from spgpu_tpu.parallel.dist_spmv import ShardedHandle
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.utils.fixtures import random_banded

    rng = np.random.default_rng(4)
    base = random_banded(2048, bands=7, wander=3, seed=1,
                         dtype=np.float64).sum_duplicates()
    cm = CooMatrix(base.rows, base.cols,
                   (base.values + 1j * rng.standard_normal(base.nnz))
                   .astype(np.complex64), base.n_rows, base.n_cols)
    pm = partition_coo_rows_packed(cm, 2)
    mesh = make_row_mesh(2)
    h = ShardedHandle(pm, mesh)
    xc = (rng.standard_normal(cm.n_cols)
          + 1j * rng.standard_normal(cm.n_cols)).astype(np.complex64)
    st = h.embed(xc)
    z = h.extract(h.matvec(st))
    g = cm.spmv(xc.astype(np.complex128))
    assert np.linalg.norm(z - g) / np.linalg.norm(g) < 1e-5
