"""Pallas TPU kernels — the performance core.

TPU-native re-implementations of the reference's CUDA SpMV kernels
(SURVEY §2.4).  The CUDA code earns its speed from texture-cached
arbitrary gathers of ``x`` plus warp-level tricks
(``hell_spmv_base_template.cuh:32-54``); Mosaic/TPU has neither, so the
kernels here are built from the primitives the VPU does have:

* ``take_along_axis(t, i, axis=0)`` — sublane gather, 8-tall table;
* ``take_along_axis(t, i, axis=1)`` — lane gather within 128 lanes;
* dynamic slices of VMEM-resident operands.

The WHELL format (:mod:`spgpu_tpu.formats.whell`) is laid out at
conversion time so one contiguous window slice, one sublane gather
(page routing) and one lane gather (residue pick) yield every x
operand — three vector ops per 8×128 tile instead of 1024 scalar
fetches.

The x vector is kept fully VMEM-resident as an ``(pages, 128)`` slab
(the TPU analogue of "x fits in texture cache"); that bounds ``n_cols``
at a few million fp32 entries per kernel call — column-panel tiling is
the planned extension for larger matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgpu_tpu.formats.whell import WhellMatrix

__all__ = ["whell_spmv_pallas", "whell_spmm_pallas", "whdia_spmv_pallas", "supports"]


def supports(fmt: str, a, dtype) -> bool:
    """Dispatcher hook: is a Pallas kernel available for this case?"""
    if fmt == "whell":
        return np.dtype(dtype) == np.float32
    return False


from spgpu_tpu.core import CHUNK_TILES as _CHUNK_TILES  # tiles per grid step
from spgpu_tpu.core import WHDIA_CHUNK_TILES as _WHDIA_CT


def _whell_kernel(tmeta_ref, cgroup_ref, vals_ref, res_ref,
                  pt_ref, x_hbm_ref, z_ref, x_vmem, xsem):
    """Grid = one step per chunk (CHUNK_TILES tiles; blocks must be 100s
    of KB — per-grid-step overhead on v5e is ~0.3-0.5 us).  The z block
    covers an 8-hack group; tiles accumulate into their hack's row of it
    (same structure as the WHDIA kernel).  x is staged into a persistent
    VMEM scratch once per call."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        z_ref[:] = jnp.zeros_like(z_ref)

    for k in range(_CHUNK_TILES):
        t = c * _CHUNK_TILES + k
        meta = tmeta_ref[t]  # base page | hack-in-group << 16
        win8 = x_vmem[pl.ds(jax.lax.bitwise_and(meta, jnp.int32(0xFFFF)), 8), :]
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        # page routing (sublane gather through the residue-indexed page
        # table), then residue pick (lane gather)
        h1 = jnp.take_along_axis(win8, pt, axis=0)
        g = jnp.take_along_axis(h1, res, axis=1)
        # bf16 value slabs upcast here: accumulate in the x/z dtype
        v = vals_ref[k * 8:(k + 1) * 8, :].astype(z_ref.dtype)
        # (per-run accumulators with predicated flush, int32 index slabs,
        # and (32,128)-aligned int8 casts all measured neutral-or-worse;
        # the remaining per-tile cost looks latency-bound — DESIGN.md §4)
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        z_ref[pl.ds(hh, 1), :, :] += (v * g)[None]


@functools.partial(jax.jit, static_argnames=("num_tiles", "num_groups", "x_pages", "interpret"))
def _whell_spmv_call(values, residue, page_tab, tile_base, chunk_group,
                     x2d, *, num_tiles, num_groups, x_pages,
                     interpret=False):
    num_chunks = num_tiles // _CHUNK_TILES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
        ],
        out_specs=pl.BlockSpec(
            (8, 8, 128), lambda c, tm, cg: (cg[c], 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((x_pages, 128), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    acc = pl.pallas_call(
        _whell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * 8, 8, 128), x2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 6 + x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, values, residue, page_tab, x2d)
    return acc.sum(axis=1)


def _whell_spmm_kernel(tmeta_ref, cgroup_ref, vals_ref, res_ref,
                       pt_ref, x_hbm_ref, z_ref, x_vmem, xsem, *, n_rhs):
    """Multi-RHS WHELL SpMM: one slab pass computes all RHS columns —
    the slab (values + indices) is read once and amortised over n_rhs
    products, where the reference issues a host-side loop of scalar
    kernels per RHS (sdot.cu:167-175 pattern, SURVEY §2.5 note)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        z_ref[:] = jnp.zeros_like(z_ref)

    for k in range(_CHUNK_TILES):
        t = c * _CHUNK_TILES + k
        meta = tmeta_ref[t]
        tb = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        v = vals_ref[k * 8:(k + 1) * 8, :]
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))

        # RHS loop as lax.fori: unrolling n_rhs x CHUNK_TILES bodies
        # explodes Mosaic compile time.
        def rhs_body(r, _):
            win8 = x_vmem[r, pl.ds(tb, 8), :]
            h1 = jnp.take_along_axis(win8, pt, axis=0)
            g = jnp.take_along_axis(h1, res, axis=1)
            z_ref[r, pl.ds(hh, 1), :, :] += (v * g)[None]
            return 0

        jax.lax.fori_loop(0, n_rhs, rhs_body, 0)


@functools.partial(jax.jit, static_argnames=("num_tiles", "num_groups", "x_pages", "n_rhs", "interpret"))
def _whell_spmm_call(values, residue, page_tab, tile_base, chunk_group,
                     x3d, *, num_tiles, num_groups, x_pages,
                     n_rhs, interpret=False):
    num_chunks = num_tiles // _CHUNK_TILES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((_CHUNK_TILES * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x3d (HBM, staged once)
        ],
        out_specs=pl.BlockSpec(
            (n_rhs, 8, 8, 128), lambda c, tm, cg: (0, cg[c], 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rhs, x_pages, 128), values.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_whell_spmm_kernel, n_rhs=n_rhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rhs, num_groups * 8, 8, 128), values.dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128 * n_rhs,
            bytes_accessed=num_tiles * 8 * 128 * 6
            + n_rhs * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, values, residue, page_tab, x3d)
    return acc.sum(axis=2)


def whell_spmm_pallas(a: WhellMatrix, x, alpha=1.0, beta=0.0, y=None,
                      interpret: bool = False):
    """Fused multi-RHS ``Z = beta*Y + alpha*(A @ X)`` on WHELL.

    ``x``: ``(n_rhs, n_cols)``; returns ``(n_rhs, n_rows)``.  One slab
    pass serves every RHS (the reference loops scalar kernels host-side,
    SURVEY §2.5).  ``n_rhs`` and x must fit VMEM: n_rhs · n_cols · 4 B
    within a few MB.
    """
    n_rhs = int(x.shape[0])
    pad = a.x_pages * 128 - a.n_cols
    x3 = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    x3 = x3.reshape(n_rhs, a.x_pages, 128)
    z = _whell_spmm_call(
        a.values, a.residue, a.page_tab, a.tile_base, a.chunk_group, x3,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        n_rhs=n_rhs, interpret=interpret,
    )
    acc = z.reshape(n_rhs, -1)
    if a.row_perm is not None:
        out = jnp.zeros((n_rhs, a.rows_padded), acc.dtype)
        acc = out.at[:, a.row_perm].set(acc[:, : a.row_perm.shape[0]])
    acc = acc[:, : a.n_rows]
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def _whdia_kernel(r0_ref, tmeta_ref, cgroup_ref, vals_ref,
                  x_hbm_ref, z_ref, x_vmem, xsem):
    """WHDIA SpMV: values-only traffic.  Each slot's x window is the
    contiguous rotation x[h*128 + d + lane]; both gather index sets are
    reconstructed arithmetically from one scalar per slot (see
    formats/whdia.py), so unlike WHELL no index slab is streamed."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        z_ref[:] = jnp.zeros_like(z_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for k in range(_WHDIA_CT):
        t = c * _WHDIA_CT + k
        meta = tmeta_ref[t]  # base page | hack-in-group << 16
        win8 = x_vmem[pl.ds(jax.lax.bitwise_and(meta, jnp.int32(0xFFFF)), 8), :]
        # slot_r0 packs two biased 16-bit values per int32 word (SMEM
        # budget); tile-local parity is static so the shifts are free.
        r0 = jnp.stack([
            jax.lax.bitwise_and(
                jax.lax.shift_right_logical(
                    r0_ref[t * 4 + s // 2], jnp.int32(16 * (s & 1))),
                jnp.int32(0xFFFF),
            ) - jnp.int32(128)
            for s in range(8)
        ]).reshape(8, 1)
        rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
        rr = jax.lax.bitwise_and(r0, jnp.int32(127))
        # rotation bijection: residue l comes from page rq (+1 if l < rr)
        pt = jnp.clip(rq + (lane < rr).astype(jnp.int32), 0, 7)
        idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))
        h1 = jnp.take_along_axis(win8, pt, axis=0)
        g = jnp.take_along_axis(h1, idx, axis=1)
        contrib = vals_ref[k * 8:(k + 1) * 8, :] * g
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        z_ref[pl.ds(hh, 1), :, :] += contrib[None]


@functools.partial(jax.jit, static_argnames=("num_tiles", "num_groups", "x_pages", "interpret"))
def _whdia_spmv_call(values, slot_r0, tile_base, chunk_group,
                     x2d, *, num_tiles, num_groups, x_pages,
                     interpret=False):
    num_chunks = num_tiles // _WHDIA_CT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((_WHDIA_CT * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
        ],
        out_specs=pl.BlockSpec(
            (32, 8, 128), lambda c, r0, tm, cg: (cg[c], 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((x_pages, 128), values.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    acc = pl.pallas_call(
        _whdia_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * 32, 8, 128), values.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 4 + x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(slot_r0, tile_base, chunk_group, values, x2d)
    return acc.sum(axis=1)


def whdia_spmv_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                      interpret: bool = False):
    """``z = beta*y + alpha*(A @ x)`` on the WHDIA layout; semantics
    match ``spgpu?hdiaspmv`` (``hdia_spmv_base.cuh:114-127``)."""
    x2d = _prep_x(x, a.n_cols, a.x_pages)
    z = _whdia_spmv_call(
        a.values, a.slot_r0, a.tile_base, a.chunk_group, x2d,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        interpret=interpret,
    )
    acc = z.reshape(-1)[: a.n_rows]
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


#: x must fit the persistent VMEM scratch next to the streamed slab
#: blocks; ~12 MB leaves headroom in v5e's 16 MB VMEM.
_X_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _prep_x(x, n_cols: int, x_pages: int):
    nbytes = x_pages * 128 * jnp.dtype(x.dtype).itemsize
    if nbytes > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"x ({nbytes/2**20:.0f} MiB padded) exceeds the VMEM-resident "
            f"limit ({_X_VMEM_LIMIT_BYTES/2**20:.0f} MiB); column-panel "
            "tiling for larger matrices is planned (BASELINE.md)"
        )
    pad = x_pages * 128 - n_cols
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(x_pages, 128)


def whell_spmv_pallas(a: WhellMatrix, x, alpha=1.0, beta=0.0, y=None,
                      interpret: bool = False):
    """``z = beta*y + alpha*(A @ x)`` on the WHELL layout.

    Semantics match ``spgpu?hellspmv`` (``hell_spmv_base.cuh:103-157``):
    static ``beta == 0`` never reads ``y``; a row permutation (OELL) is
    applied on the output.  Single-RHS; see :func:`whell_spmm_pallas`
    for the fused multi-RHS variant.
    """
    x2d = _prep_x(x, a.n_cols, a.x_pages)
    z = _whell_spmv_call(
        a.values, a.residue, a.page_tab, a.tile_base, a.chunk_group, x2d,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        interpret=interpret,
    )
    acc = z.reshape(-1)
    if a.row_perm is not None:
        # stored row i holds original row row_perm[i]; scatter back.  For
        # iterative solvers prefer relabelling the whole system instead
        # (solve in permuted space) — this scatter is per-product cost.
        out = jnp.zeros((a.rows_padded,), acc.dtype)
        acc = out.at[a.row_perm].set(acc[: a.row_perm.shape[0]])
    acc = acc[: a.n_rows]
    if a.ways > 1:
        # way-split rows: sum each way group back to one true row
        acc = acc.reshape(a.n_rows // a.ways, a.ways).sum(axis=1)
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y
