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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spgpu_tpu.formats.whell import WhellMatrix

__all__ = ["whell_spmv_pallas", "whell_spmm_pallas", "whdia_spmv_pallas"]

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


def _whell_packed_kernel(*refs, window_pages, chunk_tiles,
                         group_hacks, scattered=False, halo_page=None,
                         pipeline=0, unit_segments=False):
    """Packed-lane WHELL SpMV.

    Same streaming skeleton as :func:`_whell_kernel`, plus:

    * window select — ``pt`` entries span ``window_pages`` (8/16/32);
      the 8-page sublane-gather table limit is worked around by slicing
      ``window_pages/8`` aligned 8-page tables and selecting by the high
      bits of ``pt`` (a 1- or 2-level vector select tree);
    * scattered windows — when ``scattered``, the K tables are
      INDEPENDENTLY based (per-layout-group superpage sets from
      ``group_bases``, prefetched as a third scalar operand): a hack's
      local cluster and its far/hub columns share one group, which cuts
      the W->tile rounding padding ~2.5x -> ~1.6x (doc/DESIGN.md §2d);
    * segment flush — accumulation goes to a persistent VMEM scratch;
      on the last chunk of each 8-hack group the scratch is slot-summed,
      prefix-scanned along lanes, and compacted into per-row outputs via
      the ``seg_lo``/``seg_hi`` gather (rows own lane SEGMENTS sized by
      degree — the anti-raggedness layout, formats/whell.py);
    * dual accumulators — even/odd tiles write DISJOINT scratch planes
      (summed at flush), so consecutive tiles' read-modify-write chains
      are independent.  Measured on chip (fp32 flagship): the single-
      plane RMW serialises successive tiles and costs ~1 cyc/tile of
      the ~12-cycle budget; two planes recover it (94 -> 102 GFLOPS).
      Four planes lose (reset/reduce overhead grows with gh).

    ``halo_page`` (static): the row-blocked composition
    (parallel/blocks.py) passes the block's halo values as a small extra
    VMEM operand, spliced into the x scratch right after the staging DMA
    — the block's x state array is then used UNMODIFIED (no host-side
    update-slice copy of the multi-MB state per product).
    """
    win_ref = None
    if halo_page is not None:
        refs = list(refs)
        win_ref = refs.pop(9 if scattered else 8)  # after the x operand
    if scattered:
        (tmeta_ref, cgroup_ref, gbase_ref, vals_ref, res_ref, pt_ref,
         seglo_ref, seghi_ref, x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    else:
        (tmeta_ref, cgroup_ref, vals_ref, res_ref, pt_ref,
         seglo_ref, seghi_ref, x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()
        if win_ref is not None:
            x_vmem[pl.ds(halo_page, win_ref.shape[0]), :] = win_ref[:]

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        zacc[:] = jnp.zeros_like(zacc)

    ntab = window_pages // 8

    def _loads(k):
        """Slab loads + casts for tile k (pipeline stage 1)."""
        return (tmeta_ref[c * chunk_tiles + k],
                res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32),
                pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32),
                vals_ref[k * 8:(k + 1) * 8, :].astype(zacc.dtype))

    def _select(meta, pt):
        """Window resolve: sublane gathers + select tree (stage 2).
        Returns (h1, hh)."""
        if scattered:
            gidx = jax.lax.bitwise_and(meta, jnp.int32(0xFFFFF))
            hh = jax.lax.shift_right_logical(meta, jnp.int32(20))
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
            h1 = None
            for wb in range(ntab):
                winb = x_vmem[pl.ds(gbase_ref[gidx * ntab + wb], 8), :]
                hb = jnp.take_along_axis(winb, pt7, axis=0)
                h1 = hb if h1 is None else jnp.where(blk == wb, hb, h1)
            return h1, hh
        base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        win = x_vmem[pl.ds(base, 8), :]
        if window_pages == 8:
            return jnp.take_along_axis(win, pt, axis=0), hh
        pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
        blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
        h1 = jnp.take_along_axis(win, pt7, axis=0)
        for wb in range(1, ntab):
            winb = x_vmem[pl.ds(base + 8 * wb, 8), :]
            hb = jnp.take_along_axis(winb, pt7, axis=0)
            h1 = jnp.where(blk == wb, hb, h1)
        return h1, hh

    if pipeline == 0:
        for k in range(chunk_tiles):
            meta, res, pt, v = _loads(k)
            h1, hh = _select(meta, pt)
            g = jnp.take_along_axis(h1, res, axis=1)
            zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += (v * g)[None]
    elif pipeline == 1:
        # software-pipeline the slab loads/casts one tile ahead of the
        # gather chain (DESIGN §2f: the ~3.8 ns/tile diffuse compute is
        # an ILP/scheduling gap — give Mosaic an explicit overlap)
        nxt = _loads(0)
        for k in range(chunk_tiles):
            meta, res, pt, v = nxt
            if k + 1 < chunk_tiles:
                nxt = _loads(k + 1)
            h1, hh = _select(meta, pt)
            g = jnp.take_along_axis(h1, res, axis=1)
            zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += (v * g)[None]
    elif pipeline == 2:
        # two-stage: ALSO run tile k+1's window resolve (sublane
        # gathers + selects) before tile k's lane gather + RMW, so the
        # two gather units' chains interleave across tiles
        nxt = _loads(0)
        nsel = _select(nxt[0], nxt[2])
        for k in range(chunk_tiles):
            meta, res, pt, v = nxt
            h1, hh = nsel
            if k + 1 < chunk_tiles:
                nxt = _loads(k + 1)
                nsel = _select(nxt[0], nxt[2])
            g = jnp.take_along_axis(h1, res, axis=1)
            zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += (v * g)[None]
    else:
        # three-stage: the WHOLE gather chain (loads, window resolve,
        # lane gather) runs one tile ahead; the loop body retires only
        # fma + RMW for tile k
        nxt = _loads(0)
        nsel = _select(nxt[0], nxt[2])
        ng = jnp.take_along_axis(nsel[0], nxt[1], axis=1)
        for k in range(chunk_tiles):
            v, hh, g = nxt[3], nsel[1], ng
            if k + 1 < chunk_tiles:
                nxt = _loads(k + 1)
                nsel = _select(nxt[0], nxt[2])
                ng = jnp.take_along_axis(nsel[0], nxt[1], axis=1)
            zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += (v * g)[None]

    # flush: last chunk of this 8-hack group (trailing -1 sentinel makes
    # the final chunk compare unequal)
    last = cgroup_ref[c] != cgroup_ref[c + 1]

    @pl.when(last)
    def _():
        acc = zacc[:].reshape(2, group_hacks, 8, 128).sum(axis=0)
        y = jnp.sum(acc, axis=1)  # (group_hacks, 128): slot-sum
        hi = seghi_ref[:].astype(jnp.int32)
        mhi = (hi >= 0)
        if unit_segments:
            # width-1 segments everywhere: output lane o is the
            # slot-sum at its row's single contribution lane — no
            # prefix scan, one compaction gather (r5, DESIGN §2c-3)
            y_hi = jnp.take_along_axis(y, jnp.maximum(hi, 0), axis=1)
            z_ref[:] = y_hi * mhi.astype(y.dtype)
            return
        # inclusive prefix scan along lanes: 7 hardware lane ROLLS +
        # masked adds (r5 — the lane-misaligned concatenate Mosaic
        # lowers as a scalar shuffle cost ~2.2 us per gh=512 flush,
        # measured via the dd ablation where the same scan dominated
        # the whole kernel; doc/DESIGN.md §2c-3)
        p = y
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (group_hacks, 128), 1)
        for s in (1, 2, 4, 8, 16, 32, 64):
            p = p + jnp.where(lane_i >= s, pltpu.roll(p, s, 1),
                              jnp.zeros_like(p))
        lo = seglo_ref[:].astype(jnp.int32)
        p_lo = jnp.take_along_axis(p, jnp.maximum(lo, 0), axis=1)
        p_hi = jnp.take_along_axis(p, jnp.maximum(hi, 0), axis=1)
        z_ref[:] = (p_hi * mhi.astype(p.dtype)
                    - p_lo * (lo >= 0).astype(p.dtype))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "halo_page", "pipeline", "interpret",
    "unit_segments"))
def _whell_packed_call(values, residue, page_tab, seg_lo, seg_hi,
                       tile_base, chunk_group, x2d, group_bases=None,
                       halo_win=None, *,
                       num_tiles, num_groups, x_pages, window_pages,
                       chunk_tiles, group_hacks, halo_page=None,
                       pipeline=0, interpret=False, unit_segments=False):
    ct, gh = chunk_tiles, group_hacks
    scattered = group_bases is not None
    num_chunks = num_tiles // ct
    in_specs = [
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
        pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
        pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
    ]
    x_ops = (x2d,)
    if halo_page is not None:
        # small halo window (parallel/blocks.py), spliced into the x
        # scratch after the staging DMA
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        x_ops = (x2d, halo_win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if scattered else 2,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * gh, 8, 128), x2d.dtype),  # dual accumulators
            pltpu.VMEM((x_pages, 128), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, group_bases) if scattered
           else (tile_base, chunk_group))
    return pl.pallas_call(
        functools.partial(_whell_packed_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh,
                          scattered=scattered, halo_page=halo_page,
                          pipeline=pipeline, unit_segments=unit_segments),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * gh, 128), x2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 6 + x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops, values, residue, page_tab, seg_lo, seg_hi, *x_ops)


def _whell_packed_cplx_kernel(*refs, window_pages, chunk_tiles,
                              group_hacks, scattered=False,
                              unit_segments=False):
    """ONE-PASS complex packed-WHELL SpMV (r5): both value planes
    stream together, the slab decode + window resolve run ONCE per
    tile (the plane-pair path ran the whole chain 4x), xr/xi gather
    through the shared index sets, and the four real fmas land in
    re/im accumulator scratches — ``hell_cspmv.cu:29`` one-pass
    ``cuCfmaf`` parity for the irregular (HELL-class) format.
    Traffic: 10 B/cell (two fp32 slabs + shared res/pt) vs the
    plane-pair path's 20.  Single accumulator plane per component —
    the re/im RMW pair already gives the chain interleave the fp32
    kernel needs parity planes for, at half the VMEM."""
    if scattered:
        (tmeta_ref, cgroup_ref, gbase_ref, vr_ref, vi_ref, res_ref,
         pt_ref, seglo_ref, seghi_ref, xr_hbm, xi_hbm, z_ref,
         zacc_r, zacc_i, xr_vmem, xi_vmem, sem_r, sem_i) = refs
    else:
        (tmeta_ref, cgroup_ref, vr_ref, vi_ref, res_ref, pt_ref,
         seglo_ref, seghi_ref, xr_hbm, xi_hbm, z_ref,
         zacc_r, zacc_i, xr_vmem, xi_vmem, sem_r, sem_i) = refs
    gh = group_hacks
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        d1 = pltpu.make_async_copy(xr_hbm, xr_vmem, sem_r)
        d2 = pltpu.make_async_copy(xi_hbm, xi_vmem, sem_i)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        zacc_r[:] = jnp.zeros_like(zacc_r)
        zacc_i[:] = jnp.zeros_like(zacc_i)

    ntab = window_pages // 8
    for k in range(chunk_tiles):
        meta = tmeta_ref[c * chunk_tiles + k]
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        vr = vr_ref[k * 8:(k + 1) * 8, :]
        vi = vi_ref[k * 8:(k + 1) * 8, :]
        if scattered:
            gidx = jax.lax.bitwise_and(meta, jnp.int32(0xFFFFF))
            hh = jax.lax.shift_right_logical(meta, jnp.int32(20))
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))

            def wgather(x_vmem):
                h1 = None
                for wb in range(ntab):
                    winb = x_vmem[pl.ds(gbase_ref[gidx * ntab + wb], 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = hb if h1 is None else jnp.where(blk == wb, hb, h1)
                return jnp.take_along_axis(h1, res, axis=1)
        else:
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
            if window_pages == 8:
                pt7, blk = pt, None
            else:
                pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
                blk = jax.lax.shift_right_logical(pt, jnp.int32(3))

            def wgather(x_vmem):
                win = x_vmem[pl.ds(base, 8), :]
                h1 = jnp.take_along_axis(win, pt7, axis=0)
                for wb in range(1, ntab):
                    winb = x_vmem[pl.ds(base + 8 * wb, 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = jnp.where(blk == wb, hb, h1)
                return jnp.take_along_axis(h1, res, axis=1)

        gr = wgather(xr_vmem)
        gi = wgather(xi_vmem)
        sl = pl.ds(hh, 1)
        zacc_r[sl, :, :] += (vr * gr - vi * gi)[None]
        zacc_i[sl, :, :] += (vr * gi + vi * gr)[None]

    last = cgroup_ref[c] != cgroup_ref[c + 1]

    @pl.when(last)
    def _():
        hi = seghi_ref[:].astype(jnp.int32)
        mhi = (hi >= 0)
        ys = (jnp.sum(zacc_r[:], axis=1), jnp.sum(zacc_i[:], axis=1))
        if unit_segments:
            for plane, y in enumerate(ys):
                z_ref[plane] = jnp.take_along_axis(
                    y, jnp.maximum(hi, 0), axis=1) * mhi.astype(y.dtype)
            return
        lo = seglo_ref[:].astype(jnp.int32)
        mlo = (lo >= 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (gh, 128), 1)
        for plane, y in enumerate(ys):
            p = y
            for s in (1, 2, 4, 8, 16, 32, 64):
                p = p + jnp.where(lane_i >= s, pltpu.roll(p, s, 1),
                                  jnp.zeros_like(p))
            p_lo = jnp.take_along_axis(p, jnp.maximum(lo, 0), axis=1)
            p_hi = jnp.take_along_axis(p, jnp.maximum(hi, 0), axis=1)
            z_ref[plane] = (p_hi * mhi.astype(p.dtype)
                            - p_lo * mlo.astype(p.dtype))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "interpret", "unit_segments"))
def _whell_packed_cplx_call(vr, vi, residue, page_tab, seg_lo, seg_hi,
                            tile_base, chunk_group, xr2d, xi2d,
                            group_bases=None, *, num_tiles, num_groups,
                            x_pages, window_pages, chunk_tiles,
                            group_hacks, interpret=False,
                            unit_segments=False):
    ct, gh = chunk_tiles, group_hacks
    scattered = group_bases is not None
    num_chunks = num_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if scattered else 2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # vr
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # vi
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # res
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # pt
            pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
            pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # xr
            pl.BlockSpec(memory_space=pl.ANY),  # xi
        ],
        out_specs=pl.BlockSpec(
            (2, gh, 128), lambda c, tm, cg, *_: (0, cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((gh, 8, 128), vr.dtype),  # re accumulator
            pltpu.VMEM((gh, 8, 128), vr.dtype),  # im accumulator
            pltpu.VMEM((x_pages, 128), vr.dtype),
            pltpu.VMEM((x_pages, 128), vr.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, group_bases) if scattered
           else (tile_base, chunk_group))
    return pl.pallas_call(
        functools.partial(_whell_packed_cplx_kernel,
                          window_pages=window_pages, chunk_tiles=ct,
                          group_hacks=gh, scattered=scattered,
                          unit_segments=unit_segments),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_groups * gh, 128),
                                       vr.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 10
            + 2 * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops, vr, vi, residue, page_tab, seg_lo, seg_hi, xr2d, xi2d)


def whell_spmv_cplx_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                           interpret: bool = False):
    """Fused one-pass complex packed-WHELL SpMV on a
    :class:`~spgpu_tpu.formats.whell.WhellComplex` whose planes are
    plain packed :class:`WhellMatrix` (C precision).  ``x``: ``(2,
    n_lane)`` [re, im] lane-space stack; returns the same.  Z (dd) and
    panelled/segmented layouts take the plane-product path."""
    ar, ai = a.ar, a.ai
    xr2d = _prep_x(x[0], ar.n_cols, ar.x_pages)
    xi2d = _prep_x(x[1], ar.n_cols, ar.x_pages)
    z = _whell_packed_cplx_call(
        ar.values, ai.values, ar.residue, ar.page_tab, ar.seg_lo,
        ar.seg_hi, ar.tile_base, ar.chunk_group, xr2d, xi2d,
        ar.group_bases,
        num_tiles=ar.num_tiles, num_groups=ar.num_groups,
        x_pages=ar.x_pages, window_pages=ar.window_pages,
        chunk_tiles=ar.chunk_tiles, group_hacks=ar.group_hacks,
        interpret=interpret, unit_segments=ar.unit_segments)
    zz = z.reshape(2, -1)[:, : ar.n_rows]
    from spgpu_tpu.ops import _complex_epilogue

    return _complex_epilogue(zz, alpha, beta, y, is_dd=False)


def _whell_packed_dd_kernel(*refs, window_pages,
                            chunk_tiles, group_hacks, interpret,
                            halo_page=None, parity=False,
                            unit_segments=False):
    with __import__("contextlib").ExitStack() as _stack:
        from spgpu_tpu.ops import dd as _ddmod

        if not interpret:
            # Mosaic can't lower optimization_barrier (and doesn't
            # algebraically simplify fp) — trace the EFTs unguarded
            _stack.enter_context(_ddmod.unguarded())
        win_ref = None
        if halo_page is not None:
            refs = list(refs)
            win_ref = refs.pop(9)  # after the x operand
        _whell_packed_dd_body(
            *refs, win_ref=win_ref, halo_page=halo_page,
            window_pages=window_pages, chunk_tiles=chunk_tiles,
            group_hacks=group_hacks, parity=parity,
            unit_segments=unit_segments)


def _whell_packed_dd_body(tmeta_ref, cgroup_ref, vh_ref, vl_ref, res_ref,
                          pt_ref, seglo_ref, seghi_ref, x_hbm_ref, z_ref,
                          zh, zl, x_vmem, xsem, *, window_pages,
                          chunk_tiles, group_hacks, win_ref=None,
                          halo_page=None, parity=False,
                          unit_segments=False):
    """Double-float (fp64 emulation) packed WHELL SpMV.

    Same structure as :func:`_whell_packed_kernel` with every value in
    (hi, lo) fp32 pairs and error-free transforms (ops/dd.py) in the
    accumulate, slot-sum, and prefix-scan — the D-precision coverage the
    reference gets from native fp64 (``hell_dspmv.cu:28-33``).  x is a
    ``(2, pages, 128)`` stack staged once; products keep the ``vh*gh``
    TwoProd error plus both cross terms (``vl*gl`` dropped — below the
    2^-48 target)."""
    from spgpu_tpu.ops.dd import dd_add_dd, fast_two_sum, two_prod, two_sum

    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()
        if win_ref is not None:
            # splice the block's halo (2, wp, 128) pair into the x
            # scratch after the staging DMA (zero-copy row blocks)
            x_vmem[:, pl.ds(halo_page, win_ref.shape[1]), :] = win_ref[:]

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        zh[:] = jnp.zeros_like(zh)
        zl[:] = jnp.zeros_like(zl)

    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]
        base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)

        def window_gather(plane):
            win = x_vmem[plane, pl.ds(base, 8), :]
            if window_pages == 8:
                return jnp.take_along_axis(win, pt, axis=0)
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
            h1 = jnp.take_along_axis(win, pt7, axis=0)
            for wb in range(1, window_pages // 8):
                winb = x_vmem[plane, pl.ds(base + 8 * wb, 8), :]
                hb = jnp.take_along_axis(winb, pt7, axis=0)
                h1 = jnp.where(blk == wb, hb, h1)
            return h1

        g_hi = jnp.take_along_axis(window_gather(0), res, axis=1)
        g_lo = jnp.take_along_axis(window_gather(1), res, axis=1)
        vh = vh_ref[k * 8:(k + 1) * 8, :]
        vl = vl_ref[k * 8:(k + 1) * 8, :]
        p, e = two_prod(vh, g_hi)
        e = e + (vh * g_lo + vl * g_hi)
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        # parity=True: even/odd tiles RMW DISJOINT planes (the fp32
        # kernel's RMW-chain break).  MEASURED WORSE on the dd kernel
        # (12.8 vs 15.4 GFLOPS, DESIGN §2c-3) — the dd accumulate is
        # not chain-bound; default stays single-plane.
        sl = pl.ds(hh + (k % 2) * group_hacks, 1) if parity \
            else pl.ds(hh, 1)
        ah = zh[sl, :, :]
        al = zl[sl, :, :]
        s, e2 = two_sum(ah, p[None])
        nh, nl = fast_two_sum(s, e2 + al + e[None])
        zh[sl, :, :] = nh
        zl[sl, :, :] = nl

    last = cgroup_ref[c] != cgroup_ref[c + 1]

    @pl.when(last)
    def _():
        gh_ = group_hacks
        AH = zh[:]
        AL = zl[:]
        yh = AH[:gh_, 0]
        yl = AL[:gh_, 0]
        for s in range(1, 8):  # dd slot-sum
            yh, yl = dd_add_dd(yh, yl, AH[:gh_, s], AL[:gh_, s])
        if parity:
            for s in range(8):  # + odd parity plane
                yh, yl = dd_add_dd(yh, yl, AH[gh_:, s], AL[gh_:, s])
        ph, pll = yh, yl
        hi = seghi_ref[:].astype(jnp.int32)
        mhi = (hi >= 0).astype(ph.dtype)
        if unit_segments:
            # width-1 segments everywhere: skip the dd scan AND the lo
            # compaction — output lane o is the slot-sum at its row's
            # single contribution lane (r5, DESIGN §2c-3: the dd scan
            # was ~60% of the whole kernel on the Laplacian row)
            z_ref[0] = jnp.take_along_axis(
                ph, jnp.maximum(hi, 0), axis=1) * mhi
            z_ref[1] = jnp.take_along_axis(
                pll, jnp.maximum(hi, 0), axis=1) * mhi
            return
        # dd inclusive prefix scan along lanes: hardware lane ROLLS +
        # masked dd adds (r5) — the two misaligned concatenates per
        # round lowered as scalar shuffles (§2h)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (group_hacks, 128), 1)
        zero = jnp.zeros_like(ph)
        for s in (1, 2, 4, 8, 16, 32, 64):
            sh = jnp.where(lane_i >= s, pltpu.roll(ph, s, 1), zero)
            sl = jnp.where(lane_i >= s, pltpu.roll(pll, s, 1), zero)
            ph, pll = dd_add_dd(ph, pll, sh, sl)
        lo = seglo_ref[:].astype(jnp.int32)
        mlo = (lo >= 0).astype(ph.dtype)
        ph_hi = jnp.take_along_axis(ph, jnp.maximum(hi, 0), axis=1) * mhi
        pl_hi = jnp.take_along_axis(pll, jnp.maximum(hi, 0), axis=1) * mhi
        ph_lo = jnp.take_along_axis(ph, jnp.maximum(lo, 0), axis=1) * mlo
        pl_lo = jnp.take_along_axis(pll, jnp.maximum(lo, 0), axis=1) * mlo
        oh, ol = dd_add_dd(ph_hi, pl_hi, -ph_lo, -pl_lo)
        z_ref[0] = oh
        z_ref[1] = ol


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "halo_page", "interpret", "parity", "unit_segments"))
def _whell_packed_dd_call(values, values_lo, residue, page_tab, seg_lo,
                          seg_hi, tile_base, chunk_group, x3d,
                          halo_win=None, *, num_tiles,
                          num_groups, x_pages, window_pages, chunk_tiles,
                          group_hacks, halo_page=None, interpret=False,
                          parity=False, unit_segments=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    in_specs = [
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # hi
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # lo
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # res
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # pt
        pl.BlockSpec((gh, 128), lambda c, tm, cg: (cg[c], 0)),
        pl.BlockSpec((gh, 128), lambda c, tm, cg: (cg[c], 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # x3d (2, pages, 128)
    ]
    x_ops = (x3d,)
    if halo_page is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        x_ops = (x3d, halo_win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, gh, 128), lambda c, tm, cg: (0, cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM(((2 if parity else 1) * gh, 8, 128), jnp.float32),
            pltpu.VMEM(((2 if parity else 1) * gh, 8, 128), jnp.float32),
            pltpu.VMEM((2, x_pages, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_whell_packed_dd_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh,
                          interpret=interpret, halo_page=halo_page,
                          parity=parity, unit_segments=unit_segments),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_groups * gh, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 10 + 2 * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, values, values_lo, residue, page_tab,
      seg_lo, seg_hi, *x_ops)


def whell_spmv_dd_pallas(a: WhellMatrix, x_pair, interpret: bool = False):
    """Double-float SpMV on a packed WHELL with dd values.

    ``x_pair``: ``(2, n_lane)`` fp32 stack (``ops.dd.split`` of a float64
    lane-space vector); returns the ``(2, n_lane)`` product stack."""
    from spgpu_tpu.formats.whell import PanelledWhell, SegmentedWhell

    if isinstance(a, PanelledWhell):
        from spgpu_tpu.ops.dd import dd_add_dd

        z = None
        off = 0
        for p in a.panels:
            zp = whell_spmv_dd_pallas(p, x_pair[:, off:off + p.n_cols],
                                      interpret=interpret)
            if z is None:
                z = zp
            else:
                h, l = dd_add_dd(z[0], z[1], zp[0], zp[1])
                z = jnp.stack([h, l])
            off += p.n_cols
        return z
    if isinstance(a, SegmentedWhell):
        return jnp.concatenate([
            whell_spmv_dd_pallas(s, x_pair, interpret=interpret)
            for s in a.segments], axis=1)
    if not (a.packed and a.is_dd):
        raise ValueError("whell_spmv_dd requires a packed dd matrix "
                         "(coo_to_whell(packed=True) on float64 values)")
    pad = a.x_pages * 128 - a.n_cols
    xp = jnp.pad(x_pair, ((0, 0), (0, pad))) if pad else x_pair
    nbytes = 2 * a.x_pages * 128 * 4
    if nbytes > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"dd x ({nbytes/2**20:.0f} MiB) exceeds the VMEM-resident limit")
    x3d = xp.reshape(2, a.x_pages, 128)
    z = _whell_packed_dd_call(
        a.values, a.values_lo, a.residue, a.page_tab, a.seg_lo, a.seg_hi,
        a.tile_base, a.chunk_group, x3d,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        window_pages=a.window_pages, chunk_tiles=a.chunk_tiles,
        group_hacks=a.group_hacks, interpret=interpret,
        unit_segments=a.unit_segments,
    )
    return z.reshape(2, -1)[:, : a.n_rows]


def _whell_packed_spmm_kernel(*refs, window_pages, chunk_tiles,
                              group_hacks, n_rhs, scattered=False,
                              unit_segments=False):
    """Fused multi-RHS packed-WHELL SpMM: the slab (values + indices) is
    decoded ONCE per tile and amortised over ``n_rhs`` products (the
    reference loops scalar kernels host-side, sdot.cu:167-175).  The
    kernel is VPU-op-bound, so the win comes from sharing the slab
    loads/casts and per-tile scalar work, not from HBM traffic."""
    if scattered:
        (tmeta_ref, cgroup_ref, gbase_ref, vals_ref, res_ref, pt_ref,
         seglo_ref, seghi_ref, x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    else:
        (tmeta_ref, cgroup_ref, vals_ref, res_ref, pt_ref,
         seglo_ref, seghi_ref, x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
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
        zacc[:] = jnp.zeros_like(zacc)

    ntab = window_pages // 8
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        v = vals_ref[k * 8:(k + 1) * 8, :].astype(zacc.dtype)
        if scattered:
            gidx = jax.lax.bitwise_and(meta, jnp.int32(0xFFFFF))
            hh = jax.lax.shift_right_logical(meta, jnp.int32(20))
        else:
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        if scattered or window_pages > 8:
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))

        # RHS loop statically UNROLLED: the r2 lax.fori variant paid
        # ~7 ns of loop overhead per (tile, RHS) — more than the whole
        # shared-decode saving (measured 8.9 GFLOPS aggregate).  The
        # caller bounds chunk_tiles * n_rhs so the Mosaic compile stays
        # inside budget (whell_spmm_packed_pallas).
        for r in range(n_rhs):
            if scattered:
                h1 = None
                for wb in range(ntab):
                    winb = x_vmem[r, pl.ds(gbase_ref[gidx * ntab + wb], 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = hb if h1 is None else jnp.where(blk == wb, hb, h1)
            elif window_pages == 8:
                win = x_vmem[r, pl.ds(base, 8), :]
                h1 = jnp.take_along_axis(win, pt, axis=0)
            else:
                win = x_vmem[r, pl.ds(base, 8), :]
                h1 = jnp.take_along_axis(win, pt7, axis=0)
                for wb in range(1, ntab):
                    winb = x_vmem[r, pl.ds(base + 8 * wb, 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = jnp.where(blk == wb, hb, h1)
            g = jnp.take_along_axis(h1, res, axis=1)
            zacc[r, pl.ds(hh, 1), :, :] += (v * g)[None]

    last = cgroup_ref[c] != cgroup_ref[c + 1]

    @pl.when(last)
    def _():
        lo = seglo_ref[:].astype(jnp.int32)
        hi = seghi_ref[:].astype(jnp.int32)
        mlo = (lo >= 0)
        mhi = (hi >= 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (group_hacks, 128), 1)
        for r in range(n_rhs):  # static: n_rhs scans per group, amortised
            p = jnp.sum(zacc[r], axis=1)
            if unit_segments:  # width-1 segments: no scan, one gather
                p_hi = jnp.take_along_axis(p, jnp.maximum(hi, 0), axis=1)
                z_ref[r] = p_hi * mhi.astype(p.dtype)
                continue
            # lane rolls, not misaligned concatenates (r5, DESIGN §2c-3)
            for s in (1, 2, 4, 8, 16, 32, 64):
                p = p + jnp.where(lane_i >= s, pltpu.roll(p, s, 1),
                                  jnp.zeros_like(p))
            p_lo = jnp.take_along_axis(p, jnp.maximum(lo, 0), axis=1)
            p_hi = jnp.take_along_axis(p, jnp.maximum(hi, 0), axis=1)
            z_ref[r] = (p_hi * mhi.astype(p.dtype)
                        - p_lo * mlo.astype(p.dtype))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "n_rhs", "interpret", "unit_segments"))
def _whell_packed_spmm_call(values, residue, page_tab, seg_lo, seg_hi,
                            tile_base, chunk_group, x3d, group_bases=None,
                            *, num_tiles, num_groups, x_pages, window_pages,
                            chunk_tiles, group_hacks, n_rhs, interpret=False,
                            unit_segments=False):
    ct, gh = chunk_tiles, group_hacks
    scattered = group_bases is not None
    num_chunks = num_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if scattered else 2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
            pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x3d (n_rhs, pages, 128)
        ],
        out_specs=pl.BlockSpec(
            (n_rhs, gh, 128), lambda c, tm, cg, *_: (0, cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((n_rhs, gh, 8, 128), x3d.dtype),
            pltpu.VMEM((n_rhs, x_pages, 128), x3d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, group_bases) if scattered
           else (tile_base, chunk_group))
    return pl.pallas_call(
        functools.partial(_whell_packed_spmm_kernel,
                          window_pages=window_pages, chunk_tiles=ct,
                          group_hacks=gh, n_rhs=n_rhs, scattered=scattered,
                          unit_segments=unit_segments),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rhs, num_groups * gh, 128), x3d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128 * n_rhs,
            bytes_accessed=num_tiles * 8 * 128 * 6
            + n_rhs * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops, values, residue, page_tab, seg_lo, seg_hi, x3d)


#: Mosaic compile budget for the fused SpMM: unrolled bodies per grid
#: step = chunk_tiles * rhs_per_pass (DESIGN.md §4: >~256 unrolled tile
#: bodies push first compiles past 10 minutes)
_SPMM_UNROLL_BUDGET = 256


def whell_spmm_packed_pallas(a, x, interpret: bool = False,
                             rhs_per_pass=None):
    """Fused ``Z = A @ X`` on a packed WHELL; ``x``: ``(n_rhs, n_lane)``
    lane-space stack, returns ``(n_rhs, n_lane)``.

    The slab (values + indices) is decoded once per tile and amortised
    over ``rhs_per_pass`` statically-unrolled products; a large RHS
    block runs in multiple passes so the per-pass x copies + per-RHS
    accumulators stay inside VMEM and ``chunk_tiles * rhs_per_pass``
    inside the Mosaic unroll budget.  For maximum fusion convert with
    ``chunk_tiles=16-32`` (the default ct=128 admits only 2 RHS/pass)."""
    from spgpu_tpu.formats.whell import PanelledWhell, SegmentedWhell

    n_rhs = int(x.shape[0])
    if isinstance(a, PanelledWhell):
        z = None
        off = 0
        for p in a.panels:
            zp = whell_spmm_packed_pallas(p, x[:, off:off + p.n_cols],
                                          interpret=interpret,
                                          rhs_per_pass=rhs_per_pass)
            z = zp if z is None else z + zp
            off += p.n_cols
        return z
    if isinstance(a, SegmentedWhell):
        return jnp.concatenate([
            whell_spmm_packed_pallas(s, x, interpret=interpret,
                                     rhs_per_pass=rhs_per_pass)
            for s in a.segments], axis=1)
    itemsize = jnp.dtype(x.dtype).itemsize
    per_rhs = (a.x_pages * 128 + a.group_hacks * 8 * 128) * itemsize
    if rhs_per_pass is None:
        rhs_per_pass = n_rhs
        while rhs_per_pass > 1 and (
                rhs_per_pass * per_rhs > _X_VMEM_LIMIT_BYTES
                or a.chunk_tiles * rhs_per_pass > _SPMM_UNROLL_BUDGET):
            rhs_per_pass -= 1
    rhs_per_pass = max(1, min(rhs_per_pass,
                              _X_VMEM_LIMIT_BYTES // max(per_rhs, 1)))
    if per_rhs > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"X + accumulator for even one RHS ({per_rhs/2**20:.0f} MiB) "
            "exceeds the VMEM budget; convert with panel_x_bytes or a "
            "smaller group_hacks")
    pad = a.x_pages * 128 - a.n_cols
    x3 = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    x3 = x3.reshape(n_rhs, a.x_pages, 128)
    outs = []
    for r0 in range(0, n_rhs, rhs_per_pass):
        rp = min(rhs_per_pass, n_rhs - r0)
        z = _whell_packed_spmm_call(
            a.values, a.residue, a.page_tab, a.seg_lo, a.seg_hi,
            a.tile_base, a.chunk_group, x3[r0:r0 + rp], a.group_bases,
            num_tiles=a.num_tiles, num_groups=a.num_groups,
            x_pages=a.x_pages, window_pages=a.window_pages,
            chunk_tiles=a.chunk_tiles, group_hacks=a.group_hacks,
            n_rhs=rp, interpret=interpret,
            unit_segments=a.unit_segments,
        )
        outs.append(z.reshape(rp, -1)[:, : a.n_rows])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


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
        # bf16 value slabs upcast here: accumulate in the x/z dtype
        v = vals_ref[k * 8:(k + 1) * 8, :].astype(z_ref.dtype)
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
            pltpu.VMEM((n_rhs, x_pages, 128), x3d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_whell_spmm_kernel, n_rhs=n_rhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rhs, num_groups * 8, 8, 128), x3d.dtype
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
    nbytes = n_rhs * a.x_pages * 128 * jnp.dtype(x.dtype).itemsize
    if nbytes > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"X ({nbytes/2**20:.0f} MiB padded, {n_rhs} RHS) exceeds the "
            f"VMEM-resident limit ({_X_VMEM_LIMIT_BYTES/2**20:.0f} MiB); "
            "split the RHS block or use the loop-of-SpMV path"
        )
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
    if a.ways > 1:
        # way-split rows: sum each way group back to one true row
        acc = acc.reshape(n_rhs, a.n_rows // a.ways, a.ways).sum(axis=2)
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def _pcell_kernel(tmeta_ref, cgroup_ref, gbase_ref, vals_ref, res_ref,
                  pt_ref, rhi_ref, rlo_ref, x_hbm_ref, z_ref, zacc,
                  x_vmem, xsem, *, window_pages, chunk_tiles, group_hacks):
    """Per-cell row-routing SpMV (the round-3 kernel-family experiment;
    layout in :mod:`spgpu_tpu.convert.pcell`).

    Per tile: the usual scattered-window gather chain produces the
    contrib tile; an inclusive lane prefix scan + differencing at run
    END lanes (the ``run_hi``/``run_lo`` slabs, keyed by each run's row
    OUTPUT lane) routes every row's partial sum to its output lane; the
    routed tile accumulates into the group scratch.  The group flush is
    then a plain slot/parity sum (the WHDIA flush) — the packed
    kernel's segment scan + compaction moved from the flush into the
    per-tile path, paid for by ~0.76x the tiles (pad 1.74 -> ~1.33)."""
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
        zacc[:] = jnp.zeros_like(zacc)

    ntab = window_pages // 8
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]
        gidx = jax.lax.bitwise_and(meta, jnp.int32(0xFFFFF))
        hh = jax.lax.shift_right_logical(meta, jnp.int32(20))
        res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
        blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
        h1 = None
        for wb in range(ntab):
            winb = x_vmem[pl.ds(gbase_ref[gidx * ntab + wb], 8), :]
            hb = jnp.take_along_axis(winb, pt7, axis=0)
            h1 = hb if h1 is None else jnp.where(blk == wb, hb, h1)
        g = jnp.take_along_axis(h1, res, axis=1)
        v = vals_ref[k * 8:(k + 1) * 8, :].astype(zacc.dtype)
        p = v * g
        # inclusive lane prefix scan: 7 hardware lane ROLLS + masked adds
        # (a lane-misaligned concatenate per round measured ~30x slower —
        # Mosaic lowers it as a scalar shuffle, ~350 ns/tile)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for s in (1, 2, 4, 8, 16, 32, 64):
            p = p + jnp.where(lane_i >= s, pltpu.roll(p, s, 1),
                              jnp.zeros_like(p))
        hi = rhi_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        lo = rlo_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        p_hi = jnp.take_along_axis(p, jnp.maximum(hi, 0), axis=1)
        p_lo = jnp.take_along_axis(p, jnp.maximum(lo, 0), axis=1)
        routed = (p_hi * (hi >= 0).astype(p.dtype)
                  - p_lo * (lo >= 0).astype(p.dtype))
        zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += routed[None]

    last = cgroup_ref[c] != cgroup_ref[c + 1]

    @pl.when(last)
    def _():
        acc = zacc[:].reshape(2, group_hacks, 8, 128)
        z_ref[:] = acc.sum(axis=(0, 2))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "interpret"))
def _pcell_spmv_call(values, residue, page_tab, run_hi, run_lo,
                     tile_base, chunk_group, group_bases, x2d, *,
                     num_tiles, num_groups, x_pages, window_pages,
                     chunk_tiles, group_hacks, interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
        ],
        out_specs=pl.BlockSpec((gh, 128), lambda c, tm, cg, *_: (cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * gh, 8, 128), x2d.dtype),
            pltpu.VMEM((x_pages, 128), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_pcell_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * gh, 128), x2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 8 + x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, group_bases, values, residue, page_tab,
      run_hi, run_lo, x2d)


def pcell_spmv_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                      interpret: bool = False):
    """``z = beta*y + alpha*(A @ x)`` on the per-cell-routing layout;
    x and z are ORIGINAL-space vectors (no lane embedding)."""
    x2d = _prep_x(x, a.n_cols, a.x_pages)
    z = _pcell_spmv_call(
        a.values, a.residue, a.page_tab, a.run_hi, a.run_lo,
        a.tile_base, a.chunk_group, a.group_bases, x2d,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        window_pages=a.window_pages, chunk_tiles=a.chunk_tiles,
        group_hacks=a.group_hacks, interpret=interpret,
    )
    acc = z.reshape(-1)[: a.n_rows]
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def _whdia_tile_r0(tr0_ref, t, siota):
    """Rebuild a tile's (8, 128) r0 from ONE packed scalar (pattern
    mode, r4): the tile's filled slots form an arithmetic progression
    ``r0[s] = r00 + step*min(s, F-1)`` (dead slots repeat the last
    filled — their values are zero so their gathers are inert).  Word
    layout: ``(step+4096) << 19 | (F-1) << 16 | (r00+1024)``.  Cost: 3
    scalar splats + min/mul/add — replaces the 2 B/cell lane-replicated
    slab stream."""
    wv = tr0_ref[t]
    r00 = jax.lax.bitwise_and(wv, jnp.int32(0xFFFF)) - jnp.int32(1024)
    f1 = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(wv, jnp.int32(16)), jnp.int32(0x7))
    step = jax.lax.bitwise_and(
        jax.lax.shift_right_logical(wv, jnp.int32(19)),
        jnp.int32(0x1FFF)) - jnp.int32(4096)
    return r00 + step * jnp.minimum(siota, f1)


def _whdia_kernel(*refs, window_pages,
                  chunk_tiles=_WHDIA_CT, group_hacks=32, pat_mode=False):
    if pat_mode:
        (tmeta_ref, cgroup_ref, tr0_ref, vals_ref,
         x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    else:
        (tmeta_ref, cgroup_ref, vals_ref, r0_ref,
         x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    return _whdia_kernel_body(
        tmeta_ref, cgroup_ref,
        (tr0_ref if pat_mode else r0_ref), vals_ref,
        x_hbm_ref, z_ref, zacc, x_vmem, xsem, window_pages=window_pages,
        chunk_tiles=chunk_tiles, group_hacks=group_hacks, pat_mode=pat_mode)


def _whdia_kernel_body(tmeta_ref, cgroup_ref, r0_src, vals_ref,
                       x_hbm_ref, z_ref, zacc, x_vmem, xsem, *, window_pages,
                       chunk_tiles=_WHDIA_CT, group_hacks=32,
                       pat_mode=False):
    """WHDIA SpMV: near-values-only traffic.  Each slot's x window is the
    contiguous rotation x[h*128 + d + lane]; both gather index sets are
    reconstructed arithmetically from r0 (see formats/whdia.py), which is
    streamed as a lane-replicated int16 slab so every per-tile op is a
    vector op — the earlier per-slot SMEM scalars cost an 8-load unpack
    chain per tile that left the kernel latency-bound.

    Accumulation mirrors the packed-WHELL kernel: even/odd tiles RMW
    DISJOINT dual VMEM scratch planes (breaking the serialised per-tile
    read-modify-write chain), and the last chunk of each group flushes
    the plane+slot sum into a (group_hacks, 128) output block — the
    slot reduction that used to run as a post-kernel ``sum(axis=1)``
    over an 8x larger HBM output now happens in VMEM, cutting z write
    traffic 8x (~25% of total on banded configs)."""
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
        zacc[:] = jnp.zeros_like(zacc)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    siota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]  # base page | hack-in-group << 16
        base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        if pat_mode:
            r0 = _whdia_tile_r0(r0_src, t, siota)
        else:
            r0 = r0_src[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
        rr = jax.lax.bitwise_and(r0, jnp.int32(127))
        # rotation bijection: residue l comes from page rq (+1 if l < rr)
        pt = jnp.clip(rq + (lane < rr).astype(jnp.int32), 0, window_pages - 1)
        idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))
        win8 = x_vmem[pl.ds(base, 8), :]
        if window_pages == 8:
            h1 = jnp.take_along_axis(win8, pt, axis=0)
        else:
            # wide windows: select among window_pages/8 aligned 8-page
            # sublane-gather tables by the high bits of pt (the packed-
            # WHELL select tree) — admits diagonal spreads up to
            # (window_pages-2)*128 per tile
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
            h1 = jnp.take_along_axis(win8, pt7, axis=0)
            for wb in range(1, window_pages // 8):
                winb = x_vmem[pl.ds(base + 8 * wb, 8), :]
                hb = jnp.take_along_axis(winb, pt7, axis=0)
                h1 = jnp.where(blk == wb, hb, h1)
        g = jnp.take_along_axis(h1, idx, axis=1)
        contrib = vals_ref[k * 8:(k + 1) * 8, :] * g
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        zacc[pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += contrib[None]

    # flush: last chunk of this group (chunk_group has no trailing
    # sentinel, so the lookahead is clamped to the final chunk, which is
    # always a flush)
    nc = pl.num_programs(0)
    last = jnp.logical_or(
        c == nc - 1, cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

    @pl.when(last)
    def _():
        acc = zacc[:].reshape(2, group_hacks, 8, 128)
        z_ref[:] = acc.sum(axis=(0, 2))


@functools.partial(jax.jit, static_argnames=("num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles", "group_hacks", "pat_mode", "interpret"))
def _whdia_spmv_call(values, slot_r0, tile_base, chunk_group,
                     x2d, tile_r0=None, *, num_tiles, num_groups, x_pages,
                     window_pages=8, chunk_tiles=_WHDIA_CT, group_hacks=32,
                     pat_mode=False, interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    pat = pat_mode
    in_specs = [
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
    ]
    if not pat:
        in_specs.insert(0, pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if pat else 2,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (gh, 128), (lambda c, tm, cg, tr: (cg[c], 0)) if pat
            else (lambda c, tm, cg: (cg[c], 0))
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * gh, 8, 128), values.dtype),  # dual accumulators
            pltpu.VMEM((x_pages, 128), values.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, tile_r0, values, x2d) if pat
           else (tile_base, chunk_group, values, slot_r0, x2d))
    return pl.pallas_call(
        functools.partial(_whdia_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh, pat_mode=pat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * gh, 128), values.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * (4 if pat else 6)
            + x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops)


def whdia_spmv_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                      interpret: bool = False):
    """``z = beta*y + alpha*(A @ x)`` on the WHDIA layout; semantics
    match ``spgpu?hdiaspmv`` (``hdia_spmv_base.cuh:114-127``)."""
    from spgpu_tpu.formats.whdia import BlockedWhdia

    if isinstance(a, BlockedWhdia):
        # row blocks (x beyond VMEM / scalars beyond SMEM): each block
        # reads its own column window of x; partial z's concatenate
        z = jnp.concatenate([
            whdia_spmv_pallas(b, x[off:off + b.n_cols],
                              interpret=interpret)
            for b, off in zip(a.blocks, a.col_offs)])
        is_zero = isinstance(beta, (int, float)) and beta == 0
        if is_zero or y is None:
            return z if isinstance(alpha, (int, float)) and alpha == 1 else alpha * z
        return alpha * z + beta * y

    x2d = _prep_x(x, a.n_cols, a.x_pages)
    z = _whdia_spmv_call(
        a.values, a.slot_r0, a.tile_base, a.chunk_group, x2d, a.tile_r0,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        window_pages=a.window_pages, chunk_tiles=a.chunk_tiles,
        group_hacks=a.group_hacks,
        pat_mode=a.tile_r0 is not None,
        interpret=interpret,
    )
    acc = z.reshape(-1)[: a.n_rows]
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def _whdia_spmm_kernel(*refs, window_pages, chunk_tiles, group_hacks,
                       n_rhs, pat_mode=False):
    """Fused multi-RHS WHDIA SpMM: WHDIA is the VALUES-ONLY-traffic
    format (4 B value + 2 B r0 per cell, indices reconstructed
    arithmetically), so sharing one slab read + decode across ``n_rhs``
    statically-unrolled products cuts per-product HBM traffic up to
    ``n_rhs``× — where the packed-WHELL fused win was only ~1.14×
    (it shares decode, not much traffic).  Reference bar: the host
    m-loop ``sdot.cu:167-175`` costs exactly N×single."""
    if pat_mode:
        (tmeta_ref, cgroup_ref, tr0_ref, vals_ref,
         x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
    else:
        (tmeta_ref, cgroup_ref, vals_ref, r0_ref,
         x_hbm_ref, z_ref, zacc, x_vmem, xsem) = refs
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
        zacc[:] = jnp.zeros_like(zacc)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    siota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]
        base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        # decode ONCE per tile, shared by every RHS
        if pat_mode:
            r0 = _whdia_tile_r0(tr0_ref, t, siota)
        else:
            r0 = r0_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
        rr = jax.lax.bitwise_and(r0, jnp.int32(127))
        pt = jnp.clip(rq + (lane < rr).astype(jnp.int32), 0,
                      window_pages - 1)
        idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))
        v = vals_ref[k * 8:(k + 1) * 8, :]
        if window_pages > 8:
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
        for r in range(n_rhs):
            win8 = x_vmem[r, pl.ds(base, 8), :]
            if window_pages == 8:
                h1 = jnp.take_along_axis(win8, pt, axis=0)
            else:
                h1 = jnp.take_along_axis(win8, pt7, axis=0)
                for wb in range(1, window_pages // 8):
                    winb = x_vmem[r, pl.ds(base + 8 * wb, 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = jnp.where(blk == wb, hb, h1)
            g = jnp.take_along_axis(h1, idx, axis=1)
            zacc[r, pl.ds(hh + (k % 2) * group_hacks, 1), :, :] += \
                (v * g)[None]

    nc = pl.num_programs(0)
    last = jnp.logical_or(
        c == nc - 1, cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

    @pl.when(last)
    def _():
        for r in range(n_rhs):
            acc = zacc[r].reshape(2, group_hacks, 8, 128)
            z_ref[r] = acc.sum(axis=(0, 2))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "n_rhs", "pat_mode", "interpret"))
def _whdia_spmm_call(values, slot_r0, tile_base, chunk_group, x3d,
                     tile_r0=None, *,
                     num_tiles, num_groups, x_pages, window_pages=8,
                     chunk_tiles=_WHDIA_CT, group_hacks=32, n_rhs=1,
                     pat_mode=False, interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    pat = pat_mode
    in_specs = [
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # x3d (n_rhs, pages, 128)
    ]
    if not pat:
        in_specs.insert(0, pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if pat else 2,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_rhs, gh, 128), (lambda c, tm, cg, tr: (0, cg[c], 0)) if pat
            else (lambda c, tm, cg: (0, cg[c], 0))),
        scratch_shapes=[
            pltpu.VMEM((n_rhs, 2 * gh, 8, 128), values.dtype),
            pltpu.VMEM((n_rhs, x_pages, 128), values.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, tile_r0, values, x3d) if pat
           else (tile_base, chunk_group, values, slot_r0, x3d))
    return pl.pallas_call(
        functools.partial(_whdia_spmm_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh, n_rhs=n_rhs,
                          pat_mode=pat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rhs, num_groups * gh, 128), values.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * 8 * 128 * n_rhs,
            bytes_accessed=num_tiles * 8 * 128 * (4 if pat else 6)
            + n_rhs * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops)


def whdia_spmm_pallas(a, x, interpret: bool = False, rhs_per_pass=None):
    """Fused ``Z = A @ X`` on a WHDIA layout; ``x``: ``(n_rhs, n_cols)``,
    returns ``(n_rhs, n_rows)``.  Values-only traffic shared across
    statically-unrolled RHS; a large block runs in VMEM/compile-budget
    passes (same scheme as :func:`whell_spmm_packed_pallas`)."""
    from spgpu_tpu.formats.whdia import BlockedWhdia

    n_rhs = int(x.shape[0])
    if isinstance(a, BlockedWhdia):
        return jnp.concatenate([
            whdia_spmm_pallas(b, x[:, off:off + b.n_cols],
                              interpret=interpret,
                              rhs_per_pass=rhs_per_pass)
            for b, off in zip(a.blocks, a.col_offs)], axis=1)
    itemsize = jnp.dtype(x.dtype).itemsize
    per_rhs = (a.x_pages * 128 + 2 * a.group_hacks * 8 * 128) * itemsize
    if per_rhs > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"X + accumulator for even one RHS ({per_rhs/2**20:.0f} MiB) "
            "exceeds the VMEM budget; use BlockedWhdia row blocks")
    if rhs_per_pass is None:
        rhs_per_pass = n_rhs
        while rhs_per_pass > 1 and (
                rhs_per_pass * per_rhs > _X_VMEM_LIMIT_BYTES
                or a.chunk_tiles * rhs_per_pass > _SPMM_UNROLL_BUDGET):
            rhs_per_pass -= 1
    if interpret:
        # interpret mode (CI): the emulated unrolled body compiles
        # through XLA:CPU, whose compiler has segfaulted on very large
        # fused programs late in a long test session — keep the
        # per-pass program small (no perf surface off-TPU)
        rhs_per_pass = min(rhs_per_pass, 2)
    rhs_per_pass = max(1, min(rhs_per_pass, n_rhs))
    pad = a.x_pages * 128 - a.n_cols
    x3 = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    x3 = x3.reshape(n_rhs, a.x_pages, 128)
    outs = []
    for r0 in range(0, n_rhs, rhs_per_pass):
        rp = min(rhs_per_pass, n_rhs - r0)
        z = _whdia_spmm_call(
            a.values, a.slot_r0, a.tile_base, a.chunk_group,
            x3[r0:r0 + rp], a.tile_r0,
            num_tiles=a.num_tiles, num_groups=a.num_groups,
            x_pages=a.x_pages, window_pages=a.window_pages,
            chunk_tiles=a.chunk_tiles, group_hacks=a.group_hacks,
            n_rhs=rp, pat_mode=a.tile_r0 is not None,
            interpret=interpret,
        )
        outs.append(z.reshape(rp, -1)[:, : a.n_rows])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _whdia_cplx_kernel(*refs, window_pages, chunk_tiles=_WHDIA_CT,
                       group_hacks=32, pat_mode=False):
    """ONE-PASS complex WHDIA SpMV (r5): both value planes stream
    together, the r0/pt/idx decode runs ONCE per tile (the plane-pair
    path ran it 4x), xr/xi gather through the shared index sets, and
    the four real fmas land in re/im accumulator planes — the TPU
    answer to the reference's single-kernel complex fma
    (``hell_cspmv.cu:29``, ``cuCfmaf`` via ``mathbase.cuh:17,39``;
    HDIA C/Z instantiation ``hdia_cspmv.cu``/``hdia_zspmv.cu``).
    Traffic: 8 B/cell (+2 shared r0 in slab mode) vs the plane-pair
    path's 16 B/cell (each plane slab read twice)."""
    if pat_mode:
        (tmeta_ref, cgroup_ref, tr0_ref, vr_ref, vi_ref,
         xr_hbm, xi_hbm, z_ref, zacc_r, zacc_i, xr_vmem, xi_vmem,
         sem_r, sem_i) = refs
        r0_src = tr0_ref
    else:
        (tmeta_ref, cgroup_ref, vr_ref, vi_ref, r0_ref,
         xr_hbm, xi_hbm, z_ref, zacc_r, zacc_i, xr_vmem, xi_vmem,
         sem_r, sem_i) = refs
        r0_src = r0_ref
    gh = group_hacks
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        d1 = pltpu.make_async_copy(xr_hbm, xr_vmem, sem_r)
        d2 = pltpu.make_async_copy(xi_hbm, xi_vmem, sem_i)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

    first = jnp.logical_or(
        c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)]
    )

    @pl.when(first)
    def _():
        zacc_r[:] = jnp.zeros_like(zacc_r)
        zacc_i[:] = jnp.zeros_like(zacc_i)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    siota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        meta = tmeta_ref[t]
        base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
        if pat_mode:
            r0 = _whdia_tile_r0(r0_src, t, siota)
        else:
            r0 = r0_src[k * 8:(k + 1) * 8, :].astype(jnp.int32)
        rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
        rr = jax.lax.bitwise_and(r0, jnp.int32(127))
        pt = jnp.clip(rq + (lane < rr).astype(jnp.int32), 0,
                      window_pages - 1)
        idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))
        if window_pages == 8:
            pt7, blk = pt, None
        else:
            pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
            blk = jax.lax.shift_right_logical(pt, jnp.int32(3))

        def wgather(x_vmem):
            win8 = x_vmem[pl.ds(base, 8), :]
            h1 = jnp.take_along_axis(win8, pt7, axis=0)
            if window_pages != 8:
                for wb in range(1, window_pages // 8):
                    winb = x_vmem[pl.ds(base + 8 * wb, 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = jnp.where(blk == wb, hb, h1)
            return jnp.take_along_axis(h1, idx, axis=1)

        gr = wgather(xr_vmem)
        gi = wgather(xi_vmem)
        vr = vr_ref[k * 8:(k + 1) * 8, :]
        vi = vi_ref[k * 8:(k + 1) * 8, :]
        hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
        sl = pl.ds(hh + (k % 2) * gh, 1)
        zacc_r[sl, :, :] += (vr * gr - vi * gi)[None]
        zacc_i[sl, :, :] += (vr * gi + vi * gr)[None]

    nc = pl.num_programs(0)
    last = jnp.logical_or(
        c == nc - 1, cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

    @pl.when(last)
    def _():
        z_ref[0] = zacc_r[:].reshape(2, gh, 8, 128).sum(axis=(0, 2))
        z_ref[1] = zacc_i[:].reshape(2, gh, 8, 128).sum(axis=(0, 2))


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "pat_mode", "interpret"))
def _whdia_cplx_call(vr, vi, slot_r0, tile_base, chunk_group,
                     xr2d, xi2d, tile_r0=None, *, num_tiles, num_groups,
                     x_pages, window_pages=8, chunk_tiles=_WHDIA_CT,
                     group_hacks=32, pat_mode=False, interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    pat = pat_mode
    in_specs = [
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # vr
        pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # vi
        pl.BlockSpec(memory_space=pl.ANY),  # xr (HBM, staged once)
        pl.BlockSpec(memory_space=pl.ANY),  # xi
    ]
    if not pat:
        in_specs.insert(2, pl.BlockSpec((ct * 8, 128),
                                        lambda c, *_: (c, 0)))  # r0 slab
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if pat else 2,
        grid=(num_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, gh, 128), (lambda c, tm, cg, tr: (0, cg[c], 0)) if pat
            else (lambda c, tm, cg: (0, cg[c], 0))
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * gh, 8, 128), vr.dtype),  # re dual planes
            pltpu.VMEM((2 * gh, 8, 128), vr.dtype),  # im dual planes
            pltpu.VMEM((x_pages, 128), vr.dtype),
            pltpu.VMEM((x_pages, 128), vr.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    ops = ((tile_base, chunk_group, tile_r0, vr, vi, xr2d, xi2d) if pat
           else (tile_base, chunk_group, vr, vi, slot_r0, xr2d, xi2d))
    return pl.pallas_call(
        functools.partial(_whdia_cplx_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh, pat_mode=pat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_groups * gh, 128), vr.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * (8 if pat else 10)
            + 2 * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(*ops)


def whdia_spmv_cplx_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                           interpret: bool = False):
    """Fused one-pass complex WHDIA SpMV on a
    :class:`~spgpu_tpu.formats.cplanes.ComplexPlanes` whose planes are
    plain :class:`WhdiaMatrix` (C precision).  ``x``: ``(2, n)``
    [re, im] stack; returns the same.  Z (dd) and blocked layouts take
    the plane-product path."""
    ar, ai = a.ar, a.ai
    xr2d = _prep_x(x[0], ar.n_cols, ar.x_pages)
    xi2d = _prep_x(x[1], ar.n_cols, ar.x_pages)
    z = _whdia_cplx_call(
        ar.values, ai.values, ar.slot_r0, ar.tile_base, ar.chunk_group,
        xr2d, xi2d, ar.tile_r0,
        num_tiles=ar.num_tiles, num_groups=ar.num_groups,
        x_pages=ar.x_pages, window_pages=ar.window_pages,
        chunk_tiles=ar.chunk_tiles, group_hacks=ar.group_hacks,
        pat_mode=ar.tile_r0 is not None, interpret=interpret)
    zz = z.reshape(2, -1)[:, : ar.n_rows]
    from spgpu_tpu.ops import _complex_epilogue

    return _complex_epilogue(zz, alpha, beta, y, is_dd=False)


def _whdia_z_kernel(tmeta_ref, cgroup_ref, arh_ref, arl_ref, aih_ref,
                    ail_ref, r0_ref, x_hbm_ref, z_ref, zacc, x_vmem,
                    xsem, *, window_pages, chunk_tiles, group_hacks,
                    interpret):
    """ONE-PASS Z (complex128 = dd-complex) WHDIA SpMV (r5): the four
    dd value slabs stream together, the r0 decode runs once per tile
    (the plane path ran it 8x across 4 dd products), the four x planes
    (xr/xi × hi/lo) gather through shared index sets, and the four
    error-free dd products combine into re/im dd accumulators —
    ``hdia_zspmv.cu`` one-pass ``cuCfma`` parity at D precision.
    Traffic: 18 B/cell (4 fp32 slabs + shared r0) vs the plane path's
    40 (each dd slab pair read twice + 4 r0 streams)."""
    with __import__("contextlib").ExitStack() as _stack:
        from spgpu_tpu.ops import dd as _ddmod

        if not interpret:
            _stack.enter_context(_ddmod.unguarded())
        from spgpu_tpu.ops.dd import dd_add_dd, two_prod, two_sum, \
            fast_two_sum

        gh = group_hacks
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
            dma.start()
            dma.wait()

        first = jnp.logical_or(
            c == 0, cgroup_ref[c] != cgroup_ref[jnp.maximum(c - 1, 0)])

        @pl.when(first)
        def _():
            zacc[:] = jnp.zeros_like(zacc)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for k in range(chunk_tiles):
            t = c * chunk_tiles + k
            meta = tmeta_ref[t]
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            r0 = r0_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
            rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
            rr = jax.lax.bitwise_and(r0, jnp.int32(127))
            pt = jnp.clip(rq + (lane < rr).astype(jnp.int32),
                          0, window_pages - 1)
            idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))

            def wgather(plane):
                win = x_vmem[plane, pl.ds(base, 8), :]
                if window_pages == 8:
                    h1 = jnp.take_along_axis(win, pt, axis=0)
                else:
                    pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
                    blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
                    h1 = jnp.take_along_axis(win, pt7, axis=0)
                    for wb in range(1, window_pages // 8):
                        winb = x_vmem[plane, pl.ds(base + 8 * wb, 8), :]
                        hb = jnp.take_along_axis(winb, pt7, axis=0)
                        h1 = jnp.where(blk == wb, hb, h1)
                return jnp.take_along_axis(h1, idx, axis=1)

            # x planes: 0 xr_hi, 1 xr_lo, 2 xi_hi, 3 xi_lo
            xrh, xrl = wgather(0), wgather(1)
            xih, xil = wgather(2), wgather(3)
            arh = arh_ref[k * 8:(k + 1) * 8, :]
            arl = arl_ref[k * 8:(k + 1) * 8, :]
            aih = aih_ref[k * 8:(k + 1) * 8, :]
            ail = ail_ref[k * 8:(k + 1) * 8, :]

            def ddprod(vh, vl, gh_, gl_):
                p, e = two_prod(vh, gh_)
                return p, e + (vh * gl_ + vl * gh_)

            p1h, p1l = ddprod(arh, arl, xrh, xrl)  # Ar*xr
            p2h, p2l = ddprod(aih, ail, xih, xil)  # Ai*xi
            p3h, p3l = ddprod(arh, arl, xih, xil)  # Ar*xi
            p4h, p4l = ddprod(aih, ail, xrh, xrl)  # Ai*xr
            crh, crl = dd_add_dd(p1h, p1l, -p2h, -p2l)  # re contrib
            cih, cil = dd_add_dd(p3h, p3l, p4h, p4l)    # im contrib
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
            # zacc planes: 0 re_hi, 1 re_lo, 2 im_hi, 3 im_lo
            for ph, (nch, ncl) in ((0, (crh, crl)), (2, (cih, cil))):
                ah = zacc[ph, pl.ds(hh, 1), :, :]
                al = zacc[ph + 1, pl.ds(hh, 1), :, :]
                s, e2 = two_sum(ah, nch[None])
                nh, nl = fast_two_sum(s, e2 + al + ncl[None])
                zacc[ph, pl.ds(hh, 1), :, :] = nh
                zacc[ph + 1, pl.ds(hh, 1), :, :] = nl

        nc = pl.num_programs(0)
        last = jnp.logical_or(
            c == nc - 1,
            cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

        @pl.when(last)
        def _():
            for ph in (0, 2):  # re / im dd slot sums
                yh = zacc[ph, :, 0]
                yl = zacc[ph + 1, :, 0]
                for s in range(1, 8):
                    yh, yl = dd_add_dd(yh, yl, zacc[ph, :, s],
                                       zacc[ph + 1, :, s])
                z_ref[ph] = yh
                z_ref[ph + 1] = yl


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "interpret"))
def _whdia_z_call(arh, arl, aih, ail, slot_r0, tile_base, chunk_group,
                  x4d, *, num_tiles, num_groups, x_pages, window_pages=8,
                  chunk_tiles=_WHDIA_CT, group_hacks=32, interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # ar hi
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # ar lo
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # ai hi
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # ai lo
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),  # r0 slab
            pl.BlockSpec(memory_space=pl.ANY),  # x4d (4, pages, 128)
        ],
        out_specs=pl.BlockSpec((4, gh, 128),
                               lambda c, tm, cg: (0, cg[c], 0)),
        scratch_shapes=[
            pltpu.VMEM((4, gh, 8, 128), jnp.float32),
            pltpu.VMEM((4, x_pages, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_whdia_z_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, num_groups * gh, 128),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 18
            + 4 * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, arh, arl, aih, ail, slot_r0, x4d)


def whdia_spmv_z_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                        interpret: bool = False):
    """Fused one-pass Z (complex128) WHDIA SpMV on a
    :class:`~spgpu_tpu.formats.cplanes.ComplexPlanes` whose planes are
    dd :class:`WhdiaMatrix` (slab r0 mode — dd conversions always keep
    the slab).  ``x``: ``(2, 2, n)`` [re, im] x [hi, lo] stack; returns
    the same."""
    ar, ai = a.ar, a.ai
    xp = [_prep_x(x[p, w], ar.n_cols, ar.x_pages)
          for p in (0, 1) for w in (0, 1)]
    x4d = jnp.stack(xp)  # xr_hi, xr_lo, xi_hi, xi_lo
    # the Z body unrolls ~2x the dd kernel's ops: halve the chunk to
    # keep the Mosaic compile inside the dd budget (verify-skill notes).
    # chunk_group is per ORIGINAL chunk — re-expand it to the smaller
    # chunk granularity (sub-chunks inherit their chunk's group id;
    # group boundaries sit on original chunk boundaries)
    ct = ar.chunk_tiles
    while ct > 16:
        ct //= 2
    cg = ar.chunk_group if ct == ar.chunk_tiles else jnp.repeat(
        ar.chunk_group, ar.chunk_tiles // ct)
    z = _whdia_z_call(
        ar.values, ar.values_lo, ai.values, ai.values_lo, ar.slot_r0,
        ar.tile_base, cg, x4d,
        num_tiles=ar.num_tiles, num_groups=ar.num_groups,
        x_pages=ar.x_pages, window_pages=ar.window_pages,
        chunk_tiles=ct, group_hacks=ar.group_hacks, interpret=interpret)
    zz = z.reshape(2, 2, -1)[:, :, : ar.n_rows]
    from spgpu_tpu.ops import _complex_epilogue

    return _complex_epilogue(zz, alpha, beta, y, is_dd=True)


def _whdia_dd_kernel(tmeta_ref, cgroup_ref, vh_ref, vl_ref, r0_ref,
                     x_hbm_ref, z_ref, zacc, x_vmem, xsem, *, window_pages,
                     chunk_tiles, group_hacks, interpret):
    """Double-float WHDIA SpMV (D-precision parity with hdia_dspmv.cu).

    Same index arithmetic as :func:`_whdia_kernel`; values and x are
    (hi, lo) fp32 pairs and accumulation is error-free (ops/dd.py).
    Even/odd tiles accumulate into DISJOINT dual VMEM scratch planes
    (the fp32 kernel's RMW-chain break), and the group flush reduces
    parity planes + 8 slot positions error-free in VMEM, writing a
    (2, group_hacks, 128) block — 8x less z traffic than the old
    (2, ·, 8, 128) output with its XLA dd epilogue."""
    with __import__("contextlib").ExitStack() as _stack:
        from spgpu_tpu.ops import dd as _ddmod

        if not interpret:
            _stack.enter_context(_ddmod.unguarded())
        from spgpu_tpu.ops.dd import (dd_add_dd, fast_two_sum, two_prod,
                                      two_sum)

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
            zacc[:] = jnp.zeros_like(zacc)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for k in range(chunk_tiles):
            t = c * chunk_tiles + k
            meta = tmeta_ref[t]
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            r0 = r0_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
            rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
            rr = jax.lax.bitwise_and(r0, jnp.int32(127))
            pt = jnp.clip(rq + (lane < rr).astype(jnp.int32),
                          0, window_pages - 1)
            idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))

            def window_gather(plane):
                win = x_vmem[plane, pl.ds(base, 8), :]
                if window_pages == 8:
                    h1 = jnp.take_along_axis(win, pt, axis=0)
                else:
                    pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
                    blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
                    h1 = jnp.take_along_axis(win, pt7, axis=0)
                    for wb in range(1, window_pages // 8):
                        winb = x_vmem[plane, pl.ds(base + 8 * wb, 8), :]
                        hb = jnp.take_along_axis(winb, pt7, axis=0)
                        h1 = jnp.where(blk == wb, hb, h1)
                return jnp.take_along_axis(h1, idx, axis=1)

            g_hi = window_gather(0)
            g_lo = window_gather(1)
            vh = vh_ref[k * 8:(k + 1) * 8, :]
            vl = vl_ref[k * 8:(k + 1) * 8, :]
            p, e = two_prod(vh, g_hi)
            e = e + (vh * g_lo + vl * g_hi)
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
            slot = hh + (k % 2) * group_hacks
            ah = zacc[0, pl.ds(slot, 1), :, :]
            al = zacc[1, pl.ds(slot, 1), :, :]
            s, e2 = two_sum(ah, p[None])
            nh, nl = fast_two_sum(s, e2 + al + e[None])
            zacc[0, pl.ds(slot, 1), :, :] = nh
            zacc[1, pl.ds(slot, 1), :, :] = nl

        nc = pl.num_programs(0)
        last = jnp.logical_or(
            c == nc - 1,
            cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

        @pl.when(last)
        def _():
            gh = group_hacks
            acch = zacc[0].reshape(2, gh, 8, 128)
            accl = zacc[1].reshape(2, gh, 8, 128)
            hi, lo = dd_add_dd(acch[0], accl[0], acch[1], accl[1])
            ph, plo = hi[:, 0], lo[:, 0]
            for s in range(1, 8):
                ph, plo = dd_add_dd(ph, plo, hi[:, s], lo[:, s])
            z_ref[0] = ph
            z_ref[1] = plo


@functools.partial(jax.jit, static_argnames=(
    "num_tiles", "num_groups", "x_pages", "window_pages", "chunk_tiles",
    "group_hacks", "interpret"))
def _whdia_dd_call(values, values_lo, slot_r0, tile_base, chunk_group,
                   x3d, *, num_tiles, num_groups, x_pages,
                   window_pages=8, chunk_tiles=_WHDIA_CT, group_hacks=32,
                   interpret=False):
    ct, gh = chunk_tiles, group_hacks
    num_chunks = num_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x3d (2, pages, 128)
        ],
        out_specs=pl.BlockSpec(
            (2, gh, 128), lambda c, tm, cg: (0, cg[c], 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * gh, 8, 128), jnp.float32),  # dual dd planes
            pltpu.VMEM((2, x_pages, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_whdia_dd_kernel, window_pages=window_pages,
                          chunk_tiles=ct, group_hacks=gh,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (2, num_groups * gh, 128), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * num_tiles * 8 * 128,
            bytes_accessed=num_tiles * 8 * 128 * 10 + 2 * x_pages * 128 * 4,
            transcendentals=0,
        ),
    )(tile_base, chunk_group, values, values_lo, slot_r0, x3d)


def whdia_spmv_dd_pallas(a, x_pair, interpret: bool = False):
    """Double-float WHDIA SpMV; ``x_pair``: ``(2, n_cols)`` fp32 stack."""
    if not a.is_dd:
        raise ValueError("whdia_spmv_dd requires dd values "
                         "(coo_to_whdia on float64)")
    from spgpu_tpu.formats.whdia import BlockedWhdia

    if isinstance(a, BlockedWhdia):
        return jnp.concatenate([
            whdia_spmv_dd_pallas(b, x_pair[:, off:off + b.n_cols],
                                 interpret=interpret)
            for b, off in zip(a.blocks, a.col_offs)], axis=1)

    pad = a.x_pages * 128 - a.n_cols
    xp = jnp.pad(x_pair, ((0, 0), (0, pad))) if pad else x_pair
    x3d = xp.reshape(2, a.x_pages, 128)
    z = _whdia_dd_call(
        a.values, a.values_lo, a.slot_r0, a.tile_base, a.chunk_group, x3d,
        num_tiles=a.num_tiles, num_groups=a.num_groups, x_pages=a.x_pages,
        window_pages=a.window_pages, chunk_tiles=a.chunk_tiles,
        group_hacks=a.group_hacks, interpret=interpret,
    )
    return z.reshape(2, -1)[:, : a.n_rows]


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
                      interpret: bool = False, pipeline: int = 1):
    """``z = beta*y + alpha*(A @ x)`` on the WHELL layout.

    Semantics match ``spgpu?hellspmv`` (``hell_spmv_base.cuh:103-157``):
    static ``beta == 0`` never reads ``y``; a row permutation (OELL) is
    applied on the output.  Single-RHS; see :func:`whell_spmm_pallas`
    for the fused multi-RHS variant.  ``pipeline`` (packed layout only)
    selects the software-pipelined kernel schedules (DESIGN §2f: the
    measured effect is ~1%, i.e. Mosaic already schedules across the
    unrolled tile bodies; 1 = loads one tile ahead, the best-of-sweep
    default).
    """
    from spgpu_tpu.formats.whell import PanelledWhell, SegmentedWhell

    if isinstance(a, PanelledWhell):
        # column panels: each panel's product runs on its x slice; the
        # flushed outputs add exactly (segment scan is linear)
        z = None
        off = 0
        for p in a.panels:
            zp = whell_spmv_pallas(p, x[off:off + p.n_cols],
                                   interpret=interpret)
            z = zp if z is None else z + zp
            off += p.n_cols
        is_zero = isinstance(beta, (int, float)) and beta == 0
        if is_zero or y is None:
            return z if isinstance(alpha, (int, float)) and alpha == 1 else alpha * z
        return alpha * z + beta * y

    if isinstance(a, SegmentedWhell):
        # row segments (SMEM-budget splits): every segment reads the
        # same x; the partial z vectors concatenate (contiguous rows)
        z = jnp.concatenate([
            whell_spmv_pallas(s, x, interpret=interpret)
            for s in a.segments])
        is_zero = isinstance(beta, (int, float)) and beta == 0
        if is_zero or y is None:
            return z if isinstance(alpha, (int, float)) and alpha == 1 else alpha * z
        return alpha * z + beta * y

    x2d = _prep_x(x, a.n_cols, a.x_pages)
    if a.seg_lo is not None:
        # packed-lane layout: x and z live in lane space (a.embed /
        # a.extract map original vectors in and out; solvers run in lane
        # space end-to-end)
        z = _whell_packed_call(
            a.values, a.residue, a.page_tab, a.seg_lo, a.seg_hi,
            a.tile_base, a.chunk_group, x2d, a.group_bases,
            num_tiles=a.num_tiles, num_groups=a.num_groups,
            x_pages=a.x_pages, window_pages=a.window_pages,
            chunk_tiles=a.chunk_tiles, group_hacks=a.group_hacks,
            pipeline=pipeline, interpret=interpret,
            unit_segments=a.unit_segments,
        )
        acc = z.reshape(-1)[: a.n_rows]
        is_zero = isinstance(beta, (int, float)) and beta == 0
        if is_zero or y is None:
            return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
        return alpha * acc + beta * y
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


# ---------------------------------------------------------------------------
# SDIA — static-offset DIA (stencil matrices).  Parity target:
# spgpu?diaspmv (dia_spmv_base_template.cuh).  The CUDA kernel stages the
# offset list in shared memory and bound-checks every element; here the
# offsets are compile-time constants, so each diagonal costs ONE dynamic
# sublane-aligned slice of VMEM-resident x plus ONE static lane rotation
# (two static slices + concat) and an fma — no gathers, no page tables,
# no bound checks (out-of-range cells are zeros in the value planes and
# the x margins are zero-padded).  Traffic is values-only: 4 B/cell.


def _sdia_kernel(vals_ref, x_hbm_ref, z_ref, x_vmem, xsem, *,
                 offsets, margin_sub, chunk_tiles):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()

    zdt = z_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        acc = None
        for j, o in enumerate(offsets):
            q, r = divmod(int(o) + margin_sub * 128, 128)
            a = x_vmem[pl.ds(t * 8 + q, 9), :]
            if r == 0:
                yk = a[:8, :]
            else:
                # lane rotation: yk[s, l] = x[row+ (l+r)//128, (l+r)%128]
                # — two hardware lane rolls + one lane-mask select
                # (Mosaic cannot concat lane-misaligned slices)
                hi = pltpu.roll(a[:8, :], 128 - r, 1)
                lo = pltpu.roll(a[1:9, :], 128 - r, 1)
                yk = jnp.where(lane < 128 - r, hi, lo)
            contrib = vals_ref[j, k * 8:(k + 1) * 8, :].astype(zdt) * yk
            acc = contrib if acc is None else acc + contrib
        z_ref[k * 8:(k + 1) * 8, :] = acc


@functools.partial(jax.jit, static_argnames=(
    "offsets", "margin_sub", "x_sub", "chunk_tiles", "interpret"))
def _sdia_spmv_call(values, x2d, *, offsets, margin_sub, x_sub,
                    chunk_tiles, interpret=False):
    nd, rows8, _ = values.shape
    ct = chunk_tiles
    n_tiles = rows8 // 8
    num_chunks = n_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x2d (HBM, staged once)
        ],
        out_specs=pl.BlockSpec((ct * 8, 128), lambda c: (c, 0)),
        scratch_shapes=[
            pltpu.VMEM((x_sub, 128), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_sdia_kernel, offsets=offsets,
                          margin_sub=margin_sub, chunk_tiles=ct),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows8, 128), x2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n_tiles * 1024,
            bytes_accessed=(values.size * values.dtype.itemsize
                            + x_sub * 128 * x2d.dtype.itemsize
                            + rows8 * 128 * x2d.dtype.itemsize),
            transcendentals=0,
        ),
    )(values, x2d)


def _sdia_geometry(a, dd: bool = False):
    """(margin_sub, x_sub, chunk_tiles) for an SdiaMatrix."""
    offs = a.offsets
    min_off = min(offs) if offs else 0
    margin_sub = (-min_off + 127) // 128 if min_off < 0 else 0
    max_q = max(((o + margin_sub * 128) // 128 for o in offs), default=0)
    n_tiles = a.n_tiles
    x_sub = max(n_tiles * 8 + max_q + 1,
                margin_sub + -(-a.n_cols // 128))
    x_sub = -(-x_sub // 8) * 8
    nd = max(1, a.n_diags)
    # bound the unrolled body: ~5 vector ops per (tile, diag) fp32,
    # ~16 dd — keep Mosaic compiles in budget (verify skill notes)
    ct = 16
    budget = 96 if dd else 256
    while ct > 1 and (n_tiles % ct or ct * nd > budget):
        ct //= 2
    return margin_sub, x_sub, ct


def sdia_spmv_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                     interpret: bool = False):
    """``z = beta*y + alpha*(A @ x)`` on the SDIA layout; semantics match
    ``spgpu?diaspmv`` (``dia_spmv_base.cuh:121-139``)."""
    if a.n_diags == 0:
        acc = jnp.zeros((a.n_rows,), x.dtype)
        is_zero = isinstance(beta, (int, float)) and beta == 0
        if is_zero or y is None:
            return acc
        return beta * y
    margin_sub, x_sub, ct = _sdia_geometry(a)
    nbytes = x_sub * 128 * jnp.dtype(x.dtype).itemsize
    if nbytes > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"padded x ({nbytes/2**20:.0f} MiB) exceeds the VMEM-resident "
            f"limit ({_X_VMEM_LIMIT_BYTES/2**20:.0f} MiB); use WHDIA "
            "(column-panelled) for this size")
    pad_lo = margin_sub * 128
    pad_hi = x_sub * 128 - pad_lo - a.n_cols
    x2d = jnp.pad(x, (pad_lo, pad_hi)).reshape(x_sub, 128)
    z = _sdia_spmv_call(a.values, x2d, offsets=a.offsets,
                        margin_sub=margin_sub, x_sub=x_sub,
                        chunk_tiles=ct, interpret=interpret)
    acc = z.reshape(-1)[: a.n_rows]
    is_zero = isinstance(beta, (int, float)) and beta == 0
    if is_zero or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def _sdia_cplx_kernel(vr_ref, vi_ref, xr_hbm, xi_hbm, z_ref,
                      xr_vmem, xi_vmem, sem_r, sem_i, *,
                      offsets, margin_sub, chunk_tiles):
    """ONE-PASS complex SDIA SpMV (r5): both value planes stream
    together, each diagonal's x rotation is built ONCE per plane (the
    plane-pair path rebuilt it 4x), and the four real fmas land in
    re/im accumulators — ``dia_cspmv.cu:28-33`` one-pass ``cuCfma``
    parity.  Traffic: 8 B/cell vs the plane-pair path's 16."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        d1 = pltpu.make_async_copy(xr_hbm, xr_vmem, sem_r)
        d2 = pltpu.make_async_copy(xi_hbm, xi_vmem, sem_i)
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

    zdt = z_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        acc_r = None
        acc_i = None
        for j, o in enumerate(offsets):
            q, r = divmod(int(o) + margin_sub * 128, 128)

            def rot(x_vmem):
                a = x_vmem[pl.ds(t * 8 + q, 9), :]
                if r == 0:
                    return a[:8, :]
                hi = pltpu.roll(a[:8, :], 128 - r, 1)
                lo = pltpu.roll(a[1:9, :], 128 - r, 1)
                return jnp.where(lane < 128 - r, hi, lo)

            ykr = rot(xr_vmem)
            yki = rot(xi_vmem)
            vr = vr_ref[j, k * 8:(k + 1) * 8, :].astype(zdt)
            vi = vi_ref[j, k * 8:(k + 1) * 8, :].astype(zdt)
            cr = vr * ykr - vi * yki
            ci = vr * yki + vi * ykr
            acc_r = cr if acc_r is None else acc_r + cr
            acc_i = ci if acc_i is None else acc_i + ci
        z_ref[0, k * 8:(k + 1) * 8, :] = acc_r
        z_ref[1, k * 8:(k + 1) * 8, :] = acc_i


@functools.partial(jax.jit, static_argnames=(
    "offsets", "margin_sub", "x_sub", "chunk_tiles", "interpret"))
def _sdia_cplx_call(vr, vi, xr2d, xi2d, *, offsets, margin_sub, x_sub,
                    chunk_tiles, interpret=False):
    nd, rows8, _ = vr.shape
    ct = chunk_tiles
    n_tiles = rows8 // 8
    num_chunks = n_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, ct * 8, 128), lambda c: (0, c, 0)),
        scratch_shapes=[
            pltpu.VMEM((x_sub, 128), xr2d.dtype),
            pltpu.VMEM((x_sub, 128), xr2d.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_sdia_cplx_kernel, offsets=offsets,
                          margin_sub=margin_sub, chunk_tiles=ct),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, rows8, 128), xr2d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * nd * n_tiles * 1024,
            bytes_accessed=2 * vr.size * vr.dtype.itemsize
            + 2 * x_sub * 128 * 4 + 2 * rows8 * 128 * 4,
            transcendentals=0,
        ),
    )(vr, vi, xr2d, xi2d)


def sdia_spmv_cplx_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                          interpret: bool = False):
    """Fused one-pass complex SDIA SpMV on a
    :class:`~spgpu_tpu.formats.cplanes.ComplexPlanes` whose planes are
    :class:`SdiaMatrix` (C precision).  ``x``: ``(2, n)`` [re, im]
    stack; returns the same."""
    ar, ai = a.ar, a.ai
    if ar.n_diags == 0:
        zz = jnp.zeros((2, ar.n_rows), jnp.float32)
    else:
        margin_sub, x_sub, ct = _sdia_geometry(ar)
        # fused body is ~2x the fp32 op count per (tile, diag): halve
        # the unroll budget to keep Mosaic compiles in budget
        while ct > 1 and ct * max(ar.n_diags, 1) > 128:
            ct //= 2
        pad_lo = margin_sub * 128
        pad_hi = x_sub * 128 - pad_lo - ar.n_cols
        xr2d = jnp.pad(x[0], (pad_lo, pad_hi)).reshape(x_sub, 128)
        xi2d = jnp.pad(x[1], (pad_lo, pad_hi)).reshape(x_sub, 128)
        z = _sdia_cplx_call(ar.values, ai.values, xr2d, xi2d,
                            offsets=ar.offsets, margin_sub=margin_sub,
                            x_sub=x_sub, chunk_tiles=ct,
                            interpret=interpret)
        zz = z.reshape(2, -1)[:, : ar.n_rows]
    from spgpu_tpu.ops import _complex_epilogue

    return _complex_epilogue(zz, alpha, beta, y, is_dd=False)


def _sdia_spmm_kernel(vals_ref, x_hbm_ref, z_ref, x_vmem, xsem, *,
                      offsets, margin_sub, chunk_tiles, n_rhs):
    """Fused multi-RHS SDIA SpMM: the value planes (the ONLY per-cell
    traffic in this format) are read once per tile and amortised over
    ``n_rhs`` statically-unrolled products — each extra RHS costs two
    lane rolls + a select + an fma per diagonal but no slab traffic
    (reference bar: host m-loop = N×single, ``sdot.cu:167-175``)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
        dma.start()
        dma.wait()

    zdt = z_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for k in range(chunk_tiles):
        t = c * chunk_tiles + k
        accs = [None] * n_rhs
        for j, o in enumerate(offsets):
            q, r = divmod(int(o) + margin_sub * 128, 128)
            v = vals_ref[j, k * 8:(k + 1) * 8, :].astype(zdt)
            for rr_ in range(n_rhs):
                a9 = x_vmem[rr_, pl.ds(t * 8 + q, 9), :]
                yk = _sdia_xwin(a9, r, lane)
                contrib = v * yk
                accs[rr_] = contrib if accs[rr_] is None \
                    else accs[rr_] + contrib
        for rr_ in range(n_rhs):
            z_ref[rr_, k * 8:(k + 1) * 8, :] = accs[rr_]


@functools.partial(jax.jit, static_argnames=(
    "offsets", "margin_sub", "x_sub", "chunk_tiles", "n_rhs", "interpret"))
def _sdia_spmm_call(values, x3d, *, offsets, margin_sub, x_sub,
                    chunk_tiles, n_rhs, interpret=False):
    nd, rows8, _ = values.shape
    ct = chunk_tiles
    n_tiles = rows8 // 8
    num_chunks = n_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x3d (n_rhs, x_sub, 128)
        ],
        out_specs=pl.BlockSpec((n_rhs, ct * 8, 128), lambda c: (0, c, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_rhs, x_sub, 128), x3d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_sdia_spmm_kernel, offsets=offsets,
                          margin_sub=margin_sub, chunk_tiles=ct,
                          n_rhs=n_rhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rhs, rows8, 128), x3d.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * n_tiles * 1024 * n_rhs,
            bytes_accessed=(values.size * values.dtype.itemsize
                            + n_rhs * (x_sub + rows8) * 128
                            * x3d.dtype.itemsize),
            transcendentals=0,
        ),
    )(values, x3d)


def sdia_spmm_pallas(a, x, interpret: bool = False, rhs_per_pass=None):
    """Fused ``Z = A @ X`` on an SDIA layout; ``x``: ``(n_rhs, n_cols)``,
    returns ``(n_rhs, n_rows)``.  Splits into VMEM/compile-budget
    passes like :func:`whell_spmm_packed_pallas`."""
    n_rhs = int(x.shape[0])
    margin_sub, x_sub, ct = _sdia_geometry(a)
    itemsize = jnp.dtype(x.dtype).itemsize
    per_rhs = x_sub * 128 * itemsize
    if per_rhs > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"padded x ({per_rhs/2**20:.0f} MiB) exceeds the "
            "VMEM-resident limit; use WHDIA for this size")
    nd = max(1, a.n_diags)
    if rhs_per_pass is None:
        rhs_per_pass = n_rhs
        while rhs_per_pass > 1 and (
                rhs_per_pass * per_rhs > _X_VMEM_LIMIT_BYTES):
            rhs_per_pass -= 1
    if interpret:
        # same XLA:CPU big-program guard as whdia_spmm_pallas
        rhs_per_pass = min(rhs_per_pass, 2)
    rhs_per_pass = max(1, min(rhs_per_pass, n_rhs))
    # keep the unrolled body (ct * nd * rhs_per_pass) inside the Mosaic
    # compile budget by shrinking the chunk, not the fusion width
    while ct > 1 and ct * nd * rhs_per_pass > _SPMM_UNROLL_BUDGET:
        ct //= 2
    n_tiles = a.n_tiles
    while ct > 1 and n_tiles % ct:
        ct //= 2
    pad_lo = margin_sub * 128
    pad_hi = x_sub * 128 - pad_lo - a.n_cols
    x3 = jnp.pad(x, ((0, 0), (pad_lo, pad_hi)))
    x3 = x3.reshape(n_rhs, x_sub, 128)
    outs = []
    for r0 in range(0, n_rhs, rhs_per_pass):
        rp = min(rhs_per_pass, n_rhs - r0)
        z = _sdia_spmm_call(a.values, x3[r0:r0 + rp], offsets=a.offsets,
                            margin_sub=margin_sub, x_sub=x_sub,
                            chunk_tiles=ct, n_rhs=rp, interpret=interpret)
        outs.append(z.reshape(rp, -1)[:, : a.n_rows])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _sdia_xwin(a9, r, lane):
    """Shifted x window: ``yk[s, l] = flat_x[base + s*128 + l + r]`` from
    a 9-sublane slice ``a9`` — two lane rolls + one lane-mask select."""
    if r == 0:
        return a9[:8, :]
    hi = pltpu.roll(a9[:8, :], 128 - r, 1)
    lo = pltpu.roll(a9[1:9, :], 128 - r, 1)
    return jnp.where(lane < 128 - r, hi, lo)


def _sdia_z_kernel(arh_ref, arl_ref, aih_ref, ail_ref, x_hbm_ref,
                   zrh_ref, zrl_ref, zih_ref, zil_ref, x_vmem, xsem, *,
                   offsets, margin_sub, chunk_tiles, interpret):
    """ONE-PASS Z (complex128 = dd-complex) SDIA SpMV (r5): the four dd
    value slabs stream together, each diagonal's four x-plane windows
    (xr/xi x hi/lo) are built once (the plane path rebuilt rotations
    8x across 4 dd products), and the four error-free dd products
    combine into re/im register accumulators — ``dia_zspmv.cu``
    one-pass parity at D precision.  hi/lo words go to separate
    outputs (the DUS-fusion hazard note on :func:`_sdia_dd_kernel`)."""
    with __import__("contextlib").ExitStack() as _stack:
        from spgpu_tpu.ops import dd as _ddmod

        if not interpret:
            _stack.enter_context(_ddmod.unguarded())
        from spgpu_tpu.ops.dd import dd_add_dd, fast_two_sum, two_prod, \
            two_sum

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
            dma.start()
            dma.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for k in range(chunk_tiles):
            t = c * chunk_tiles + k
            acc = [None] * 4  # zr_h, zr_l, zi_h, zi_l

            def rmw(base, ph, pe):
                if acc[base] is None:
                    acc[base], acc[base + 1] = fast_two_sum(ph, pe)
                else:
                    s, e2 = two_sum(acc[base], ph)
                    acc[base], acc[base + 1] = fast_two_sum(
                        s, e2 + acc[base + 1] + pe)

            for j, o in enumerate(offsets):
                q, r = divmod(int(o) + margin_sub * 128, 128)
                # x planes: 0 xr_hi, 1 xr_lo, 2 xi_hi, 3 xi_lo
                w = [_sdia_xwin(x_vmem[p, pl.ds(t * 8 + q, 9), :], r,
                                lane) for p in range(4)]
                arh = arh_ref[j, k * 8:(k + 1) * 8, :]
                arl = arl_ref[j, k * 8:(k + 1) * 8, :]
                aih = aih_ref[j, k * 8:(k + 1) * 8, :]
                ail = ail_ref[j, k * 8:(k + 1) * 8, :]

                def ddprod(vh, vl, gh_, gl_):
                    p, e = two_prod(vh, gh_)
                    return p, e + (vh * gl_ + vl * gh_)

                p1 = ddprod(arh, arl, w[0], w[1])   # Ar*xr
                p2 = ddprod(aih, ail, w[2], w[3])   # Ai*xi
                p3 = ddprod(arh, arl, w[2], w[3])   # Ar*xi
                p4 = ddprod(aih, ail, w[0], w[1])   # Ai*xr
                crh, crl = dd_add_dd(p1[0], p1[1], -p2[0], -p2[1])
                cih, cil = dd_add_dd(p3[0], p3[1], p4[0], p4[1])
                rmw(0, crh, crl)
                rmw(2, cih, cil)
            zrh_ref[k * 8:(k + 1) * 8, :] = acc[0]
            zrl_ref[k * 8:(k + 1) * 8, :] = acc[1]
            zih_ref[k * 8:(k + 1) * 8, :] = acc[2]
            zil_ref[k * 8:(k + 1) * 8, :] = acc[3]


@functools.partial(jax.jit, static_argnames=(
    "offsets", "margin_sub", "x_sub", "chunk_tiles", "interpret"))
def _sdia_z_call(arh, arl, aih, ail, x4d, *, offsets, margin_sub,
                 x_sub, chunk_tiles, interpret=False):
    nd, rows8, _ = arh.shape
    ct = chunk_tiles
    n_tiles = rows8 // 8
    num_chunks = n_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x4d (4, x_sub, 128)
        ],
        out_specs=tuple(pl.BlockSpec((ct * 8, 128), lambda c: (c, 0))
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((4, x_sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_sdia_z_kernel, offsets=offsets,
                          margin_sub=margin_sub, chunk_tiles=ct,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((rows8, 128), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * nd * n_tiles * 1024,
            bytes_accessed=4 * arh.size * 4 + 4 * x_sub * 128 * 4
            + 4 * rows8 * 128 * 4,
            transcendentals=0,
        ),
    )(arh, arl, aih, ail, x4d)
    return outs


def sdia_spmv_z_pallas(a, x, alpha=1.0, beta=0.0, y=None,
                       interpret: bool = False):
    """Fused one-pass Z (complex128) SDIA SpMV on a
    :class:`~spgpu_tpu.formats.cplanes.ComplexPlanes` whose planes are
    dd :class:`SdiaMatrix`.  ``x``: ``(2, 2, n)`` [re, im] x [hi, lo]
    stack; returns the same."""
    ar, ai = a.ar, a.ai
    from spgpu_tpu.ops import _complex_epilogue

    if ar.n_diags == 0:
        zz = jnp.zeros((2, 2, ar.n_rows), jnp.float32)
        return _complex_epilogue(zz, alpha, beta, y, is_dd=True)
    margin_sub, x_sub, ct = _sdia_geometry(ar, dd=True)
    # the Z body unrolls ~2x the dd kernel per (tile, diag)
    while ct > 1 and (ar.n_tiles % ct or ct * ar.n_diags > 48):
        ct //= 2
    pad_lo = margin_sub * 128
    pad_hi = x_sub * 128 - pad_lo - ar.n_cols
    planes = [jnp.pad(x[p, w], (pad_lo, pad_hi)).reshape(x_sub, 128)
              for p in (0, 1) for w in (0, 1)]
    x4d = jnp.stack(planes)  # xr_hi, xr_lo, xi_hi, xi_lo
    zrh, zrl, zih, zil = _sdia_z_call(
        ar.values, ar.values_lo, ai.values, ai.values_lo, x4d,
        offsets=ar.offsets, margin_sub=margin_sub, x_sub=x_sub,
        chunk_tiles=ct, interpret=interpret)
    n = ar.n_rows
    zz = jnp.stack([
        jnp.stack([zrh.reshape(-1)[:n], zrl.reshape(-1)[:n]]),
        jnp.stack([zih.reshape(-1)[:n], zil.reshape(-1)[:n]])])
    return _complex_epilogue(zz, alpha, beta, y, is_dd=True)


def _sdia_dd_kernel(vh_ref, vl_ref, x_hbm_ref, zh_ref, zl_ref, x_vmem,
                    xsem, *, offsets, margin_sub, chunk_tiles, interpret):
    """Double-float SDIA SpMV (D-precision parity with dia_dspmv.cu).

    Same static slice/rotate scheme as :func:`_sdia_kernel`; values and
    x are (hi, lo) fp32 pairs, the per-diagonal product is TwoProd and
    the across-diagonal accumulation stays in registers (each output
    tile is written exactly once — no RMW chain at all).

    hi and lo words go to SEPARATE outputs: per-tile partial writes
    interleaved across the leading dim of one ``(2, ct*8, 128)`` block
    measured CORRUPTED lo words in interpret mode at some chunk shapes
    (ct=8/2/1 — the same ``al`` stored to a separate output in the same
    kernel was exact; XLA recomputes the stored value inside the DUS
    fusion and drops the EFT structure).  Separate outputs sidestep the
    rewrite and cost the compiled path nothing."""
    with __import__("contextlib").ExitStack() as _stack:
        from spgpu_tpu.ops import dd as _ddmod

        if not interpret:
            _stack.enter_context(_ddmod.unguarded())
        from spgpu_tpu.ops.dd import fast_two_sum, two_prod, two_sum

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(x_hbm_ref, x_vmem, xsem)
            dma.start()
            dma.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for k in range(chunk_tiles):
            t = c * chunk_tiles + k
            ah = al = None
            for j, o in enumerate(offsets):
                q, r = divmod(int(o) + margin_sub * 128, 128)
                yh = _sdia_xwin(x_vmem[0, pl.ds(t * 8 + q, 9), :], r, lane)
                yl = _sdia_xwin(x_vmem[1, pl.ds(t * 8 + q, 9), :], r, lane)
                vh = vh_ref[j, k * 8:(k + 1) * 8, :]
                vl = vl_ref[j, k * 8:(k + 1) * 8, :]
                p, e = two_prod(vh, yh)
                e = e + (vh * yl + vl * yh)
                if ah is None:
                    ah, al = fast_two_sum(p, e)
                else:
                    s, e2 = two_sum(ah, p)
                    ah, al = fast_two_sum(s, e2 + al + e)
            zh_ref[k * 8:(k + 1) * 8, :] = ah
            zl_ref[k * 8:(k + 1) * 8, :] = al


@functools.partial(jax.jit, static_argnames=(
    "offsets", "margin_sub", "x_sub", "chunk_tiles", "interpret"))
def _sdia_dd_call(values, values_lo, x3d, *, offsets, margin_sub, x_sub,
                  chunk_tiles, interpret=False):
    nd, rows8, _ = values.shape
    ct = chunk_tiles
    n_tiles = rows8 // 8
    num_chunks = n_tiles // ct
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec((nd, ct * 8, 128), lambda c: (0, c, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x3d (2, x_sub, 128)
        ],
        out_specs=(pl.BlockSpec((ct * 8, 128), lambda c: (c, 0)),
                   pl.BlockSpec((ct * 8, 128), lambda c: (c, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, x_sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    zh, zl = pl.pallas_call(
        functools.partial(_sdia_dd_kernel, offsets=offsets,
                          margin_sub=margin_sub, chunk_tiles=ct,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rows8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((rows8, 128), jnp.float32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=30 * nd * n_tiles * 1024,
            bytes_accessed=(2 * values.size * 4
                            + 2 * x_sub * 128 * 4 + 2 * rows8 * 128 * 4),
            transcendentals=0,
        ),
    )(values, values_lo, x3d)
    return jnp.stack([zh, zl])


def sdia_spmv_dd_pallas(a, x_pair, interpret: bool = False):
    """Double-float SDIA SpMV; ``x_pair``: ``(2, n_cols)`` fp32 stack."""
    if not a.is_dd:
        raise ValueError("sdia_spmv_dd requires dd values "
                         "(coo_to_sdia on float64)")
    margin_sub, x_sub, ct = _sdia_geometry(a, dd=True)
    nbytes = 2 * x_sub * 128 * 4
    if nbytes > _X_VMEM_LIMIT_BYTES:
        raise NotImplementedError(
            f"padded dd x ({nbytes/2**20:.0f} MiB) exceeds the VMEM "
            "budget; use WHDIA for this size")
    pad_lo = margin_sub * 128
    pad_hi = x_sub * 128 - pad_lo - a.n_cols
    x3d = jnp.pad(x_pair, ((0, 0), (pad_lo, pad_hi))).reshape(2, x_sub, 128)
    z = _sdia_dd_call(a.values, a.values_lo, x3d, offsets=a.offsets,
                      margin_sub=margin_sub, x_sub=x_sub,
                      chunk_tiles=ct, interpret=interpret)
    return z.reshape(2, -1)[:, : a.n_rows]
