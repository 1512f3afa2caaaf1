"""dd WHELL per-op cycle account (VERDICT r4 #4) — the §2f methodology
applied to the D-precision kernel: synthetic-slab variants at the
production geometry add op families one at a time, so each line prices
one family.  Variants share the production matrix's slabs/specs (fp64
Laplacian 512x512 — the driver dd row), differing only in the body:

  stream   slabs through BlockSpecs + register fma (10 B/cell floor)
  +gather  both x-plane gather chains (2 sublane + 2 lane gathers)
  +eft     TwoProd + both cross terms, register accumulate
  +ddrmw   full dd accumulate into the zacc scratch (two_sum chain)
  full     production kernel (incl. seg-scan flush)
  norelax  production with the fast_two_sum renormalisation in the
           accumulate replaced by a plain lo add (renorm deferred to
           the flush) — the one candidate cheapening that keeps the
           error budget (the error word stays < 8 ulp over a chunk)

Run: python doc/sweeps/dd_ablation.py
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spgpu_tpu.convert import coo_to_whell
    from spgpu_tpu.ops import dd as _dd
    from spgpu_tpu.ops.pallas_kernels import _whell_packed_dd_call
    from spgpu_tpu.utils.fixtures import laplacian_2d
    from spgpu_tpu.utils.timing import chained_time

    coo = laplacian_2d(512, 512, np.float64)
    a = coo_to_whell(coo, packed=True)  # the production geometry
    gh, ct = a.group_hacks, a.chunk_tiles
    wp = a.window_pages
    nt = a.num_tiles
    print(f"lap512 dd: tiles={nt} gh={gh} ct={ct} wp={wp} "
          f"pad={a.values.size / coo.nnz:.2f}", flush=True)

    def body(*refs, level):
        with _dd.unguarded():  # Mosaic can't lower optimization_barrier
            _body_inner(*refs, level=level)

    def _body_inner(tmeta_ref, cgroup_ref, vh_ref, vl_ref, res_ref,
                    pt_ref, seglo_ref, seghi_ref, x_hbm_ref, z_ref, zh,
                    zl, x_vmem, xsem, *, level):
        from spgpu_tpu.ops.dd import fast_two_sum, two_prod, two_sum

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
            zh[:] = jnp.zeros_like(zh)
            zl[:] = jnp.zeros_like(zl)

        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(ct):
            t = c * ct + k
            meta = tmeta_ref[t]
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            vh = vh_ref[k * 8:(k + 1) * 8, :]
            vl = vl_ref[k * 8:(k + 1) * 8, :]
            res = res_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
            pt = pt_ref[k * 8:(k + 1) * 8, :].astype(jnp.int32)
            if level == "stream":
                acc = acc + vh * 1.5 + vl * res.astype(jnp.float32) \
                    + pt.astype(jnp.float32)
                continue

            def window_gather(plane):
                win = x_vmem[plane, pl.ds(base, 8), :]
                if wp == 8:
                    h1 = jnp.take_along_axis(win, pt, axis=0)
                else:
                    pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
                    blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
                    h1 = jnp.take_along_axis(win, pt7, axis=0)
                    for wb in range(1, wp // 8):
                        winb = x_vmem[plane, pl.ds(base + 8 * wb, 8), :]
                        hb = jnp.take_along_axis(winb, pt7, axis=0)
                        h1 = jnp.where(blk == wb, hb, h1)
                return jnp.take_along_axis(h1, res, axis=1)

            g_hi = window_gather(0)
            g_lo = window_gather(1)
            if level == "gather":
                acc = acc + vh * g_hi + vl * g_lo
                continue
            p, e = two_prod(vh, g_hi)
            e = e + (vh * g_lo + vl * g_hi)
            if level == "eft":
                acc = acc + p + e * 0.5
                continue
            # level == "ddrmw" / "norelax": dd accumulate into scratch
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
            sl = pl.ds(hh, 1)
            ah = zh[sl, :, :]
            al = zl[sl, :, :]
            s, e2 = two_sum(ah, p[None])
            if level == "norelax":
                zh[sl, :, :] = s
                zl[sl, :, :] = al + (e2 + e[None])
            else:
                nh, nl = fast_two_sum(s, e2 + al + e[None])
                zh[sl, :, :] = nh
                zl[sl, :, :] = nl

        if level in ("stream", "gather", "eft"):
            zh[pl.ds(0, 1), :, :] += acc[None]
        nc = pl.num_programs(0)
        last = jnp.logical_or(
            c == nc - 1,
            cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

        @pl.when(last)
        def _():
            z_ref[0] = zh[:, 0]
            z_ref[1] = zl[:, 0]

    @functools.partial(jax.jit, static_argnames=("level",))
    def call(m, x3, *, level):
        num_chunks = m.num_tiles // ct
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
                pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
                pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
                pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
                pl.BlockSpec((gh, 128), lambda c, tm, cg: (cg[c], 0)),
                pl.BlockSpec((gh, 128), lambda c, tm, cg: (cg[c], 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((2, gh, 128),
                                   lambda c, tm, cg: (0, cg[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((gh, 8, 128), jnp.float32),
                pltpu.VMEM((gh, 8, 128), jnp.float32),
                pltpu.VMEM((2, m.x_pages, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            functools.partial(body, level=level),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, m.num_groups * gh, 128),
                                           jnp.float32),
        )(m.tile_base, m.chunk_group, m.values, m.values_lo, m.residue,
          m.page_tab, m.seg_lo, m.seg_hi, x3)

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack(_dd.split(rng.standard_normal(a.n_cols))),
                    jnp.float32)
    scale = jnp.float32(1e-3)

    def full_fn(c, m):
        x3 = c.reshape(2, -1, 128)
        return _whell_packed_dd_call(
            m.values, m.values_lo, m.residue, m.page_tab, m.seg_lo,
            m.seg_hi, m.tile_base, m.chunk_group, x3,
            num_tiles=m.num_tiles, num_groups=m.num_groups,
            x_pages=m.x_pages, window_pages=m.window_pages,
            chunk_tiles=m.chunk_tiles,
            group_hacks=m.group_hacks).reshape(2, -1) * scale

    def mk(level):
        def f(c, m):
            x3 = c.reshape(2, -1, 128)
            z = call(m, x3, level=level)
            return z.reshape(2, -1)[:, : c.shape[1]] * scale
        return f

    variants = [("stream", mk("stream")), ("gather", mk("gather")),
                ("eft", mk("eft")), ("ddrmw", mk("ddrmw")),
                ("norelax", mk("norelax")), ("full", full_fn)]
    for name, fn in variants:  # compile
        fn(x, a)
    best = {}
    for r in range(4):
        for name, fn in variants:
            t, _ = chained_time(fn, x, a, iters_lo=60, iters_hi=400)
            best[name] = min(best.get(name, 9e9), t)
    for name, _ in variants:
        t = best[name]
        print(f"{name:8s}: {t*1e3:.4f} ms  {t/nt*1e9:.2f} ns/tile  "
              f"{2.0*coo.nnz/t*1e-9:.2f} GFLOPS-equiv", flush=True)


if __name__ == "__main__":
    main()
