"""WHDIA pattern-mode per-op cycle account (VERDICT r4 #5 / weak #2).

The kernel that became values-only in r4 (banded-11 524k: 145-151
GFLOPS ≈ 8.5-9 ns/tile) gets the §2f ablation treatment: variants at
the production geometry add one op family at a time against the
~5.5 ns/tile 4 B/cell streaming floor.

  stream   values slab through BlockSpecs + register fma
  +r0      the packed-word tile_r0 rebuild (3 scalar splats + arith)
  +sgather the sublane window gather (pt select)
  +lgather + the lane gather (idx)
  +rmw     accumulate into the dual zacc planes
  full     production kernel (incl. slot/parity-sum flush)

Run: python doc/sweeps/whdia_ablation.py
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

    from spgpu_tpu.convert import coo_to_whdia
    from spgpu_tpu.ops.pallas_kernels import (_whdia_spmv_call,
                                              _whdia_tile_r0)
    from spgpu_tpu.utils.fixtures import random_banded
    from spgpu_tpu.utils.timing import chained_time

    coo = random_banded(1 << 19, bands=11, wander=7, seed=2,
                        dtype=np.float32).sum_duplicates()
    a = coo_to_whdia(coo)
    assert a.tile_r0 is not None, "expected pattern mode"
    gh, ct, wp = a.group_hacks, a.chunk_tiles, a.window_pages
    nt = a.num_tiles
    print(f"banded-11 524k: tiles={nt} gh={gh} ct={ct} wp={wp} "
          f"pad={a.values.size / coo.nnz:.2f}", flush=True)

    def body(tmeta_ref, cgroup_ref, tr0_ref, vals_ref, x_hbm_ref, z_ref,
             zacc, x_vmem, xsem, *, level):
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
        siota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(ct):
            t = c * ct + k
            meta = tmeta_ref[t]
            base = jax.lax.bitwise_and(meta, jnp.int32(0xFFFF))
            v = vals_ref[k * 8:(k + 1) * 8, :]
            if level == "stream":
                acc = acc + v * 1.5
                continue
            r0 = _whdia_tile_r0(tr0_ref, t, siota)
            rq = jax.lax.shift_right_arithmetic(r0, jnp.int32(7))
            rr = jax.lax.bitwise_and(r0, jnp.int32(127))
            pt = jnp.clip(rq + (lane < rr).astype(jnp.int32), 0, wp - 1)
            idx = jax.lax.bitwise_and(r0 + lane, jnp.int32(127))
            if level == "r0":
                acc = acc + v * (pt + idx).astype(jnp.float32)
                continue
            win8 = x_vmem[pl.ds(base, 8), :]
            if wp == 8:
                h1 = jnp.take_along_axis(win8, pt, axis=0)
            else:
                pt7 = jax.lax.bitwise_and(pt, jnp.int32(7))
                blk = jax.lax.shift_right_logical(pt, jnp.int32(3))
                h1 = jnp.take_along_axis(win8, pt7, axis=0)
                for wb in range(1, wp // 8):
                    winb = x_vmem[pl.ds(base + 8 * wb, 8), :]
                    hb = jnp.take_along_axis(winb, pt7, axis=0)
                    h1 = jnp.where(blk == wb, hb, h1)
            if level == "sgather":
                acc = acc + v * h1 + idx.astype(jnp.float32)
                continue
            g = jnp.take_along_axis(h1, idx, axis=1)
            if level == "lgather":
                acc = acc + v * g
                continue
            hh = jax.lax.shift_right_logical(meta, jnp.int32(16))
            zacc[pl.ds(hh + (k % 2) * gh, 1), :, :] += (v * g)[None]

        if level != "rmw":
            zacc[pl.ds(0, 1), :, :] += acc[None]
        nc = pl.num_programs(0)
        last = jnp.logical_or(
            c == nc - 1,
            cgroup_ref[c] != cgroup_ref[jnp.minimum(c + 1, nc - 1)])

        @pl.when(last)
        def _():
            z_ref[:] = zacc[0 * gh: 1 * gh, 0]

    @functools.partial(jax.jit, static_argnames=("level",))
    def call(m, x2, *, level):
        num_chunks = m.num_tiles // ct
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((ct * 8, 128), lambda c, *_: (c, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((gh, 128),
                                   lambda c, tm, cg, tr: (cg[c], 0)),
            scratch_shapes=[
                pltpu.VMEM((2 * gh, 8, 128), jnp.float32),
                pltpu.VMEM((m.x_pages, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            functools.partial(body, level=level),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m.num_groups * gh, 128),
                                           jnp.float32),
        )(m.tile_base, m.chunk_group, m.tile_r0, m.values, x2)

    from spgpu_tpu.ops import whdia_spmv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(coo.n_cols), jnp.float32)
    scale = jnp.float32(1e-3)

    def full_fn(c, m):
        return whdia_spmv(m, c, interpret=False) * scale

    def mk(level):
        def f(c, m):
            from spgpu_tpu.ops.pallas_kernels import _prep_x

            x2 = _prep_x(c, m.n_cols, m.x_pages)
            z = call(m, x2, level=level)
            return z.reshape(-1)[: c.shape[0]] * scale
        return f

    variants = [("stream", mk("stream")), ("r0", mk("r0")),
                ("sgather", mk("sgather")), ("lgather", mk("lgather")),
                ("rmw", mk("rmw")), ("full", full_fn)]
    for name, fn in variants:
        fn(x, a)
    best = {}
    for r in range(4):
        for name, fn in variants:
            t, _ = chained_time(fn, x, a, iters_lo=60, iters_hi=400)
            best[name] = min(best.get(name, 9e9), t)
    for name, _ in variants:
        t = best[name]
        print(f"{name:8s}: {t*1e3:.4f} ms  {t/nt*1e9:.2f} ns/tile  "
              f"{2.0*coo.nnz/t*1e-9:.1f} GFLOPS-equiv", flush=True)


if __name__ == "__main__":
    main()
