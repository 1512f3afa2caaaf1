"""Honest chip sweep of dd WHELL geometry (BASELINE gap 3).

Round-2 dd kernels shipped conservative geometry (gh=128/ct=32) chosen
for the Mosaic compile budget; this sweep measures wider group/chunk
shapes on the fp64 Laplacian 262k config (the BASELINE dd row) with the
honest chained-time protocol.  Packed layouts are square in lane space
(n_rows == n_cols), so the product chains directly; values are random
(timing is data-independent).  Run: python doc/sweeps/dd_geom_sweep.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp

    from spgpu_tpu.convert.whell import _coo_to_whell_packed
    from spgpu_tpu.ops.pallas_kernels import whell_spmv_dd_pallas
    from spgpu_tpu.utils.fixtures import laplacian_2d
    from spgpu_tpu.utils.timing import chained_time

    coo = laplacian_2d(512, 512, np.float64)
    nnz = coo.nnz

    geoms = [(128, 32), (128, 64), (256, 32), (256, 64), (512, 32),
             (512, 64)]
    for gh, ct in geoms:
        try:
            a = _coo_to_whell_packed(coo, 32, None, None,
                                     group_hacks=gh, chunk_tiles=ct)
            pad = a.values.size / nnz
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((2, a.n_cols)),
                jnp.float32)
            scale = jnp.float32(1e-3)
            t, _ = chained_time(
                lambda c, m: whell_spmv_dd_pallas(m, c) * scale,
                x, a, iters_lo=50, iters_hi=500)
            gf = 2.0 * nnz / t * 1e-9
            print(f"gh={gh} ct={ct}: pad {pad:.2f}x  t {t*1e3:.3f} ms  "
                  f"{gf:.1f} GFLOPS", flush=True)
        except Exception as e:
            print(f"gh={gh} ct={ct}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
