"""Headline benchmark — HELL SpMV fp32 GFLOPS vs HBM roofline.

Replicates the reference's measurement protocol (SURVEY §3.5,
``/root/reference/src/tests/hellPerf.cpp:209-252``): warm-up SpMV, a
``dot(z, z)`` checksum, then a timed loop reported as
``GFLOPS = (2·nnz − 1)/t_avg``.

Measurement mechanics, learned the hard way on the axon TPU backend:

* the timed loop is a single jitted ``lax.fori_loop`` whose carry chains
  each SpMV into the next (``z_{k+1} = A z_k · s``) — a real data
  dependency; the ``x + 0·z`` trick gets algebraically simplified away
  and 20 independent dispatches just measure queue depth;
* ``block_until_ready`` does NOT synchronise on the axon tunnel — the
  only honest fence is a device→host readback, so we time through
  ``float(result.sum())``.

Prints ONE JSON line:
``{"metric": ..., "value": GFLOPS, "unit": "GFLOP/s", "vs_baseline": f}``
where ``vs_baseline`` is the achieved fraction of the memory-bandwidth
roofline (the reference publishes no numbers — BASELINE.md sets ≥0.90 of
roofline as the target).  Extra detail lines go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.convert import coo_to_hell
    from spgpu_tpu.ops import hell_spmv
    from spgpu_tpu.ops.blas1 import dot
    from spgpu_tpu.utils.fixtures import random_irregular

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = 1 << 16 if on_tpu else 1 << 14
    avg = 27.0
    iters = 10

    coo = random_irregular(n, n, avg_nnz_per_row=avg, seed=0, dtype=np.float32)
    # hacked-OELL: sort rows by descending length before hacking so the
    # Pareto tail doesn't widen every hack it lands in.
    order = np.argsort(-coo.row_lengths(), kind="stable").astype(np.int32)
    a = coo_to_hell(coo, row_perm=order)
    nnz = coo.nnz
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)

    # row_perm scatters z back to original row order; for the bandwidth
    # measurement we keep the permuted output (the reference's OELL leg
    # also measures the permuted kernel, hellPerf.cpp:323-378).
    scale = jnp.float32(1e-3)

    @jax.jit
    def spmv(a, x):
        return hell_spmv(a, x)

    @jax.jit
    def timed(a, x):
        def body(_, c):
            return hell_spmv(a, c) * scale

        return jax.lax.fori_loop(0, iters, body, x)

    # warm-up + checksum (hellPerf.cpp:209-234)
    z = spmv(a, x)
    checksum = float(dot(z, z))
    float(timed(a, x).sum())  # compile + full execution fence

    t0 = time.perf_counter()
    s = float(timed(a, x).sum())
    t = (time.perf_counter() - t0) / iters

    gflops = (2.0 * nnz - 1.0) / t * 1e-9
    # roofline bytes: values + int32 col indices + x read once + z write.
    bytes_moved = nnz * (4 + 4) + n * 4 * 2
    bw = hbm_bandwidth(dev)
    vs = (gflops * 1e9) / ((2.0 * nnz - 1.0) / (bytes_moved / bw)) if bw else 0.0

    print(
        f"device={dev.device_kind} n={n} nnz={nnz} storage={a.storage_bytes}B "
        f"checksum={checksum:.6e} t_avg={t*1e3:.3f}ms sync={s!r} "
        f"eff_bw={bytes_moved/t/1e9:.1f}GB/s roofline_frac={vs:.3f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "hell_spmv_fp32_gflops",
                "value": round(gflops, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
