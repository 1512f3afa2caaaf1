"""Headline benchmark — WHELL (Pallas) SpMV fp32 vs HBM roofline.

The flagship op: HELL-class SpMV on an irregular-degree matrix with FEM-
like column locality, through the WHELL Pallas kernel
(:mod:`spgpu_tpu.ops.pallas_kernels`).  Replicates the reference's
measurement protocol (SURVEY §3.5, ``hellPerf.cpp:209-252``): warm-up
SpMV, ``dot(z, z)`` checksum, timed loop, ``GFLOPS = (2·nnz − 1)/t``.

Measurement mechanics, learned the hard way on the axon TPU backend:

* the timed loop is one jitted ``lax.fori_loop`` whose carry chains each
  SpMV into the next — independent dispatches only measure queue depth;
* ``block_until_ready`` does NOT synchronise on the axon tunnel — the
  only honest fence is a device→host readback (``float(result.sum())``);
* every jitted CALL costs ~30 ms of tunnel round trips, so the loop is
  timed at two lengths and ``T(N) = C + N*t`` solved for ``t``
  (``utils/timing.chained_time``) — at a single N=200 the overhead
  still inflated sub-ms kernels ~2x.

Prints ONE JSON line:
``{"metric": ..., "value": GFLOPS, "unit": "GFLOP/s", "vs_baseline": f}``
where ``vs_baseline`` is the achieved fraction of the HBM-bandwidth
roofline for the matrix's actual slab bytes (the reference publishes no
numbers — BASELINE.md sets ≥0.90 of roofline as the north-star target).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import json
import sys
import time

import numpy as np


def main_mtx(argv):
    """Matrix-Market-driven bench: ``bench.py --mtx FILE [--fmt F]
    [--iters N] [--cg TOL]`` — the ``hellPerf``/``diaPerf`` protocol
    end-to-end on a real matrix file (load → symmetric unfold →
    auto-layout → SpMV [→ CG]), one JSON line per stage
    (``hellPerf.cpp:47-130``, ``diaPerf.cpp:160-292``)."""
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.convert import (
        coo_to_hybrid, coo_to_sdia, coo_to_whdia, coo_to_whell,
        suggest_format)
    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.io.mm import read_mm, read_mm_properties
    from spgpu_tpu.ops import hybrid_spmv, sdia_spmv, whdia_spmv, whell_spmv
    from spgpu_tpu.ops.blas1 import dot
    from spgpu_tpu.utils.timing import chained_time

    path = argv[argv.index("--mtx") + 1]
    fmt = argv[argv.index("--fmt") + 1] if "--fmt" in argv else None
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 50
    cg_tol = float(argv[argv.index("--cg") + 1]) if "--cg" in argv else None

    props = read_mm_properties(path)
    t0 = time.perf_counter()
    coo = read_mm(path).sum_duplicates()
    t_load = time.perf_counter() - t0
    print(json.dumps({
        "stage": "load", "file": os.path.basename(path),
        "symmetry": props.symmetry, "field": props.field,
        "n_rows": coo.n_rows, "n_cols": coo.n_cols, "nnz": coo.nnz,
        "t_s": round(t_load, 3)}))

    if fmt is None:
        fmt = suggest_format(coo)
        fmt = {"dia": "sdia", "ell": "whell"}.get(fmt, fmt)
        if fmt == "hybrid" and np.issubdtype(coo.values.dtype,
                                             np.complexfloating):
            fmt = "whdia"  # hybrid split is real-only; plane-pair WHDIA
        # per-column x bytes in the SDIA kernel's VMEM: fp32 4, dd and
        # complex64 8 (two planes), complex128 16 (dd plane pairs) —
        # mirrors solvers/auto's thresholds so the bench and the solver
        # route identically (ADVICE r3)
        plane_b = {"f": 4, "d": 8, "F": 8, "D": 16}[coo.values.dtype.char] \
            if coo.values.dtype.char in "fdFD" else 4
        if fmt == "sdia" and coo.n_cols * plane_b > 11 * 2 ** 20:
            fmt = "whdia"
    conv = {"whell": lambda c: coo_to_whell(c, packed=True),
            "whdia": coo_to_whdia, "sdia": coo_to_sdia,
            "hybrid": coo_to_hybrid}[fmt]
    op = {"whell": whell_spmv, "whdia": whdia_spmv, "sdia": sdia_spmv,
          "hybrid": hybrid_spmv}[fmt]
    t0 = time.perf_counter()
    a = conv(coo)
    t_conv = time.perf_counter() - t0
    pad = (a.values.size / max(coo.nnz, 1)) if hasattr(a, "values") else 0.0
    print(json.dumps({
        "stage": "convert", "fmt": fmt, "t_s": round(t_conv, 3),
        "pad_factor": round(pad, 3),
        "storage_bytes": int(getattr(a, "storage_bytes", 0))}))

    rng = np.random.default_rng(1)
    is_cplx = np.issubdtype(coo.values.dtype, np.complexfloating)
    flops_per = 8.0 if is_cplx else 2.0  # complex mul-add = 8 real flops
    if is_cplx:
        # C/Z plane stacks (embed_complex on every complex layout)
        xc = (rng.standard_normal(coo.n_cols)
              + 1j * rng.standard_normal(coo.n_cols)).astype(
                  coo.values.dtype)
        x = jnp.asarray(a.embed_complex(xc))
    elif fmt == "whell":
        x = jnp.asarray(a.embed(
            rng.standard_normal(coo.n_cols)), jnp.float32) \
            if not getattr(a, "is_dd", False) else None
        if x is None:  # float64 file -> dd stacks
            from spgpu_tpu.ops import dd as _dd

            x = jnp.asarray(_dd.split(a.embed(
                rng.standard_normal(coo.n_cols))))
    else:
        xv = rng.standard_normal(coo.n_cols)
        if getattr(a, "is_dd", False):
            from spgpu_tpu.ops import dd as _dd

            x = jnp.asarray(_dd.split(xv))
        else:
            x = jnp.asarray(xv, jnp.float32)
    z = op(a, x)  # warm-up
    checksum = float(np.asarray(dot(z, z)).sum())
    scale = jnp.float32(1e-3)
    t, _ = chained_time(lambda c, a: op(a, c) * scale, x, a,
                        iters_lo=iters, iters_hi=10 * iters)
    gflops = flops_per * coo.nnz / t * 1e-9
    bw = hbm_bandwidth()
    print(json.dumps({
        "stage": "spmv", "fmt": fmt, "t_avg_s": round(t, 9),
        "gflops": round(gflops, 3), "checksum": checksum,
        "roofline_frac": (round((int(getattr(a, "storage_bytes", 0))
                                 + coo.n_rows * 8) / t / bw, 4)
                          if bw else None)}))

    if cg_tol is not None:
        from spgpu_tpu import solvers

        b = rng.standard_normal(coo.n_rows)
        if is_cplx:
            b = (b + 1j * rng.standard_normal(coo.n_rows)).astype(
                coo.values.dtype)
        elif coo.values.dtype == np.float32:
            b = b.astype(np.float32)
        t0 = time.perf_counter()
        res = solvers.solve(coo, b, symmetric=props.is_symmetric,
                            tol=cg_tol, maxiter=5000, fmt=fmt)
        t_solve = time.perf_counter() - t0
        xs = np.asarray(res.x)
        if not is_cplx:
            xs = xs.astype(np.float64)
        resid = float(np.linalg.norm(b - coo.spmv(xs))
                      / np.linalg.norm(b))
        print(json.dumps({
            "stage": "solve", "solver": "cg" if props.is_symmetric
            else "bicgstab", "iterations": int(res.iterations),
            "true_resid": resid, "t_s": round(t_solve, 3)}))


def _suite_rows():
    """Driver-bench suite rows beyond the flagship (VERDICT r3 missing
    #4: one metric/round left SDIA/WHDIA/SpMM/dd/complex/BLAS-1
    regression-invisible — the reference's harnesses print every format
    every run, ``hellPerf.cpp:251-378`` / ``diaPerf.cpp:244-292``).

    Each row emits one JSON line in the same ``{"metric", "value",
    "unit", "vs_baseline"}`` schema as the flagship; ``vs_baseline`` is
    the fraction of the HBM spec roofline for that row's modeled
    traffic.  A row failure is reported, not fatal — the flagship (run
    last by :func:`main`) stays the driver-parsed headline metric."""
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.convert import coo_to_sdia, coo_to_whdia, coo_to_whell
    from spgpu_tpu.ops import sdia_spmv, whdia_spmv, whell_spmm, whell_spmv
    from spgpu_tpu.ops import dd as _dd
    from spgpu_tpu.utils.fixtures import (
        laplacian_2d, random_banded, random_fem_like)
    from spgpu_tpu.utils.timing import chained_time
    from spgpu_tpu.formats.coo import CooMatrix

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    bw = hbm_bandwidth(dev) or 819e9
    scale = jnp.float32(1e-3)

    def emit(metric, value, unit, vs):
        print(json.dumps({"metric": metric, "value": round(value, 3),
                          "unit": unit, "vs_baseline": round(vs, 4)}))

    def guard(name, fn):
        try:
            fn()
        except Exception as e:  # one broken row must not hide the rest
            print(json.dumps({"metric": name, "error": str(e)[:160]}))

    def spmv_row(metric, coo, conv, op, make_x, traffic, flops, iters):
        a = conv(coo)
        x = make_x(a)
        op(a, x)  # warm-up/compile
        t, _ = chained_time(lambda c, m: op(m, c) * scale, x, a,
                            iters_lo=iters, iters_hi=10 * iters)
        emit(metric, flops(a) / t * 1e-9, "GFLOP/s", traffic(a) / t / bw)

    # -- SDIA on the 2-D Laplacian (static-offset DIA; the r2/r3
    # 0.89-roofline row) -------------------------------------------------
    lap = laplacian_2d(1024 if on_tpu else 48, 1024 if on_tpu else 48,
                       np.float32)
    guard("sdia_laplacian_fp32_gflops", lambda: spmv_row(
        "sdia_laplacian_fp32_gflops", lap, coo_to_sdia, sdia_spmv,
        lambda a: jnp.asarray(np.random.default_rng(1).standard_normal(
            lap.n_cols), jnp.float32),
        lambda a: a.storage_bytes + (lap.n_rows + lap.n_cols) * 4,
        lambda a: 2.0 * lap.nnz, iters=100 if on_tpu else 3))

    # -- WHDIA on banded-11 (the HDIA-class row) -------------------------
    band = random_banded((1 << 19) if on_tpu else 4000, bands=11, wander=7,
                         seed=2, dtype=np.float32).sum_duplicates()
    guard("whdia_banded11_fp32_gflops", lambda: spmv_row(
        "whdia_banded11_fp32_gflops", band, coo_to_whdia, whdia_spmv,
        lambda a: jnp.asarray(np.random.default_rng(1).standard_normal(
            band.n_cols), jnp.float32),
        # 4 B value (+2 B lane-replicated r0 in slab mode) per cell + x/z
        lambda a: a.values.size * (6 if a.slot_r0 is not None else 4)
        + band.n_rows * 8,
        lambda a: 2.0 * band.nnz, iters=100 if on_tpu else 3))

    # -- fused 8-RHS SpMM on the FEM flagship matrix ----------------------
    fem = random_fem_like((1 << 18) if on_tpu else 4000, 27.0, span=768,
                          far_frac=0.01, seed=0, dtype=np.float32)
    guard("whell_spmm8_fp32_gflops", lambda: spmv_row(
        "whell_spmm8_fp32_gflops", fem,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmm(a, x),
        lambda a: jnp.asarray(np.random.default_rng(3).standard_normal(
            (8, a.n_cols)), jnp.float32),
        lambda a: 8 * (a.values.size * 6 + fem.n_rows * 8),
        lambda a: 8 * 2.0 * fem.nnz, iters=30 if on_tpu else 2))

    # -- WHELL double-float (fp64) — D-precision hellspmv parity row ------
    lap_dd = laplacian_2d(512 if on_tpu else 32, 512 if on_tpu else 32,
                          np.float64)
    guard("whell_dd_laplacian_gflops", lambda: spmv_row(
        "whell_dd_laplacian_gflops", lap_dd,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmv(a, x),
        lambda a: jnp.asarray(np.stack(_dd.split(
            np.random.default_rng(1).standard_normal(a.n_cols))),
            jnp.float32),
        lambda a: a.values.size * 10 + a.n_rows * 16,
        lambda a: 2.0 * lap_dd.nnz, iters=30 if on_tpu else 2))

    # -- complex64 banded — the WHDIA plane-pair fast path (r3) -----------
    bc = random_banded((1 << 19) if on_tpu else 1200, bands=11, wander=7,
                       seed=2, dtype=np.float64).sum_duplicates()
    rng_c = np.random.default_rng(8)
    band_c = CooMatrix(bc.rows, bc.cols,
                       (bc.values + 1j * rng_c.standard_normal(bc.nnz))
                       .astype(np.complex64), bc.n_rows, bc.n_cols)
    # default path is now the FUSED one-pass kernel (r5): both value
    # planes stream once, shared decode/gathers — 8 B/cell (+2 shared
    # r0 in slab mode) vs the plane-pair path's 16
    guard("whdia_c64_banded11_gflops", lambda: spmv_row(
        "whdia_c64_banded11_gflops", band_c, coo_to_whdia, whdia_spmv,
        lambda a: jnp.asarray(a.embed_complex(
            (rng_c.standard_normal(band_c.n_cols)
             + 1j * rng_c.standard_normal(band_c.n_cols))
            .astype(np.complex64))),
        lambda a: a.ar.values.size
        * (10 if a.ar.slot_r0 is not None else 8) + band_c.n_rows * 16,
        lambda a: 8.0 * band_c.nnz, iters=30 if on_tpu else 2))

    # -- bf16-values flagship (precision extension, honestly labelled:
    # bytes/cell 6 -> 4; fp32 accumulate; the companion _relerr row is
    # the accuracy cost so users can choose — VERDICT r4 #8) -----------
    def bf16_row():
        fem16 = random_fem_like((1 << 18) if on_tpu else 4000, 27.0,
                                span=768, far_frac=0.01, seed=0,
                                dtype=np.float32)
        a = coo_to_whell(fem16, packed=True, dtype=jnp.bfloat16)
        x = jnp.asarray(a.embed(np.random.default_rng(1).standard_normal(
            fem16.n_cols)), jnp.float32)
        z = np.asarray(whell_spmv(a, x), np.float64)
        af = coo_to_whell(fem16, packed=True)
        zf = np.asarray(whell_spmv(af, x), np.float64)
        rel = float(np.linalg.norm(z - zf) / np.linalg.norm(zf))
        t, _ = chained_time(lambda c, m: whell_spmv(m, c) * scale, x, a,
                            iters_lo=100 if on_tpu else 3,
                            iters_hi=1000 if on_tpu else 6)
        traffic = a.values.size * 4 + fem16.n_rows * 8
        emit("whell_bf16_flagship_gflops", 2.0 * fem16.nnz / t * 1e-9,
             "GFLOP/s", traffic / t / bw)
        emit("whell_bf16_flagship_relerr", rel, "rel_err_vs_fp32", rel)

    guard("whell_bf16_flagship_gflops", bf16_row)

    # -- large-matrix row-blocked path (4.2M rows fp32 + dd) + warm
    # blocks-CG ms/iter — the r4 numbers existed only as BASELINE.md
    # prose; a regression in parallel/blocks.py was driver-invisible
    # (VERDICT r4 weak #6) ---------------------------------------------
    def blocks_rows():
        import time as _time

        from spgpu_tpu.parallel.blocks import (
            blocks_cg, blocks_spmv_tuple, coo_to_whell_blocks)

        nb = (1 << 22) if on_tpu else (1 << 14)
        nblk = None if on_tpu else 2  # tiny CPU config still multi-block
        fem_l = random_fem_like(nb, 9.0, span=1200 if on_tpu else 200,
                                far_frac=0.005 if on_tpu else 0.002,
                                seed=5, dtype=np.float32)
        a = coo_to_whell_blocks(fem_l, n_blocks=nblk)

        def time_blocks(a, dd):
            # the zero-copy tuple path on interval plans (the r3/r4
            # production protocol); flat-gather plans (possible on tiny
            # CPU smoke fixtures) time the stacked-state path instead
            if a.halo_src is None:
                from spgpu_tpu.parallel.blocks import embed_tuple

                xh = np.random.default_rng(2).standard_normal(a.n_rows)
                xs = tuple(jnp.asarray(v)
                           for v in embed_tuple(a, xh))
                blocks_spmv_tuple(a, xs)  # compile
                return chained_time(
                    lambda c, m: tuple(z * scale
                                       for z in blocks_spmv_tuple(m, c)),
                    xs, a, iters_lo=20 if on_tpu else 2,
                    iters_hi=200 if on_tpu else 4)[0]
            from spgpu_tpu.parallel.blocks import blocks_spmv

            shape = (a.n_blocks, 2, a.n_lane) if dd else (a.n_blocks,
                                                          a.n_lane)
            x = jnp.asarray(np.random.default_rng(2).standard_normal(
                shape), jnp.float32)
            blocks_spmv(a, x)  # compile
            return chained_time(
                lambda c, m: blocks_spmv(m, c) * scale, x, a,
                iters_lo=20 if on_tpu else 2,
                iters_hi=200 if on_tpu else 4)[0]

        t = time_blocks(a, dd=False)
        emit("blocks_4m_fp32_gflops", 2.0 * fem_l.nnz / t * 1e-9,
             "GFLOP/s",
             sum(m.values.size * 6 for m in a.mats) / t / bw)

        # dd (fp64) SpMV + warm CG on an SPD banded system (symmetrise
        # A <- (A + A^T)/2; the wandering band keeps diagonal dominance)
        from spgpu_tpu.formats.coo import CooMatrix

        bl = random_banded(nb, bands=9, wander=3, seed=6,
                           dtype=np.float64)
        idxd = np.arange(nb, dtype=np.int64)
        # diag shift 30 > the max row sum of ~18 half-normal off-diag
        # magnitudes, so dominance (hence SPD) holds at any n
        band_l = CooMatrix(
            np.concatenate([bl.rows, bl.cols, idxd]),
            np.concatenate([bl.cols, bl.rows, idxd]),
            np.concatenate([bl.values * 0.5, bl.values * 0.5,
                            np.full(nb, 30.0)]),
            nb, nb).sum_duplicates()
        ad = coo_to_whell_blocks(band_l, n_blocks=nblk)
        t = time_blocks(ad, dd=True)
        emit("blocks_4m_dd_gflops", 2.0 * band_l.nnz / t * 1e-9,
             "GFLOP/s",
             sum(m.values.size * 10 for m in ad.mats) / t / bw)

        b = np.random.default_rng(3).standard_normal(nb)
        # warm with the SAME (tol, maxiter): both are static args of
        # the cached runner, so a different warm config would leave the
        # timed call paying the full CG-program compile
        res = blocks_cg(ad, b, tol=1e-12, maxiter=60)
        t0 = _time.perf_counter()
        res = blocks_cg(ad, b, tol=1e-12, maxiter=60)
        dt = _time.perf_counter() - t0
        it = max(int(res.iterations), 1)
        rel = float(res.residual_norm) / max(float(np.linalg.norm(b)),
                                             1e-30)
        # vs_baseline = convergence quality: 1.0 = solved to precision,
        # 0.0 = diverged (rel residual >= 1 / nan)
        ok = 1.0 - min(rel, 1.0) if np.isfinite(rel) else 0.0
        emit("blocks_cg_warm_ms_per_iter", dt / it * 1e3, "ms/iter", ok)

    guard("blocks_4m_fp32_gflops", blocks_rows)

    # -- ragged halo plan waste (static plan property — no mesh needed,
    # so the single-chip driver run still regression-tracks the
    # distributed exchange; CPU-mesh timing lives in bench/harness) ----
    def halo_row():
        from spgpu_tpu.parallel.partition_packed import (
            partition_coo_rows_packed)

        S = 8
        n = (65536 if on_tpu else 8192) * S
        coo = random_banded(n, bands=11, wander=3, seed=2,
                            dtype=np.float32).sum_duplicates()
        pm = partition_coo_rows_packed(coo, S)
        used = sum(sum(p) for p in pm.halo_counts)
        sent = sum(len(perm) * pm.halo_send_off[i].shape[1]
                   for i, (_o, perm) in enumerate(pm.halo_offsets))
        waste = 1.0 - used / sent if sent else 0.0
        emit("dist_halo_waste_8shards", waste, "fraction", 1.0 - waste)

    guard("dist_halo_waste_8shards", halo_row)

    # -- complex64 Laplacian — the fused one-pass SDIA complex kernel
    # (r5: shared per-diagonal rotations; dia_cspmv.cu parity) ---------
    def sdia_c64_row():
        lap_c = laplacian_2d(1024 if on_tpu else 40,
                             1024 if on_tpu else 40, np.float64)
        rng8 = np.random.default_rng(12)
        cm = CooMatrix(lap_c.rows, lap_c.cols,
                       (lap_c.values + 1j * rng8.standard_normal(
                           lap_c.nnz)).astype(np.complex64),
                       lap_c.n_rows, lap_c.n_cols)
        a = coo_to_sdia(cm)
        xc = (rng8.standard_normal(cm.n_cols)
              + 1j * rng8.standard_normal(cm.n_cols)).astype(np.complex64)
        x = jnp.asarray(a.embed_complex(xc))
        sdia_spmv(a, x)  # warm-up/compile
        t, _ = chained_time(lambda c, m: sdia_spmv(m, c) * scale, x, a,
                            iters_lo=60 if on_tpu else 2,
                            iters_hi=400 if on_tpu else 4)
        traffic = 2 * a.ar.values.size * 4 + cm.n_rows * 16
        emit("sdia_c64_laplacian_gflops", 8.0 * cm.nnz / t * 1e-9,
             "GFLOP/s", traffic / t / bw)

    guard("sdia_c64_laplacian_gflops", sdia_c64_row)

    # -- BLAS-1 dot at 256 MB/vector (scalar-carry protocol, r3) ----------
    def dot_row():
        from spgpu_tpu.ops import blas1

        n = (1 << 26) if on_tpu else (1 << 16)
        rng = np.random.default_rng(7)
        xv = jnp.asarray(rng.standard_normal(n), jnp.float32)
        yv = jnp.asarray(rng.standard_normal(n), jnp.float32)
        tiny = jnp.float32(1e-30)

        # scalar carry chains each dot into the next (the r3 protocol);
        # chained_time's min-of-reps two-point fit replaces the old
        # single-shot subtraction, whose ~±10 ms dispatch jitter could
        # exceed the 12-iteration signal and go NEGATIVE (seen once)
        t, _ = chained_time(
            lambda c, a, b: blas1.dot(a, b + c * tiny) * jnp.float32(1e-20),
            jnp.float32(0.0), xv, yv,
            iters_lo=24 if on_tpu else 3, iters_hi=240 if on_tpu else 6)
        emit("blas1_dot_gbs", 2 * n * 4 / t / 1e9, "GB/s",
             (2 * n * 4 / t) / bw)

    guard("blas1_dot_gbs", dot_row)


def main():
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.convert import coo_to_whell
    from spgpu_tpu.ops import whell_spmv
    from spgpu_tpu.ops.blas1 import dot
    from spgpu_tpu.utils.fixtures import random_fem_like

    if "--flagship-only" not in sys.argv:
        _suite_rows()

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = 1 << 18 if on_tpu else 1 << 13
    iters = 200 if on_tpu else 5

    coo = random_fem_like(n, avg_nnz_per_row=27.0, span=768, far_frac=0.01,
                          seed=0, dtype=np.float32)
    # packed-lane layout (r2): proportional lane segments kill the
    # power-law raggedness (pad 5.9x -> 2.7x measured) and the product
    # runs in lane space end-to-end (solver-ready, like the r1 relabel).
    # Default geometry (gh=512): gh=1024 cuts padding 1.74x -> 1.68x but
    # measures time-neutral (op-bound kernel) and its 8.4 MB accumulator
    # scratch leaves no scoped-VMEM headroom (doc/DESIGN.md §2c-2)
    a = coo_to_whell(coo, packed=True)
    nnz = coo.nnz
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(a.n_cols), jnp.float32)

    scale = jnp.float32(1e-3)

    @jax.jit
    def spmv(a, x):
        return whell_spmv(a, x)

    # warm-up + checksum (hellPerf.cpp:209-234)
    z = spmv(a, x)
    checksum = float(dot(z, z))

    # chained fori loop, 4-byte scalar fence, and two-point overhead
    # extrapolation: the axon runtime charges ~30 ms per jitted call,
    # which at 200 in-loop iterations still inflated every sub-ms
    # kernel time ~2x (utils/timing.chained_time, DESIGN.md §5)
    from spgpu_tpu.utils.timing import chained_time

    t, overhead = chained_time(lambda c, a: whell_spmv(a, c) * scale, x, a,
                               iters_lo=iters, iters_hi=10 * iters)

    gflops = (2.0 * nnz - 1.0) / t * 1e-9
    # actual traffic: value slab + int8 residue/page-table slabs + x + z.
    # NOTE vs round 1: the packed layout moves ~2.8x FEWER bytes for the
    # same 2*nnz work, so the bytes-moved roofline fraction DROPS while
    # GFLOPS (the cross-round comparable number, 5.8x r1) rises.
    # vs_baseline is computed against the 819 GB/s SPEC bandwidth; the
    # measured achievable Pallas streaming rate is 747 GB/s (0.91 of
    # spec, doc/DESIGN.md §2f), so 0.65 here = 0.71 of achievable, with
    # the gap being ~3.8 ns/tile of diffuse per-tile compute.
    slab = int(a.values.size) * (4 + 1 + 1)
    bytes_moved = slab + a.n_cols * 4 * 2
    bw = hbm_bandwidth(dev)
    vs = (bytes_moved / t) / bw if bw else 0.0

    print(
        f"device={dev.device_kind} n={n} nnz={nnz} pad={a.values.size/nnz:.2f} "
        f"storage={a.storage_bytes}B checksum={checksum:.6e} "
        f"t_avg={t*1e3:.3f}ms call_overhead={overhead*1e3:.1f}ms "
        f"eff_bw={bytes_moved/t/1e9:.1f}GB/s roofline_frac={vs:.3f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "whell_spmv_fp32_gflops",
                "value": round(gflops, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--mtx" in sys.argv:
        main_mtx(sys.argv)
    else:
        main()
