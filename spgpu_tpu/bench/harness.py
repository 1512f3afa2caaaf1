"""Benchmark harness implementation.

``run_config`` measures one (matrix, format) pair; ``run_suite`` covers
the BASELINE.json config classes:

* ELL fp64/fp32 on a 2-D 5-point Laplacian (CPU-runnable config);
* WHELL (the HELL-class Pallas path) on irregular FEM-profile matrices;
* WHDIA (the HDIA-class Pallas path) on banded matrices;
* BLAS-1 + 8-RHS multivector suite;
* XLA fallback paths for cross-checking.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class BenchResult:
    config: str
    fmt: str
    n_rows: int
    nnz: int
    storage_bytes: int
    pad_factor: float
    t_avg_s: float
    gflops: float
    eff_bandwidth_gbs: float
    roofline_frac: Optional[float]
    checksum: float

    def json(self) -> str:
        d = dataclasses.asdict(self)
        d["t_avg_s"] = round(self.t_avg_s, 9)
        for k in ("gflops", "eff_bandwidth_gbs", "pad_factor"):
            d[k] = round(d[k], 3)
        if d["roofline_frac"] is not None:
            d["roofline_frac"] = round(d["roofline_frac"], 4)
        return json.dumps(d)


def _time_chained(spmv: Callable, a, x, iters: int) -> float:
    """Chained-loop device time per SpMV, dispatch overhead subtracted.

    The axon runtime charges ~30 ms per jitted CALL (tunnel round
    trips); :func:`spgpu_tpu.utils.timing.chained_time` removes it by
    timing two loop lengths and extrapolating.  ``iters`` is the short
    length; the long one is 10x."""
    import jax.numpy as jnp

    from spgpu_tpu.utils.timing import chained_time

    scale = jnp.asarray(1e-3, x.dtype)
    t, _ = chained_time(lambda c, a: spmv(a, c) * scale, x, a,
                        iters_lo=iters, iters_hi=10 * iters)
    return t


def run_config(
    config: str,
    fmt: str,
    coo,
    convert: Callable,
    spmv: Callable,
    traffic_bytes: Callable,
    iters: int = 20,
    seed: int = 1,
    flops_factor: float = 1.0,
    make_x: Optional[Callable] = None,
) -> BenchResult:
    """Measure one (matrix, format) pair with the §3.5 protocol."""
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.ops.blas1 import dot

    a = convert(coo)
    if make_x is not None:
        x = make_x(a, coo, np.random.default_rng(seed))
    else:
        # packed layouts run in lane space: size x by the converted matrix
        x = jnp.asarray(
            np.random.default_rng(seed).standard_normal(
                getattr(a, "n_cols", coo.n_cols)),
            coo.values.dtype,
        )
    z = spmv(a, x)  # warm-up
    checksum = float(np.asarray(dot(z, z)).sum())
    t = _time_chained(spmv, a, x, iters)
    nnz = coo.nnz
    gflops = flops_factor * (2.0 * nnz - 1.0) / t * 1e-9
    bytes_moved = traffic_bytes(a, coo)
    bw = hbm_bandwidth()
    pad = getattr(a, "values", np.zeros(1))
    pad_factor = (pad.size / max(nnz, 1)) if hasattr(pad, "size") else 0.0
    return BenchResult(
        config=config,
        fmt=fmt,
        n_rows=coo.n_rows,
        nnz=nnz,
        storage_bytes=int(getattr(a, "storage_bytes", 0)),
        pad_factor=float(pad_factor),
        t_avg_s=t,
        gflops=gflops,
        eff_bandwidth_gbs=bytes_moved / t / 1e9,
        roofline_frac=(bytes_moved / t) / bw if bw else None,
        checksum=checksum,
    )


def run_suite(size: str = "small", out=print):
    """Run the BASELINE config classes; emits one JSON line per result.

    ``size``: "small" (CPU/CI-friendly) or "chip" (full single-chip
    sizes).  Returns the list of :class:`BenchResult`.
    """
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.convert import (
        coo_to_ell,
        coo_to_whdia,
        coo_to_whell,
    )
    from spgpu_tpu.ops import ell_spmv, whdia_spmv, whell_spmv
    from spgpu_tpu.utils.fixtures import (
        laplacian_2d,
        random_banded,
        random_fem_like,
    )

    big = size == "chip"
    on_tpu = jax.default_backend() == "tpu"
    fp = np.float32 if on_tpu else np.float64

    results = []

    def emit(r):
        results.append(r)
        out(r.json())

    # -- ELL on the Laplacian (XLA path; CPU-runnable golden config).
    # Kept small even on chip: the XLA gather lowering is the documented
    # slow path and big instances compile for minutes.
    lap = laplacian_2d(64 if big else 48, 64 if big else 48, fp)
    isz = np.dtype(fp).itemsize
    emit(run_config(
        "laplacian_2d", "ell_xla", lap, coo_to_ell,
        lambda a, x: ell_spmv(a, x, impl="xla"),
        lambda a, coo: a.values.size * (isz + 4) + coo.n_rows * isz * 2,
        iters=5,
    ))

    # -- WHELL on FEM-profile irregular (the HELL-class flagship; packed
    # lane layout, round 2) ----------------------------------------------
    fem = random_fem_like(
        (1 << 18) if big else 20000, 27.0,
        span=768, far_frac=0.01, seed=0, dtype=np.float32,
    )
    emit(run_config(
        "fem_irregular", "whell_packed_pallas", fem,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmv(a, x),
        lambda a, coo: a.values.size * 6 + coo.n_rows * 8,
        iters=200 if big else 5,
    ))

    # -- WHDIA on banded (the HDIA-class config) -------------------------
    band = random_banded(
        (1 << 19) if big else 20000, bands=11, wander=7, seed=2,
        dtype=np.float32,
    ).sum_duplicates()
    emit(run_config(
        "banded", "whdia_pallas", band, coo_to_whdia,
        lambda a, x: whdia_spmv(a, x),
        # 4B value (+2B lane-replicated r0 in slab mode) per cell
        # (formats/whdia.py; pattern mode is values-only)
        lambda a, coo: a.values.size * (6 if a.slot_r0 is not None else 4)
        + coo.n_rows * 8,
        iters=200 if big else 5,
    ))

    # -- SDIA on stencil matrices (static-offset DIA; the spgpu?diaspmv
    # parity class).  Straight band + 2-D Laplacian; values-only traffic.
    from spgpu_tpu.convert import coo_to_sdia
    from spgpu_tpu.ops import sdia_spmv

    band_s = random_banded(
        (1 << 19) if big else 20000, bands=11, wander=0, seed=2,
        dtype=np.float32,
    ).sum_duplicates()
    sdia_traffic = lambda a, coo: (
        a.storage_bytes + (coo.n_rows + coo.n_cols)
        * np.dtype(np.float32).itemsize)
    emit(run_config(
        "banded_straight", "sdia_pallas", band_s, coo_to_sdia,
        lambda a, x: sdia_spmv(a, x),
        sdia_traffic, iters=200 if big else 5,
    ))
    lap_big = laplacian_2d(1024 if big else 48, 1024 if big else 48,
                           np.float32)
    emit(run_config(
        "laplacian_2d", "sdia_pallas", lap_big, coo_to_sdia,
        lambda a, x: sdia_spmv(a, x),
        sdia_traffic, iters=200 if big else 5,
    ))

    # -- SDIA double-float (fp64) — D-precision dia_dspmv parity row
    from spgpu_tpu.ops import dd as _ddmod

    lap_dd = laplacian_2d(1024 if big else 32, 1024 if big else 32,
                          np.float64)
    emit(run_config(
        "laplacian_2d_fp64", "sdia_dd_pallas", lap_dd, coo_to_sdia,
        lambda a, x: sdia_spmv(a, x),
        lambda a, coo: (a.storage_bytes
                        + (coo.n_rows + coo.n_cols) * 8),
        iters=(100 if big else 3),
        make_x=lambda a, coo, rng: jnp.asarray(
            _ddmod.split(rng.standard_normal(coo.n_cols))),
    ))

    # -- WHELL double-float (fp64) — D-precision hellspmv parity row
    lap_wdd = laplacian_2d(512 if big else 32, 512 if big else 32,
                           np.float64)
    emit(run_config(
        "laplacian_2d_fp64", "whell_dd_pallas", lap_wdd,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmv(a, x),
        # hi+lo fp32 value planes (8 B) + int16 index slab (2 B) per
        # cell; dd x and z are (2, n) fp32 stacks
        lambda a, coo: a.values.size * 10 + a.n_rows * 16,
        iters=(50 if big else 3),
        make_x=lambda a, coo, rng: jnp.asarray(
            np.stack(_ddmod.split(rng.standard_normal(a.n_cols))),
            jnp.float32),
    ))

    # -- complex64 (C-precision) WHELL — hell_cspmv parity row: 4 real
    # plane products sharing one layout (formats/whell.py WhellComplex)
    from spgpu_tpu.formats.coo import CooMatrix

    # small size kept tiny: the CPU path interprets 4 plane products
    # per chained iteration (33 per timing), which dominates CI time
    fem_c_base = random_fem_like((1 << 18) if big else 1500, 27.0,
                                 span=768, far_frac=0.01, seed=5,
                                 dtype=np.float32)
    rng_c = np.random.default_rng(6)
    fem_c = CooMatrix(
        fem_c_base.rows, fem_c_base.cols,
        (fem_c_base.values
         + 1j * rng_c.standard_normal(fem_c_base.nnz)).astype(np.complex64),
        fem_c_base.n_rows, fem_c_base.n_cols)
    emit(run_config(
        "fem_irregular_c64", "whell_complex_pallas", fem_c,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmv(a, x),
        # 4 plane products, each streaming one 6 B/cell slab + vectors
        lambda a, coo: 4 * (a.values.size * 6 + a.n_rows * 8),
        iters=(50 if big else 3), flops_factor=4.0,
        make_x=lambda a, coo, rng: jnp.asarray(
            rng.standard_normal((2, a.n_cols)), jnp.float32),
    ))

    # -- complex64 banded — dia_cspmv/hdia_cspmv parity row: the C plane
    # pair on the WHDIA fast path (r3; formats/cplanes.py)
    band_c_base = random_banded((1 << 19) if big else 1200, bands=11,
                                wander=7, seed=2,
                                dtype=np.float64).sum_duplicates()
    rng_bc = np.random.default_rng(8)
    band_c = CooMatrix(
        band_c_base.rows, band_c_base.cols,
        (band_c_base.values
         + 1j * rng_bc.standard_normal(band_c_base.nnz)).astype(np.complex64),
        band_c_base.n_rows, band_c_base.n_cols)
    emit(run_config(
        "banded_c64", "whdia_complex_pallas", band_c, coo_to_whdia,
        lambda a, x: whdia_spmv(a, x),
        # 4 plane products, each streaming a 6 B/cell slab + vectors
        lambda a, coo: 4 * (a.values.size * 6 + coo.n_rows * 8),
        iters=(50 if big else 3), flops_factor=4.0,
        make_x=lambda a, coo, rng: jnp.asarray(
            rng.standard_normal((2, a.n_cols)), jnp.float32),
    ))

    # -- 8-RHS SpMM: Pallas loop-of-SpMV on WHELL ------------------------
    from spgpu_tpu.ops import whell_spmm

    # carry is the full (8, n) block: building the block inside the
    # timed lambda (r2) charged an extra broadcast-multiply + sum
    # epilogue to every iteration and understated the kernel ~40%
    emit(run_config(
        "fem_irregular", "whell_pallas_spmm8", fem,
        lambda c: coo_to_whell(c, packed=True),
        lambda a, x: whell_spmm(a, x),
        lambda a, coo: 8 * (a.values.size * 6 + coo.n_rows * 8),
        iters=50 if big else 3, flops_factor=8.0,
        make_x=lambda a, coo, rng: jnp.asarray(
            rng.standard_normal((8, a.n_cols)), jnp.float32),
    ))

    # -- 8-RHS SpMM through the XLA multivector path (small instance —
    # the XLA gather path is the documented slow one) --------------------
    fem_s = random_fem_like(20000, 27.0, span=768, far_frac=0.01, seed=0,
                            dtype=np.float32)
    emit(_run_spmm8(fem_s, out=None))

    # -- BLAS-1 roofline rows (dot / axpby / nrm2; reference measures dot
    # in every harness, hellPerf.cpp:234).  n on chip is sized so the
    # working set exceeds VMEM: at <=16 MB/vector XLA keeps the chained
    # loop carry VMEM-resident and "bandwidth" reads 1.7-7 TB/s — a real
    # effect (measured, BASELINE.md) but not an HBM roofline row.
    for r in run_blas1_suite(n=(1 << 26) if big else (1 << 16),
                             iters=50 if big else 5):
        results.append(r)
        out(json.dumps(r))

    # -- conversion-time + vendor/CPU baselines --------------------------
    for r in run_baseline_rows(fem, big):
        results.append(r)
        out(json.dumps(r))

    return results


def run_weak_scaling(rows_per_shard: int = 65536, shards=(1, 2, 4, 8),
                     iters: int = 20, out=print, breakdown: bool = True,
                     overlap: bool = True):
    """Weak-scaling nnz/s efficiency of the PACKED distributed SpMV
    (:mod:`spgpu_tpu.parallel.partition_packed`): matrix rows grow with
    the shard count, efficiency = (nnz/s at S shards) / (S x nnz/s at 1
    shard).  On the CPU virtual-device mesh this is a machinery check
    (virtual devices share one memory system — not a TPU prediction);
    on a real pod slice it is the BASELINE ">=80% at 2+ hosts" row.

    ``breakdown=True`` additionally times each STAGE of the matvec in
    its own chained loop — halo collective (pack + all-to-all +
    scatter), interior SpMV, exterior SpMV — and reports the overlap
    gain ``(t_coll + t_int + t_ext) − t_full`` plus the K-padding
    waste of the all-to-all (``S·K`` padded slots sent per pair vs the
    real halo lanes used), so an efficiency number comes with the
    reason attached rather than a guess (VERDICT r3 weak #3).
    Returns one JSON-able dict per shard count."""
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.parallel.dist_spmv import (
        _leaf_spec, local_matvec, shard_partitioned)
    from spgpu_tpu.parallel.partition import make_row_mesh
    from spgpu_tpu.parallel.partition_packed import partition_coo_rows_packed
    from spgpu_tpu.utils.fixtures import random_banded
    from spgpu_tpu.utils.timing import chained_time
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = len(jax.devices())
    rows = []
    base_rate = None
    for S in shards:
        if S > ndev:
            continue
        n = rows_per_shard * S
        coo = random_banded(n, bands=11, wander=3, seed=2,
                            dtype=np.float32).sum_duplicates()
        pm = partition_coo_rows_packed(coo, S, overlap=overlap)
        mesh = make_row_mesh(S)
        pm_s = shard_partitioned(pm, mesh)

        def smap(body):
            return jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(_leaf_spec(pm, "rows"), P("rows")),
                out_specs=P("rows"), check_vma=False))

        f = smap(partial(local_matvec, pm, "rows"))
        rng = np.random.default_rng(0)
        x0 = jax.device_put(
            jnp.asarray(pm.embed(rng.standard_normal(n))),
            NamedSharding(mesh, P("rows")))
        scale = jnp.float32(1e-3)
        t, _ = chained_time(lambda c, p: f(p, c) * scale, x0, pm_s,
                            iters_lo=iters, iters_hi=10 * iters)
        rate = coo.nnz / t
        if base_rate is None:
            base_rate = rate / S  # per-shard rate at the smallest mesh
        row = {
            "config": "weak_scaling", "fmt": "packed_dist_spmv",
            "shards": S, "n_rows": n, "nnz": coo.nnz,
            "t_avg_s": round(t, 9), "nnz_per_s": round(rate, 0),
            "efficiency": round(rate / (S * base_rate), 4),
        }
        if breakdown:
            def coll_body(lpm, xb):
                from spgpu_tpu.parallel.dist_spmv import _halo_exchange

                return _halo_exchange(pm, "rows", lpm, xb[0])[None]

            def int_body(lpm, xb):
                from spgpu_tpu.ops import whell_spmv

                a = pm.local_view(lpm)
                return whell_spmv(a, xb[0][..., : a.n_cols])[None]

            stage_fns = {"coll": smap(coll_body), "int": smap(int_body)}
            if pm.overlapped:
                def ext_body(lpm, xb):
                    from spgpu_tpu.ops import whell_spmv

                    a = pm.local_view_ext(lpm)
                    return whell_spmv(a, xb[0][..., : a.n_cols])[None]

                stage_fns["ext"] = smap(ext_body)
            t_sum = 0.0
            for name, fn in stage_fns.items():
                ts, _ = chained_time(lambda c, p: fn(p, c) * scale, x0,
                                     pm_s, iters_lo=iters,
                                     iters_hi=10 * iters)
                row[f"t_{name}_s"] = round(ts, 9)
                t_sum += ts
            row["overlap_gain_s"] = round(t_sum - t, 9)
            used = sum(sum(p) for p in pm.halo_counts) if pm.halo_counts \
                else 0
            if getattr(pm, "halo_offsets", ()):
                # ragged plan (r5): one ppermute per live offset, each
                # at its own width with zero-width pairs omitted
                sent = sum(len(perm) * pm.halo_send_off[i].shape[1]
                           for i, (_o, perm) in enumerate(pm.halo_offsets))
            else:
                sent = S * S * pm.halo_width
            row["halo_lanes_used"] = used
            row["halo_slots_sent"] = sent
            row["halo_bytes_per_iter"] = sent * 4
            # used == 0 means NO halo exists (S=1 / block-diagonal):
            # report 0 waste, not the legacy formula's vacuous 1.0
            row["k_padding_waste"] = round(1.0 - used / sent, 4) \
                if sent and used else 0.0
        rows.append(row)
        if out:
            out(json.dumps(row))
    return rows


def run_blas1_suite(n: int, iters: int = 200):
    """Device-resident BLAS-1 rows.

    Reductions (dot/nrm2/asum/amax) chain through a SCALAR carry fused
    into an operand read (``op(a, b + s*tiny)``): the r2 protocol
    carried the VECTOR through an elementwise multiply, silently adding
    a full read+write of the carry per iteration — dot appeared at
    0.43 of roofline when the true rate is 0.92 (r3 chip: dot 753,
    nrm2 745, asum 740, amax 750 GB/s — all at the 747 GB/s measured
    streaming ceiling; XLA's reductions need no custom kernel).
    Elementwise ops keep the vector carry (it IS the output)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.ops import blas1

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    bw = hbm_bandwidth()
    rows = []
    tiny = jnp.float32(1e-30)

    def timed_scalar(op, iters):
        @jax.jit
        def run(a, b, it):
            def body(_, s):
                return op(a, b, s) * jnp.float32(1e-20)

            return jax.lax.fori_loop(0, it, body, jnp.float32(0.0))

        float(run(x, y, iters))
        t0 = _time.perf_counter()
        float(run(x, y, iters))
        t1 = _time.perf_counter()
        float(run(x, y, 10 * iters))
        t2 = _time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (9 * iters)

    red_cases = {
        "dot": (lambda u, v, s: blas1.dot(u, v + s * tiny), 2 * n * 4),
        "nrm2": (lambda u, v, s: blas1.nrm2(u + s * tiny), n * 4),
        "asum": (lambda u, v, s: blas1.asum(u + s * tiny), n * 4),
        "amax": (lambda u, v, s: blas1.amax(u + s * tiny), n * 4),
    }
    for name, (op, bytes_per) in red_cases.items():
        t = timed_scalar(op, max(iters // 4, 2))
        rows.append({
            "config": "blas1", "op": name, "n": n,
            "t_avg_s": round(t, 9),
            "eff_bandwidth_gbs": round(bytes_per / t / 1e9, 3),
            "roofline_frac": round((bytes_per / t) / bw, 4) if bw else None,
        })

    from spgpu_tpu.utils.timing import chained_time

    t, _ = chained_time(
        lambda c, v: blas1.axpby(1.000001, c, 0.999999, v), x, y,
        iters_lo=iters, iters_hi=10 * iters)
    rows.append({
        "config": "blas1", "op": "axpby", "n": n,
        "t_avg_s": round(t, 9),
        "eff_bandwidth_gbs": round(3 * n * 4 / t / 1e9, 3),
        "roofline_frac": round((3 * n * 4 / t) / bw, 4) if bw else None,
    })
    return rows


def run_baseline_rows(fem, big: bool):
    """Anchoring rows: packed-WHELL conversion time, scipy-CPU SpMV, and
    a COMPLETING jax.experimental.sparse BCOO row at a small size (the
    r1 attempt at full size timed out — recorded; cusparsePerf is the
    reference's analogous vendor harness)."""
    import jax
    import jax.numpy as jnp

    rows = []

    from spgpu_tpu.convert import coo_to_whell

    t0 = time.perf_counter()
    a = coo_to_whell(fem, packed=True)
    t_conv = time.perf_counter() - t0
    # steady-state: the first call in a process additionally pays the
    # microVM soft-page-fault cost of faulting in the working set
    # (utils/hostmem.py keeps those pages resident for every later
    # conversion, which is what a solver pipeline sees)
    t0 = time.perf_counter()
    a = coo_to_whell(fem, packed=True)
    t_warm = time.perf_counter() - t0
    rows.append({
        "config": "conversion", "op": "coo_to_whell_packed",
        "nnz": fem.nnz, "t_cold_s": round(t_conv, 3),
        "t_s": round(t_warm, 3),
        "nnz_per_s": round(fem.nnz / t_warm, 0),
    })

    # scipy CPU SpMV (CSR) — the host-library anchor
    try:
        import scipy.sparse as sp

        A = sp.coo_matrix((fem.values, (fem.rows, fem.cols)),
                          shape=fem.shape).tocsr()
        xh = np.random.default_rng(1).standard_normal(fem.n_cols).astype(
            np.float32)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            A @ xh
        t = (time.perf_counter() - t0) / reps
        rows.append({
            "config": "vendor", "op": "scipy_csr_cpu", "nnz": fem.nnz,
            "t_avg_s": round(t, 6),
            "gflops": round(2 * fem.nnz / t / 1e9, 3),
        })
    except Exception as e:  # pragma: no cover
        rows.append({"config": "vendor", "op": "scipy_csr_cpu",
                     "error": str(e)[:80]})

    # jax.experimental.sparse BCOO at a size that completes
    try:
        from jax.experimental import sparse as jsparse

        from spgpu_tpu.utils.fixtures import random_fem_like

        small = random_fem_like(20000, 27.0, span=768, far_frac=0.01,
                                seed=0, dtype=np.float32)
        idx = jnp.asarray(np.stack([small.rows, small.cols], axis=1))
        Ab = jsparse.BCOO((jnp.asarray(small.values), idx),
                          shape=small.shape)
        xv = jnp.asarray(
            np.random.default_rng(1).standard_normal(small.n_cols),
            jnp.float32)

        @jax.jit
        def bcoo_mv(A, v):
            def body(_, c):
                return (A @ c) * jnp.float32(1e-3)

            return jax.lax.fori_loop(0, 5, body, v).sum()

        float(bcoo_mv(Ab, xv))
        t0 = time.perf_counter()
        float(bcoo_mv(Ab, xv))
        t = (time.perf_counter() - t0) / 5
        rows.append({
            "config": "vendor", "op": "jax_sparse_bcoo", "nnz": small.nnz,
            "t_avg_s": round(t, 6),
            "gflops": round(2 * small.nnz / t / 1e9, 3),
        })
    except Exception as e:
        rows.append({"config": "vendor", "op": "jax_sparse_bcoo",
                     "error": str(e)[:80]})
    return rows


def _run_spmm8(coo, out=None):
    import jax
    import jax.numpy as jnp

    from spgpu_tpu.convert import coo_to_hell
    from spgpu_tpu.core import hbm_bandwidth
    from spgpu_tpu.ops import hell_spmv
    from spgpu_tpu.ops.blas1 import dot

    a = coo_to_hell(coo)
    x8 = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, coo.n_cols)),
        jnp.float32,
    )
    z = hell_spmv(a, x8, impl="xla")
    checksum = float(dot(z, z).sum())
    t = _time_chained(lambda a, c: hell_spmv(a, c, impl="xla"), a, x8, 3)
    nnz = coo.nnz
    flops = 8 * (2.0 * nnz - 1.0)
    bytes_moved = a.values.size * 8 + coo.n_rows * 4 * 16
    bw = hbm_bandwidth()
    return BenchResult(
        config="fem_irregular", fmt="hell_xla_spmm8",
        n_rows=coo.n_rows, nnz=nnz,
        storage_bytes=int(a.storage_bytes),
        pad_factor=a.values.size / max(nnz, 1),
        t_avg_s=t, gflops=flops / t * 1e-9,
        eff_bandwidth_gbs=bytes_moved / t / 1e9,
        roofline_frac=(bytes_moved / t) / bw if bw else None,
        checksum=checksum,
    )


if __name__ == "__main__":
    import sys

    run_suite("chip" if "--chip" in sys.argv else "small")
