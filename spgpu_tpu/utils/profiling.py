"""Profiling / roofline reporting helpers.

The reference's observability is a wall-clock ``Clock`` around kernel
loops plus compile-time ``--ptxas-options=-v`` register reports
(SURVEY §5; ``/root/reference/src/utils/timing.hpp:22-70``,
``CMakeLists.txt:168-169``).  Here the equivalents are:

* :func:`time_op` — the honest measurement primitive for the axon TPU
  runtime (chained ``fori_loop`` + host-readback fence; see bench.py);
* :func:`roofline_report` — per-op achieved vs HBM-bandwidth roofline;
* :func:`trace` — thin wrapper over ``jax.profiler.trace`` for backends
  where it works (CPU always; the axon tunnel is best-effort).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

__all__ = ["time_op", "roofline_report", "trace"]


def time_op(op: Callable, a, x, iters: int = 20, repeats: int = 3) -> float:
    """Average seconds per ``op(a, x)`` via one chained device program.

    ``op`` must map ``(a, x) -> y`` with ``y`` broadcast-compatible with
    ``x`` (SpMV on a square matrix, elementwise ops, …).
    """
    import jax
    import jax.numpy as jnp

    scale = jnp.asarray(1e-3, x.dtype)

    @jax.jit
    def chained(a, x0):
        def body(_, c):
            return op(a, c) * scale

        # scalar reduction inside jit: the host fence reads 4 bytes,
        # not the result vector (tunnel readback would dominate)
        return jax.lax.fori_loop(0, iters, body, x0).sum()

    float(chained(a, x))  # compile + fence
    t = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(a, x))
        t = min(t, (time.perf_counter() - t0) / iters)
    return t


def roofline_report(name: str, t_seconds: float, bytes_moved: int,
                    flops: int, device=None) -> dict:
    """Achieved bandwidth/FLOP rate vs the device's HBM roofline."""
    from spgpu_tpu.core import hbm_bandwidth

    bw = hbm_bandwidth(device)
    achieved_bw = bytes_moved / t_seconds
    rep = {
        "name": name,
        "t_s": t_seconds,
        "gflops": flops / t_seconds / 1e9,
        "achieved_gbs": achieved_bw / 1e9,
        "roofline_gbs": (bw / 1e9) if bw else None,
        "roofline_frac": (achieved_bw / bw) if bw else None,
    }
    return rep


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler.trace`` wrapper; no-op on failure (the axon TPU
    tunnel does not always support device tracing)."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield
