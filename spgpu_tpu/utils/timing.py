"""Wall-clock timing + the reference's benchmark measurement protocol.

Mirrors ``Clock`` (``/root/reference/src/utils/timing.hpp:22-70``) and the
perf-harness protocol (SURVEY §3.5, ``hellPerf.cpp:209-252``):
warm-up run → checksum ``dot(z, z)`` → timed loop of N iterations →
GFLOPS = (2·nnz − 1) / t_avg.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax

__all__ = ["Clock", "benchmark_op", "BenchResult", "chained_time"]


def chained_time(step, carry0, *step_args, iters_lo: int = 200,
                 iters_hi: int = 2000, reps: int = 3):
    """Seconds/iteration of ``carry = step(carry)`` on-device, with the
    per-call dispatch overhead subtracted by two-point extrapolation.

    The axon TPU runtime charges a large fixed cost per jitted call
    (~30 ms measured — tunnel round trips + sync), so a single timed
    loop of N iterations reports ``t_iter + C/N``: at N=200 that
    overstated every kernel time by ~0.15 ms (~2x on sub-ms kernels)
    until a bandwidth probe exposed it (doc/DESIGN.md §5).  Model
    ``T(N) = C + N * t_iter`` and solve from two N:

        t_iter = (T_hi - T_lo) / (iters_hi - iters_lo)

    The loop chains each step's output into the next (independent
    dispatches only measure queue depth) and fences through a 4-byte
    scalar readback (``block_until_ready`` does not fence here, and a
    vector readback would measure the ~20-100 MB/s tunnel instead).

    Large device operands the step reads (matrices, second vectors)
    must be passed via ``step_args`` — ``step(carry, *step_args)`` —
    not closure-captured: a captured jnp array is baked into the HLO
    as a literal and shipped with the (relayed) compile request.

    Returns ``(t_iter, overhead_per_call)``.
    """
    import jax

    @jax.jit
    def timed(c0, it, *args):
        out = jax.lax.fori_loop(0, it, lambda _, c: step(c, *args), c0)
        # 4-byte scalar fence; pytree carries (e.g. the zero-copy tuple
        # block states) reduce across leaves
        leaves = jax.tree.leaves(out)
        s = leaves[0].sum()
        for l in leaves[1:]:
            s = s + l.sum().astype(s.dtype)
        return s

    T = {}
    for it in (iters_lo, iters_hi):
        float(timed(carry0, it, *step_args))  # compile + execution fence
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(timed(carry0, it, *step_args))
            t = min(t, time.perf_counter() - t0)
        T[it] = t
    t_iter = (T[iters_hi] - T[iters_lo]) / (iters_hi - iters_lo)
    if t_iter <= 0:  # timing noise on tiny configs: fall back to hi run
        t_iter = T[iters_hi] / iters_hi
    return t_iter, max(T[iters_lo] - iters_lo * t_iter, 0.0)


class Clock:
    """Monotonic wall clock; parity with ``timing.hpp``'s ``Clock``."""

    def get_time(self) -> float:
        return time.perf_counter()


@dataclasses.dataclass
class BenchResult:
    seconds_per_iter: float
    iters: int
    gflops: Optional[float]
    checksum: float
    bytes_per_iter: Optional[int] = None

    @property
    def gbytes_per_sec(self) -> Optional[float]:
        if self.bytes_per_iter is None:
            return None
        return self.bytes_per_iter / self.seconds_per_iter / 1e9


def benchmark_op(
    fn: Callable,
    *args,
    iters: int = 1000,
    nnz: Optional[int] = None,
    bytes_per_iter: Optional[int] = None,
    checksum_fn: Optional[Callable] = None,
) -> BenchResult:
    """Run the reference measurement protocol on a jitted ``fn(*args)``.

    The reference times a stream of asynchronous kernel launches and syncs
    once at the end (``hellPerf.cpp:238-245`` + ``cudaDeviceSynchronize``);
    we dispatch ``iters`` calls and ``block_until_ready`` on the last
    result, which is the JAX equivalent.
    """
    out = fn(*args)  # warm-up / compile
    out = jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    checksum = float((leaf * leaf).sum()) if checksum_fn is None else float(
        checksum_fn(out)
    )

    clock = Clock()
    t0 = clock.get_time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    t = (clock.get_time() - t0) / iters

    gflops = None
    if nnz is not None:
        gflops = (2.0 * nnz - 1.0) / t * 1e-9
    return BenchResult(t, iters, gflops, checksum, bytes_per_iter)
