"""Double-float ("double-double" over fp32) arithmetic for TPU.

TPU v5e has no fp64 ALU (fp64 arrays raise UNIMPLEMENTED); the reference
ships every kernel in S/D/C/Z (``hell_dspmv.cu:28-33``, ``zdot.cu``), so
D/Z coverage here is built from pairs of fp32 words ``(hi, lo)`` with
``|lo| <= ulp(hi)/2`` — the classic Dekker/Knuth error-free transforms
(the SURVEY §7 "hard parts" fallback plan).  Each helper is a plain jnp
function usable both inside Pallas kernels and in XLA BLAS-1 code.

Accuracy: ~2^-48 relative per operation (double-float), which holds the
1e-12 CG tolerance target for the matvec accumulation lengths in play.
Dekker's split-based TwoProd is used because XLA:TPU offers no exact
user-level FMA; all transforms are branch-free vector code.

Host-side ``split``/``join`` convert NumPy float64 arrays to fp32 pairs
stacked on a leading axis of 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "two_sum", "fast_two_sum", "two_prod", "dd_add", "dd_add_dd",
    "dd_mul", "dd_neg", "split", "join", "dd_sum", "dd_dot",
    "dd_axpby", "dd_norm2_sq",
]

_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for fp32 (24-bit mantissa)


_GUARDED = [True]


def _ob(x):
    """Opacity barrier around EFT intermediates.

    XLA's algebraic simplifier treats fp arithmetic as associative in
    some fusion patterns and cancels the error term of TwoSum to the
    symbolically-equivalent 0 (observed on XLA:CPU: a jitted dd CG lost
    its lo words and stalled at fp32 residuals while the op-by-op run
    matched fp64).  ``optimization_barrier`` keeps the rounded
    intermediate opaque so ``(s - a)`` is computed, not cancelled.

    Mosaic (compiled Pallas TPU kernels) does not lower the barrier —
    and does not algebraically simplify fp either — so kernel builders
    disable it at trace time via :func:`unguarded` (validated
    numerically on chip; interpret mode keeps guards since it lowers
    through XLA).
    """
    if _GUARDED[0]:
        return jax.lax.optimization_barrier(x)
    return x


import contextlib


@contextlib.contextmanager
def unguarded():
    """Trace-time context: compile EFTs without optimization barriers
    (Mosaic kernel bodies only — see :func:`_ob`)."""
    old = _GUARDED[0]
    _GUARDED[0] = False
    try:
        yield
    finally:
        _GUARDED[0] = old


def two_sum(a, b):
    """Error-free ``a + b = s + e`` (Knuth; 6 flops, branch-free)."""
    s = _ob(a + b)
    bb = _ob(s - a)
    e = (a - _ob(s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free ``a + b = s + e`` assuming ``|a| >= |b|`` (3 flops)."""
    s = _ob(a + b)
    e = b - _ob(s - a)
    return s, e


def _split1(a):
    c = _ob(_SPLITTER * a)
    hi = _ob(c - (c - a))
    return hi, a - hi


def two_prod(a, b):
    """Error-free ``a * b = p + e`` (Dekker split; no FMA needed)."""
    p = _ob(a * b)
    ah, al = _split1(a)
    bh, bl = _split1(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(hi, lo, b):
    """(hi, lo) + fp32 b -> normalized pair."""
    s, e = two_sum(hi, b)
    return fast_two_sum(s, e + lo)


def dd_add_dd(ahi, alo, bhi, blo):
    """(ahi, alo) + (bhi, blo) -> normalized pair (sloppy add, ~11 flops;
    error 2^-48-class, sufficient for accumulation)."""
    s, e = two_sum(ahi, bhi)
    return fast_two_sum(s, e + (alo + blo))


def dd_mul(ahi, alo, bhi, blo):
    """(ahi, alo) * (bhi, blo) -> normalized pair."""
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return fast_two_sum(p, e)


def dd_neg(hi, lo):
    return -hi, -lo


def dd_div(ahi, alo, bhi, blo):
    """(ahi, alo) / (bhi, blo) -> normalized pair (two Newton terms)."""
    q1 = ahi / bhi
    # remainder a - q1*b in dd
    ph, pe = two_prod(q1, bhi)
    pe = pe + q1 * blo
    rh, rl = dd_add_dd(ahi, alo, -ph, -pe)
    q2 = rh / bhi
    return fast_two_sum(q1, q2)


# ---------------------------------------------------------------------------
# Host conversion
# ---------------------------------------------------------------------------


def split(a: np.ndarray) -> np.ndarray:
    """float64 array -> (2, *shape) fp32 stack (hi, lo)."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo])


def join(pair) -> np.ndarray:
    """(2, *shape) fp32 stack -> float64 array."""
    pair = np.asarray(pair)
    return pair[0].astype(np.float64) + pair[1].astype(np.float64)


# ---------------------------------------------------------------------------
# Device-resident dd BLAS-1 (vectors as (2, n) fp32 stacks).  O(n) work
# next to the O(nnz) matvec; plain jnp so XLA fuses them.
# ---------------------------------------------------------------------------


def dd_sum(hi, lo):
    """Sum of a dd vector -> dd scalar, via a fixed 8-way tree so the
    error-free adds keep their structure (jnp.sum would reassociate in
    one pass but with plain fp32 rounding)."""
    n = hi.shape[-1]
    # pad to a power-of-two-ish width then halve; log2(n) dd adds depth
    m = 1
    while m < n:
        m *= 2
    ph = jnp.zeros(m, hi.dtype).at[:n].set(hi)
    pl = jnp.zeros(m, lo.dtype).at[:n].set(lo)
    while m > 1:
        m //= 2
        ph, pl = dd_add_dd(ph[:m], pl[:m], ph[m:2 * m], pl[m:2 * m])
    return ph[0], pl[0]


def dd_dot(a, b):
    """dd dot product of two (2, n) stacks -> dd scalar."""
    ph, pe = dd_mul(a[0], a[1], b[0], b[1])
    return dd_sum(ph, pe)


def dd_norm2_sq(a):
    return dd_dot(a, a)


def dd_axpby(alpha, a, beta, b):
    """alpha*a + beta*b for (2, n) stacks; alpha/beta dd scalars
    ``(hi, lo)`` or python floats."""
    if not isinstance(alpha, tuple):
        alpha = (jnp.float32(alpha), jnp.float32(0.0))
    if not isinstance(beta, tuple):
        beta = (jnp.float32(beta), jnp.float32(0.0))
    xh, xl = dd_mul(a[0], a[1], alpha[0], alpha[1])
    yh, yl = dd_mul(b[0], b[1], beta[0], beta[1])
    h, l = dd_add_dd(xh, xl, yh, yl)
    return jnp.stack([h, l])
