"""SpMV / SpMM — XLA implementations (every format, every dtype).

These are the portable compute paths: pure ``jnp`` programs that XLA fuses
into one gather→multiply→reduce loop per format.  They run on CPU (tests,
fp64 golden checks) and TPU (fp64/complex, where Pallas doesn't apply) and
serve as the reference semantics for the Pallas kernels in
``spgpu_tpu.ops.pallas_kernels``.

Correspondence with the reference kernels (SURVEY §2.4):

* ``ell_spmv``  ↔ ``spgpu{S,D,C,Z}ellspmv``  (``ell_spmv_base*.cuh``)
* ``hell_spmv`` ↔ ``spgpu{S,D,C,Z}hellspmv`` (``hell_spmv_base*.cuh``)
* ``dia_spmv``  ↔ ``spgpu{S,D,C,Z}diaspmv``  (``dia_spmv_base*.cuh``)
* ``hdia_spmv`` ↔ ``spgpu{S,D,C,Z}hdiaspmv`` (``hdia_spmv_base*.cuh``)

Shared semantics: ``z = beta*y + alpha*(A @ x)`` with a ``beta == 0``
specialisation that never reads ``y`` (the reference's ``_krn_b0``
kernels, ``ell_spmv_base_template.cuh:334-340``), and OELL's stored-row →
original-row output permutation (``:274-282``).  The CUDA mechanics the
reference needs — texture-cache variants, 2-way prefetch, grid chunking,
``__shfl`` hack-offset broadcast — have no equivalent here because XLA/
Mosaic handle caching, pipelining and tiling (SURVEY §7).

All functions accept multi-RHS ``x`` with leading batch dims
``(..., n_cols) → (..., n_rows)``; this *fuses* the reference's
"m"-multivector host-side loop into one kernel (SURVEY §2.5 note).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spgpu_tpu.formats import DiaMatrix, EllMatrix, HdiaMatrix, HellMatrix

__all__ = ["ell_spmv_xla", "hell_spmv_xla", "dia_spmv_xla", "hdia_spmv_xla"]


def _is_zero(v) -> bool:
    """True only for a *static* zero (safe to skip reading y)."""
    return isinstance(v, (int, float)) and v == 0


def _unfuse_on_tpu(a: jax.Array) -> jax.Array:
    """Break XLA fusion between a gather-multiply and a following
    scatter/segment reduction on TPU.

    XLA:TPU's fusion emitter CHECK-fails (``fusion_emitter.cc``:
    ``GetGatherType(gather) == GatherType::kSublaneGather``) when an
    arbitrary-index gather is fused into a scatter-add consumer, which is
    exactly the HELL/HDIA ``x[cols] * v → segment_sum`` chain.  An
    ``optimization_barrier`` materialises the product once and keeps both
    halves compilable; value-wise it is the identity.  (Found by driving
    the library on a real v5e chip — see tests/test_spmv.py golden runs
    for the semantics.)
    """
    if jax.default_backend() == "tpu":
        return jax.lax.optimization_barrier(a)
    return a


def _combine(acc, n_rows, alpha, beta, y, perm=None, rows_padded=None):
    """z = beta*y + alpha*acc, with OELL permutation and row unpadding."""
    if perm is not None:
        # stored row i holds original row perm[i]; scatter back.
        # perm is a permutation of range(rows_padded) → pure shuffle.
        out = jnp.zeros(acc.shape, acc.dtype)
        out = out.at[..., perm].set(_unfuse_on_tpu(acc))
        acc = out
    acc = acc[..., :n_rows]
    if _is_zero(beta) or y is None:
        return acc if isinstance(alpha, (int, float)) and alpha == 1 else alpha * acc
    return alpha * acc + beta * y


def ell_spmv_xla(
    a: EllMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """ELL/OELL SpMV: one fused gather-multiply-reduce over the slot axis.

    Padding slots carry (value 0, col 0) so no explicit ``rS`` masking is
    needed — the analogue of the reference's "noRs" kernels operating on
    zero-padded storage (``ell_spmv_base_nors.cuh:17-120``); the rS-driven
    early loop exit is a GPU latency trick, not a semantic.
    """
    xg = x[..., a.col_indices]  # (..., width_p, rows_p)
    acc = (a.values * xg).sum(axis=-2)
    return _combine(acc, a.n_rows, alpha, beta, y, a.row_perm, a.rows_padded)


def hell_spmv_xla(
    a: HellMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """HELL SpMV: gather + multiply on the stacked (slots × hack) slab,
    then one ``segment_sum`` over ``slot_to_hack`` reduces each hack's
    ragged slot range to its 128 rows — the XLA-native replacement for the
    reference's per-warp hack-offset ``__shfl`` broadcast
    (``hell_spmv_base_template.cuh:32-54``)."""
    xg = x[..., a.col_indices]  # (..., S, hack)
    prod = _unfuse_on_tpu(a.values * xg)
    prod = jnp.moveaxis(prod, -2, 0)  # (S, ..., hack)
    zh = jax.ops.segment_sum(prod, a.slot_to_hack, num_segments=a.num_hacks)
    acc = jnp.moveaxis(zh, 0, -2)  # (..., H, hack)
    acc = acc.reshape(acc.shape[:-2] + (a.rows_padded,))
    return _combine(acc, a.n_rows, alpha, beta, y, a.row_perm, a.rows_padded)


def dia_spmv_xla(
    a: DiaMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """DIA SpMV: Σ_j dM[j] · x[i + offsets[j]] with the per-element column
    bound check of ``dia_spmv_base_template.cuh:133-135`` expressed as a
    clamp + mask (affine gather — no indirection array read)."""
    rows_p = a.rows_padded
    i = jnp.arange(rows_p, dtype=jnp.int32)[None, :]
    cols = i + a.offsets[:, None]  # (diags_p, rows_p)
    ok = (cols >= 0) & (cols < a.n_cols)
    xg = x[..., jnp.clip(cols, 0, a.n_cols - 1)]
    acc = (a.values * jnp.where(ok, xg, 0)).sum(axis=-2)
    return _combine(acc, a.n_rows, alpha, beta, y)


def hdia_spmv_xla(
    a: HdiaMatrix,
    x: jax.Array,
    alpha=1.0,
    beta=0.0,
    y: Optional[jax.Array] = None,
) -> jax.Array:
    """HDIA SpMV: per-slot shifted x window + segment_sum over hacks.

    Slot ``s`` (hack ``h``) touches x columns
    ``h·hack_size + lane + offsets[s]`` — contiguous per slot, so the
    gather is affine like DIA's.  Padding slots have ``offset = n_cols``
    which always fails the bound check."""
    lane = jnp.arange(a.hack_size, dtype=jnp.int32)[None, :]
    start = (a.slot_to_hack * a.hack_size + a.offsets)[:, None]
    cols = start + lane  # (S, hack)
    ok = (cols >= 0) & (cols < a.n_cols)
    xg = x[..., jnp.clip(cols, 0, a.n_cols - 1)]
    prod = _unfuse_on_tpu(a.values * jnp.where(ok, xg, 0))
    prod = jnp.moveaxis(prod, -2, 0)
    zh = jax.ops.segment_sum(prod, a.slot_to_hack, num_segments=a.num_hacks)
    acc = jnp.moveaxis(zh, 0, -2)
    acc = acc.reshape(acc.shape[:-2] + (a.rows_padded,))
    return _combine(acc, a.n_rows, alpha, beta, y)
