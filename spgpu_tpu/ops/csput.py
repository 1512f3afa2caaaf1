"""ELL in-place coordinate update (csput).

Mirrors ``spgpu{S,D,C,Z}ellcsput`` (``/root/reference/src/core/kernels/
ell_csput_base.cuh:44-73``): given triples (row, col, value) whose
coordinates must already exist in the ELL structure, overwrite the stored
value.  The reference binary-searches the column inside the row (requiring
per-row ascending ``rP``); we compare against the whole (small) slot axis,
which drops the sortedness requirement.

Deviations (deliberate, SURVEY §7 "do-not-replicate bugs"):

* the reference documents ``cM[pos] = alpha*val`` but stores ``val``
  unscaled; we honour ``alpha``.
* triples whose coordinate is absent are skipped (the reference's failed
  binary search leaves the row untouched as well).

"In place" is expressed functionally: a new :class:`EllMatrix` sharing
everything but ``values`` is returned (XLA aliases the donated buffer
under jit).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spgpu_tpu.formats import EllMatrix, HellMatrix

__all__ = ["ell_csput", "hell_csput"]


def ell_csput(a: EllMatrix, rows, cols, values, alpha=1.0) -> EllMatrix:
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    values = jnp.asarray(values, a.dtype)

    if a.row_perm is not None:
        # triples address original rows; map to stored rows.
        inv = jnp.zeros((a.rows_padded,), jnp.int32).at[a.row_perm].set(
            jnp.arange(a.rows_padded, dtype=jnp.int32)
        )
        rows = inv[rows]

    rp = a.col_indices[:, rows]  # (W, m)
    cand = rp == cols[None, :]
    if a.row_lengths is not None:
        slot = jnp.arange(a.width_padded, dtype=jnp.int32)[:, None]
        cand = cand & (slot < a.row_lengths[rows][None, :])
    k = jnp.argmax(cand, axis=0)  # first matching slot (0 if none)
    found = cand.any(axis=0)

    old = a.values[k, rows]
    upd = jnp.where(found, alpha * values, old)
    new_vals = a.values.at[k, rows].set(upd)
    return dataclasses.replace(a, values=new_vals)


def hell_csput(a: HellMatrix, rows, cols, values, alpha=1.0) -> HellMatrix:
    """csput for HELL (extension — the reference ships ELL csput only).

    Stored slot of (row, k) is ``hack_offsets[row // hack_size] + k`` with
    lane ``row % hack_size``; the candidate scan is bounded by the global
    ``max_hack_width``.
    """
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    values = jnp.asarray(values, a.dtype)

    if a.row_perm is not None:
        inv = jnp.zeros((a.rows_padded,), jnp.int32).at[a.row_perm].set(
            jnp.arange(a.rows_padded, dtype=jnp.int32)
        )
        rows = inv[rows]

    h = rows // a.hack_size
    lane = rows % a.hack_size
    base = a.hack_offsets[h]  # (m,)
    width = a.hack_offsets[h + 1] - base
    W = max(a.max_hack_width, 1)
    slot = jnp.arange(W, dtype=jnp.int32)[:, None]  # (W, 1)
    slot_idx = jnp.clip(base[None, :] + slot, 0, a.total_slots - 1)
    rp = a.col_indices[slot_idx, lane[None, :]]  # (W, m)
    cand = (rp == cols[None, :]) & (slot < width[None, :])
    if a.row_lengths is not None:
        cand = cand & (slot < a.row_lengths[rows][None, :])
    k = jnp.argmax(cand, axis=0)
    found = cand.any(axis=0)

    sidx = base + k
    old = a.values[sidx, lane]
    upd = jnp.where(found, alpha * values, old)
    new_vals = a.values.at[sidx, lane].set(upd)
    return dataclasses.replace(a, values=new_vals)
