"""DIA (diagonal) format.

Reference definition: ``/root/reference/src/core/dia.h:26-53`` — values
``dM`` column-major with pitch, ``offsets[diags]`` holding each stored
diagonal's offset ``col - row`` ordered ascending (``dia.c:76-85``), and
an in-kernel column bound check for out-of-range ends of off-diagonals
(``dia_spmv_base_template.cuh:133-135``).

TPU layout: ``values`` has shape ``(diags_padded, rows_padded)`` —
diagonal-major with rows on the lane axis, so element
``(row i, diag j)`` = ``A[i, i + offsets[j]]`` lives at ``values[j, i]``.
SpMV needs **no gather**: diagonal ``j``'s x-operand is the contiguous
shifted slice ``x[i + offsets[j]]`` — ideal for the TPU vector unit.
Padding diagonals carry ``offset = n_cols`` (always out of range, masked
to zero in-kernel).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiaMatrix:
    values: jax.Array  # (diags_p, rows_p)
    offsets: jax.Array  # (diags_p,) int32, ascending; padding = n_cols
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    n_diags: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def rows_padded(self) -> int:
        return self.values.shape[1]

    @property
    def diags_padded(self) -> int:
        return self.values.shape[0]

    @property
    def storage_bytes(self) -> int:
        return int(
            self.values.size * self.values.dtype.itemsize + self.offsets.size * 4
        )

    def to_dense(self) -> np.ndarray:
        vals = np.asarray(self.values)
        offs = np.asarray(self.offsets)
        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        rows = np.arange(self.n_rows)
        for j in range(self.n_diags):
            cols = rows + offs[j]
            sel = (cols >= 0) & (cols < self.n_cols)
            out[rows[sel], cols[sel]] = vals[j, : self.n_rows][sel]
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SdiaMatrix:
    """Static-offset DIA — the TPU compute layout for stencil matrices.

    The reference ships dedicated DIA SpMV kernels whose device loop
    walks shared-memory-staged diagonal offsets
    (``dia_spmv_base_template.cuh:35-49,133-135``).  The TPU-native
    answer bakes the offsets into the *compiled program* instead: they
    are static Python ints, so each diagonal's x operand lowers to one
    sublane-aligned dynamic slice plus one static lane rotation — no
    gather, no offset table, no bound check (out-of-range cells are
    zero in ``values`` by construction, and the padded x margins are
    zero).  Recompilation happens per offset *tuple*, which for the
    stencil matrices this format targets is fixed across a solve.

    ``values`` planes are pre-tiled ``(n_diags, n_tiles*8, 128)`` with
    row ``i`` at ``[j, i // 128, i % 128]`` (row-major lane-fastest,
    tiles of 1024 rows), so the kernel streams them with zero reshaping.
    """

    values: jax.Array  # (n_diags, n_tiles*8, 128)
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    #: double-float low planes (float64 input split hi/lo fp32; ops/dd.py)
    values_lo: "jax.Array | None" = None

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def is_dd(self) -> bool:
        return self.values_lo is not None

    @property
    def n_diags(self) -> int:
        return len(self.offsets)

    @property
    def n_tiles(self) -> int:
        return self.values.shape[1] // 8

    @property
    def storage_bytes(self) -> int:
        n = int(self.values.size * self.values.dtype.itemsize)
        if self.values_lo is not None:
            n += int(self.values_lo.size * self.values_lo.dtype.itemsize)
        return n

    def to_dense(self) -> np.ndarray:
        vals = np.asarray(self.values).reshape(max(self.n_diags, 1), -1)
        if self.values_lo is not None:
            vals = vals.astype(np.float64) + np.asarray(
                self.values_lo).reshape(vals.shape)
        out = np.zeros((self.n_rows, self.n_cols), dtype=vals.dtype)
        rows = np.arange(self.n_rows)
        for j, off in enumerate(self.offsets):
            cols = rows + off
            sel = (cols >= 0) & (cols < self.n_cols)
            out[rows[sel], cols[sel]] = vals[j, : self.n_rows][sel]
        return out
