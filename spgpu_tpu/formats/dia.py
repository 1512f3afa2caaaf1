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
