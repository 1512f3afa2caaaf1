"""Complex matrices as two real-plane layouts (DIA-class C/Z coverage).

The reference instantiates every DIA-class SpMV in C and Z precision
(``/root/reference/src/core/kernels/dia_cspmv.cu:28-33``,
``dia_zspmv.cu``, ``hdia_cspmv.cu``, ``hdia_zspmv.cu``); TPU has no
complex ALU, so — exactly like :class:`~spgpu_tpu.formats.whell.
WhellComplex` — a complex matrix is stored as two real-plane layouts of
the SAME structure and SpMV runs four real plane products::

    Re(Ax) = Ar xr − Ai xi        Im(Ax) = Ar xi + Ai xr

Unlike packed WHELL there is no lane space: vectors stay in ORIGINAL
coordinates, so ``embed_complex``/``extract_complex`` are plain plane
splits.  C planes are fp32; Z planes are double-float pairs (the dd
kernels of the underlying layout).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ComplexPlanes:
    """Complex DIA-class matrix: ``A = ar + i*ai`` real-plane layouts
    (both :class:`~spgpu_tpu.formats.whdia.WhdiaMatrix`/``BlockedWhdia``
    or both :class:`~spgpu_tpu.formats.dia.SdiaMatrix`, identical
    structure by construction)."""

    ar: object  # real-part plane layout
    ai: object  # imaginary-part plane layout (same structure)
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def is_dd(self) -> bool:
        return self.ar.is_dd

    @property
    def dtype(self):
        return np.dtype(np.complex128 if self.is_dd else np.complex64)

    @property
    def values(self):
        """Real-plane value slab (padding/occupancy view for tooling)."""
        return self.ar.values

    @property
    def storage_bytes(self) -> int:
        return self.ar.storage_bytes + self.ai.storage_bytes

    def embed_complex(self, x) -> np.ndarray:
        """Complex vector → plane stack: ``(2, n)`` fp32 for C or
        ``(2, 2, n)`` ([re, im] × [hi, lo]) for Z."""
        x = np.asarray(x)
        if self.is_dd:
            from spgpu_tpu.ops.dd import split as _split

            return np.stack([_split(np.real(x)), _split(np.imag(x))])
        return np.stack([np.real(x).astype(np.float32),
                         np.imag(x).astype(np.float32)])

    def extract_complex(self, z) -> np.ndarray:
        z = np.asarray(z)
        if self.is_dd:
            from spgpu_tpu.ops.dd import join as _join

            return _join(z[0]) + 1j * _join(z[1])
        return (z[0] + 1j * z[1]).astype(np.complex64)

    def to_dense(self) -> np.ndarray:
        return self.ar.to_dense() + 1j * self.ai.to_dense()
