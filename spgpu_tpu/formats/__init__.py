"""Sparse matrix storage formats (TPU-native layouts).

Re-designs of the reference's caller-owned device-buffer formats
(SURVEY §2.2; ``/root/reference/src/core/{ell,hell,dia,hdia}.h``) as JAX
pytree dataclasses.  The common layout decision, and the single biggest
departure from the CUDA code: the reference stores values **column-major
with a 32-element pitch** so that consecutive GPU threads (one per row)
read consecutive addresses (``ell.h:26-61``, ``ell.c:33-37``).  The TPU
equivalent of "consecutive threads" is the 128-wide vector lane axis, so we
store every format **slot-major**: shape ``(slots, rows_padded)`` with rows
on the lane (last) axis padded to 128 and slots padded to the dtype's
sublane multiple.  One (8×128) tile then holds 8 nnz-slots of 128 adjacent
rows — the exact analogue of the coalesced column-major ELL walk.
"""

from spgpu_tpu.formats.coo import CooMatrix
from spgpu_tpu.formats.ell import EllMatrix
from spgpu_tpu.formats.hell import HellMatrix
from spgpu_tpu.formats.dia import DiaMatrix, SdiaMatrix
from spgpu_tpu.formats.hdia import HdiaMatrix
from spgpu_tpu.formats.bcoo import BcooMatrix, BhdiaMatrix
from spgpu_tpu.formats.whell import WhellMatrix
from spgpu_tpu.formats.whdia import WhdiaMatrix
from spgpu_tpu.formats.hybrid import HybridMatrix

__all__ = [
    "HybridMatrix",
    "CooMatrix",
    "EllMatrix",
    "HellMatrix",
    "DiaMatrix",
    "SdiaMatrix",
    "HdiaMatrix",
    "BcooMatrix",
    "BhdiaMatrix",
    "WhellMatrix",
    "WhdiaMatrix",
]
