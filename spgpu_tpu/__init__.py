"""spgpu_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch re-design of the capabilities of spGPU
(davidebarbieri/spgpu, reference at ``/root/reference``): ELLpack plus the
signature HELL (Hacked ELLpack) and HDIA (Hacked DIA) sparse formats, SpMV
and multi-RHS SpMM kernels, a full BLAS-1 vector suite, host-side COO
conversions and Matrix Market I/O — rebuilt for TPU:

* kernels in Pallas over slot-major (slots × 128-lane-rows) HBM slabs,
  with an XLA fallback path covering every dtype (fp32/fp64/bf16/complex);
* reductions stay device-resident (the reference round-trips every dot to
  the host, ``sdot.cu:154-159``);
* a distributed layer the reference never had (SURVEY §2.6): row-partition
  over a ``jax.sharding.Mesh``, halo exchange of x over ICI collectives,
  and a distributed CG solver.
"""

from spgpu_tpu import convert, formats, io, ops, parallel, solvers, utils
from spgpu_tpu.core import Context, LANES, Status, TypeCode, create, destroy, size_of
from spgpu_tpu.formats import (
    BcooMatrix,
    BhdiaMatrix,
    CooMatrix,
    DiaMatrix,
    EllMatrix,
    HdiaMatrix,
    HellMatrix,
    WhdiaMatrix,
    WhellMatrix,
)

__version__ = "0.1.0"
