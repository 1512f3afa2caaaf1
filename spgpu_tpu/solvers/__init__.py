from spgpu_tpu.solvers.auto import solve
from spgpu_tpu.solvers.cg import (CgResult, bicgstab, bicgstab_dd, cg, cg_dd,
                                  jacobi_preconditioner)

__all__ = ["CgResult", "bicgstab", "bicgstab_dd", "cg", "cg_dd",
           "jacobi_preconditioner", "solve"]
