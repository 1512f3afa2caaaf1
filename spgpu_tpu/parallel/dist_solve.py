"""Distributed Krylov solves over a row-partitioned matrix.

The BASELINE.json validation workload: a multi-host CG whose SpMV does a
halo all-to-all per iteration (overlapped with interior compute, see
:mod:`spgpu_tpu.parallel.dist_spmv`) and whose dot products are global
``psum`` reductions over the mesh axis.  The whole iteration — matvec,
collectives, convergence test — runs inside one ``shard_map`` under one
``jit``: nothing crosses to the host until the caller reads the result
(unlike the reference, where every dot forced a device→host copy,
``sdot.cu:154-159``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spgpu_tpu.solvers.cg import CgResult, bicgstab as _bicgstab, cg as _cg
from spgpu_tpu.parallel.dist_spmv import _leaf_spec, local_matvec, shard_partitioned
from spgpu_tpu.parallel.partition import PartitionedMatrix, pad_vector

__all__ = ["dist_cg", "dist_bicgstab"]


def _dist_solve(
    solver,
    pm: PartitionedMatrix,
    b: jax.Array,
    mesh: Mesh,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
    m_inv: Optional[jax.Array] = None,
    axis: str = "rows",
):
    S, chunk = pm.n_shards, pm.chunk

    def put(v):
        return jax.device_put(
            pad_vector(v, pm.padded_rows).reshape(S, chunk),
            NamedSharding(mesh, P(axis)),
        )

    bp = put(b)
    x0p = put(x0) if x0 is not None else jnp.zeros_like(bp)
    # identity preconditioner when none given: elementwise ones, same math.
    mp = put(m_inv) if m_inv is not None else jnp.ones_like(bp)
    pm_s = shard_partitioned(pm, mesh, axis)

    def shard_body(lpm, b_l, x0_l, m_l):
        mv = lambda v: local_matvec(pm, axis, lpm, v[None])[0]
        res = solver(
            mv, b_l[0], x0=x0_l[0], tol=tol, maxiter=maxiter,
            m_inv=m_l[0], axis_name=axis,
        )
        return res._replace(x=res.x[None])

    in_specs = (_leaf_spec(pm, axis), P(axis), P(axis), P(axis))
    out_specs = CgResult(
        x=P(axis), iterations=P(), residual_norm=P(), converged=P()
    )
    f = jax.jit(
        jax.shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    )
    res = f(pm_s, bp, x0p, mp)
    return res._replace(x=res.x.reshape(-1)[: pm.n_rows])


def dist_cg(pm, b, mesh, **kw):
    """Distributed preconditioned CG (SPD systems)."""
    return _dist_solve(_cg, pm, b, mesh, **kw)


def dist_bicgstab(pm, b, mesh, **kw):
    """Distributed BiCGSTAB (general systems)."""
    return _dist_solve(_bicgstab, pm, b, mesh, **kw)
