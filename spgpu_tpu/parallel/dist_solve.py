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

__all__ = ["dist_cg", "dist_bicgstab", "DistSolveHandle"]


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
    from spgpu_tpu.parallel.partition_packed import (
        ComplexPackedPartition, PackedPartition)

    if isinstance(pm, ComplexPackedPartition):
        return _dist_solve_cplx(solver, pm, b, mesh, x0, tol, maxiter,
                                m_inv, axis)
    if isinstance(pm, PackedPartition):
        return _dist_solve_packed(solver, pm, b, mesh, x0, tol, maxiter,
                                  m_inv, axis)
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


def _dist_solve_packed(
    solver,
    pm,
    b,
    mesh: Mesh,
    x0,
    tol: float,
    maxiter: int,
    m_inv,
    axis: str,
):
    """Distributed Krylov solve on a
    :class:`~spgpu_tpu.parallel.partition_packed.PackedPartition` — the
    production path: the whole iteration (packed-WHELL Pallas matvec,
    halo all-to-all, reductions) lives in one ``shard_map``; state
    vectors are stacked per-shard lane-space blocks.  float64 systems
    run :func:`~spgpu_tpu.solvers.cg.cg_dd` with error-free cross-shard
    reductions."""
    import numpy as np

    from spgpu_tpu.parallel.dist_spmv import local_matvec
    from spgpu_tpu.solvers.cg import bicgstab_dd, cg_dd

    def put(arr):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P(axis)))

    bp = put(pm.embed(np.asarray(b)))
    x0p = put(pm.embed(np.asarray(x0))) if x0 is not None else (
        jnp.zeros_like(bp))
    # m_inv (Jacobi diagonal) embeds as plain fp32 in lane space; phantom
    # coordinates hold zero residuals so their preconditioner value is
    # irrelevant
    # identity preconditioner when none given (elementwise ones)
    lor = np.asarray(pm.lane_of_row)
    m_st = np.ones((pm.n_shards, pm.n_lane), np.float32)
    if m_inv is not None:
        mh = np.asarray(m_inv, np.float64).astype(np.float32)
        for s in range(pm.n_shards):
            lo_ = s * pm.chunk
            nloc = max(0, min((s + 1) * pm.chunk, pm.n_rows) - lo_)
            m_st[s, lor[s, :nloc]] = mh[lo_:lo_ + nloc]
    mp = put(m_st if pm.is_dd else m_st.astype(bp.dtype))
    pm_s = shard_partitioned(pm, mesh, axis)
    use_dd = pm.is_dd

    dd_solver = cg_dd if solver is _cg else bicgstab_dd

    def shard_body(lpm, b_l, x0_l, m_l):
        mv = lambda v: local_matvec(pm, axis, lpm, v[None])[0]
        if use_dd:
            res = dd_solver(mv, b_l[0], x0=x0_l[0], tol=tol,
                            maxiter=maxiter, m_inv=m_l[0], axis_name=axis)
        else:
            res = solver(mv, b_l[0], x0=x0_l[0], tol=tol, maxiter=maxiter,
                         m_inv=m_l[0], axis_name=axis)
        return res._replace(x=res.x[None])

    in_specs = (_leaf_spec(pm, axis), P(axis), P(axis), P(axis))
    out_specs = CgResult(
        x=P(axis), iterations=P(), residual_norm=P(), converged=P())
    f = jax.jit(
        jax.shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    )
    res = f(pm_s, bp, x0p, mp)
    x = pm.extract(np.asarray(res.x))
    return res._replace(x=x)


def _dist_solve_cplx(solver, pm, b, mesh, x0, tol, maxiter, m_inv, axis):
    """Distributed COMPLEX Krylov solve on a
    :class:`~spgpu_tpu.parallel.partition_packed.ComplexPackedPartition`:
    4 plane products per shard matvec (overlapped with the halo
    all-to-all), hermitian-CG / BiCGSTAB on plane stacks with mesh-wide
    reductions (C: ``psum``; Z: error-free dd all-reduce).  The
    reference ships C/Z unconditionally (``hdia_zspmv.cu``,
    ``zdot.cu``) — this is the mesh-path analogue."""
    import numpy as np

    from spgpu_tpu.parallel.dist_spmv import local_matvec
    from spgpu_tpu.solvers.cg import (
        bicgstab_planes, bicgstab_planes_dd, cg_herm_planes,
        cg_herm_planes_dd)

    if m_inv is not None:
        raise NotImplementedError(
            "preconditioning is not supported on the complex plane "
            "solvers yet")
    herm = solver is _cg
    if pm.is_dd:
        fn = cg_herm_planes_dd if herm else bicgstab_planes_dd
    else:
        fn = cg_herm_planes if herm else bicgstab_planes

    def put(arr):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P(axis)))

    bp = put(pm.embed(np.asarray(b)))
    x0p = put(pm.embed(np.asarray(x0))) if x0 is not None else (
        jnp.zeros_like(bp))
    pm_s = shard_partitioned(pm, mesh, axis)

    def shard_body(lpm, b_l, x0_l):
        mv = lambda v: local_matvec(pm, axis, lpm, v[None])[0]
        res = fn(mv, b_l[0], x0=x0_l[0], tol=tol, maxiter=maxiter,
                 axis_name=axis)
        return res._replace(x=res.x[None])

    in_specs = (_leaf_spec(pm, axis), P(axis), P(axis))
    out_specs = CgResult(
        x=P(axis), iterations=P(), residual_norm=P(), converged=P())
    f = jax.jit(
        jax.shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    )
    res = f(pm_s, bp, x0p)
    return res._replace(x=pm.extract(np.asarray(res.x)))


def dist_cg(pm, b, mesh, **kw):
    """Distributed preconditioned CG (SPD / hermitian-PD systems)."""
    return _dist_solve(_cg, pm, b, mesh, **kw)


def dist_bicgstab(pm, b, mesh, **kw):
    """Distributed BiCGSTAB (general systems)."""
    return _dist_solve(_bicgstab, pm, b, mesh, **kw)


class DistSolveHandle:
    """Compile-once distributed solver handle for a pod run loop.

    ``dist_cg``/``dist_bicgstab`` re-``device_put`` the partitioned
    pytree and build a fresh ``jax.jit(shard_map(...))`` on EVERY call
    (VERDICT r4 weak #7) — fine for a one-shot validation, wrong for a
    production loop solving many right-hand sides.  This handle matches
    the reference's handle-reuse contract
    (``/root/reference/src/core/core.h:60-82`` — one handle, many
    calls): the pytree is placed on the mesh ONCE, and each
    ``(symmetric, tol, maxiter)`` program is traced and compiled ONCE —
    subsequent solves with a new ``b`` reuse the executable
    (``trace_counts`` exposes the per-program trace count so tests can
    assert it stays 1).

    Covers :class:`~spgpu_tpu.parallel.partition_packed.PackedPartition`
    (fp32 and dd) and ``ComplexPackedPartition`` (C/Z plane pairs).

    >>> h = DistSolveHandle(pm, mesh)
    >>> r1 = h.solve(b1)            # traces + compiles
    >>> r2 = h.solve(b2)            # reuses the executable
    """

    def __init__(self, pm, mesh: Mesh, axis: str = "rows"):
        from spgpu_tpu.parallel.partition_packed import (
            ComplexPackedPartition, PackedPartition)

        if not isinstance(pm, (PackedPartition, ComplexPackedPartition)):
            raise TypeError(
                "DistSolveHandle covers the packed production partitions")
        self.pm, self.mesh, self.axis = pm, mesh, axis
        self.is_cplx = isinstance(pm, ComplexPackedPartition)
        self.sharding = NamedSharding(mesh, P(axis))
        self.pm_s = shard_partitioned(pm, mesh, axis)
        self._progs = {}
        self.trace_counts = {}

    def _put(self, arr):
        return jax.device_put(jnp.asarray(arr), self.sharding)

    def _program(self, symmetric: bool, tol: float, maxiter: int):
        key = (bool(symmetric), float(tol), int(maxiter))
        if key in self._progs:
            return key, self._progs[key]
        pm, axis = self.pm, self.axis
        from spgpu_tpu.solvers.cg import (
            bicgstab_dd, bicgstab_planes, bicgstab_planes_dd, cg_dd,
            cg_herm_planes, cg_herm_planes_dd)

        if self.is_cplx:
            if pm.is_dd:
                fn = cg_herm_planes_dd if symmetric else bicgstab_planes_dd
            else:
                fn = cg_herm_planes if symmetric else bicgstab_planes
        elif pm.is_dd:
            fn = cg_dd if symmetric else bicgstab_dd
        else:
            fn = _cg if symmetric else _bicgstab
        self.trace_counts[key] = 0

        def shard_body(lpm, b_l, x0_l, m_l):
            self.trace_counts[key] += 1
            mv = lambda v: local_matvec(pm, axis, lpm, v[None])[0]
            kw = dict(x0=x0_l[0], tol=tol, maxiter=maxiter, axis_name=axis)
            if not self.is_cplx:
                kw["m_inv"] = m_l[0]
            res = fn(mv, b_l[0], **kw)
            return res._replace(x=res.x[None])

        in_specs = (_leaf_spec(pm, axis), P(axis), P(axis), P(axis))
        out_specs = CgResult(
            x=P(axis), iterations=P(), residual_norm=P(), converged=P())
        f = jax.jit(jax.shard_map(shard_body, mesh=self.mesh,
                                  in_specs=in_specs, out_specs=out_specs,
                                  check_vma=False))
        self._progs[key] = f
        return key, f

    def solve(self, b, symmetric: bool = True, tol: float = 1e-10,
              maxiter: int = 1000, x0=None, m_inv=None):
        """Solve ``A x = b``; ``b``/``x0``/``m_inv`` are host
        original-numbering vectors, the result ``x`` likewise."""
        import numpy as np

        pm = self.pm
        if self.is_cplx and m_inv is not None:
            raise NotImplementedError(
                "preconditioning is not supported on the complex plane "
                "solvers yet")
        bp = self._put(pm.embed(np.asarray(b)))
        x0p = self._put(pm.embed(np.asarray(x0))) if x0 is not None \
            else jnp.zeros_like(bp)
        if self.is_cplx:
            mp = jnp.zeros_like(bp)  # placeholder operand (unused)
        else:
            lor = np.asarray(pm.lane_of_row)
            m_st = np.ones((pm.n_shards, pm.n_lane), np.float32)
            if m_inv is not None:
                mh = np.asarray(m_inv, np.float64).astype(np.float32)
                for s in range(pm.n_shards):
                    lo_ = s * pm.chunk
                    nloc = max(0, min((s + 1) * pm.chunk, pm.n_rows) - lo_)
                    m_st[s, lor[s, :nloc]] = mh[lo_:lo_ + nloc]
            mp = self._put(m_st if pm.is_dd else m_st.astype(bp.dtype))
        _key, f = self._program(symmetric, tol, maxiter)
        res = f(self.pm_s, bp, x0p, mp)
        return res._replace(x=pm.extract(np.asarray(res.x)))
