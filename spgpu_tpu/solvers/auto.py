"""High-level solve entry point: format selection + layout + Krylov.

The reference left this whole pipeline to its PSBLAS callers (load COO,
pick a format, convert, iterate).  ``solve`` packages it: pick the
cheapest layout by slab-traffic estimate (:mod:`spgpu_tpu.convert.select`),
build the TPU compute layout (with the windowed-OELL symmetric relabel
for solver use), and run CG or BiCGSTAB device-resident.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from spgpu_tpu.formats.coo import CooMatrix

__all__ = ["solve"]


def solve(
    coo: CooMatrix,
    b,
    symmetric: bool = True,
    tol: float = 1e-8,
    maxiter: int = 5000,
    jacobi: bool = False,
    fmt: Optional[str] = None,
    x0=None,
):
    """Solve ``A x = b`` for a square host COO.

    ``symmetric=True`` runs CG (SPD systems), else BiCGSTAB.  ``fmt``
    overrides the automatic layout choice ("whell" | "whdia" | "hell").
    Returns a :class:`~spgpu_tpu.solvers.cg.CgResult` whose ``x`` is in
    the ORIGINAL row numbering (relabelling is internal).
    """
    import jax.numpy as jnp

    from spgpu_tpu.convert import (
        coo_to_hell,
        coo_to_whdia,
        coo_to_whell,
        local_degree_perm,
        suggest_format,
    )
    from spgpu_tpu.convert.whell import symmetric_relabel
    from spgpu_tpu.ops import hell_spmv, whdia_spmv, whell_spmv
    from spgpu_tpu.solvers.cg import bicgstab, cg, jacobi_preconditioner

    if coo.n_rows != coo.n_cols:
        raise ValueError("solve requires a square system")
    # Coalesce duplicates ONCE, up front: WHELL keeps duplicates additive
    # while WHDIA plain-stores (last-write-wins, like coo2dia) — without
    # this, a duplicated COO would solve a different matrix depending on
    # which layout the auto-selector picks.
    coo = coo.sum_duplicates()
    if fmt is None:
        fmt = suggest_format(coo)
        if fmt in ("dia", "ell"):  # compute layouts for the chosen class
            fmt = {"dia": "whdia", "ell": "whell"}[fmt]

    perm = None
    work = coo
    if fmt == "whell":
        perm = local_degree_perm(coo)
        work = symmetric_relabel(coo, perm)
        a = coo_to_whell(work)
        mv = lambda v: whell_spmv(a, v)
    elif fmt == "whdia":
        a = coo_to_whdia(work)
        mv = lambda v: whdia_spmv(a, v)
    elif fmt == "hell":
        a = coo_to_hell(work)
        mv = lambda v: hell_spmv(a, v)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")

    b = np.asarray(b)
    b_work = b[perm] if perm is not None else b
    m_inv = jacobi_preconditioner(work) if jacobi else None
    x0_work = None
    if x0 is not None:
        x0_work = jnp.asarray(np.asarray(x0)[perm] if perm is not None else x0)

    solver = cg if symmetric else bicgstab
    res = solver(mv, jnp.asarray(b_work), x0=x0_work, tol=tol,
                 maxiter=maxiter, m_inv=m_inv)
    if perm is not None:
        # x_work solves the relabelled system; x_orig[perm[i]] = x_work[i]
        x = np.empty_like(np.asarray(res.x))
        x[perm] = np.asarray(res.x)
        res = res._replace(x=jnp.asarray(x))
    return res
