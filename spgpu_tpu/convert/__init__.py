"""Format conversion routines (host-side).

See :mod:`spgpu_tpu.convert.host` for the NumPy implementations and the
reference-parity notes (SURVEY §2.3).  When the optional C++ acceleration
(:mod:`spgpu_tpu.native`) is built, the hot inner loops are dispatched
there transparently.
"""

from spgpu_tpu.convert.whell import (
    coo_to_whell,
    degree_sort_perm,
    local_degree_perm,
    symmetric_relabel,
    whell_update_values,
)
from spgpu_tpu.convert.pcell import coo_to_whell_percell
from spgpu_tpu.convert.sdia import coo_to_sdia, dia_to_sdia
from spgpu_tpu.convert.whdia import coo_to_whdia
from spgpu_tpu.convert.hybrid import coo_to_hybrid, hybrid_split_stats
from spgpu_tpu.convert.select import estimate_formats, suggest_format
from spgpu_tpu.convert.host import (
    bcoo_to_bhdia,
    compute_bcoo_size,
    compute_dia_alloc_pitch,
    compute_dia_diagonals_count,
    compute_ell_alloc_pitch,
    compute_hdia_hack_offsets,
    compute_hdia_hack_offsets_from_coo,
    coo_to_hdia_size,
    compute_ell_row_lengths,
    compute_hell_alloc_size,
    coo_to_bcoo,
    coo_to_dia,
    coo_to_ell,
    coo_to_hdia,
    coo_to_hell,
    dia_to_hdia,
    ell_to_hell,
    ell_to_oell,
    get_hdia_hacks_count,
)

__all__ = [
    "coo_to_whell",
    "coo_to_whell_percell",
    "coo_to_sdia",
    "dia_to_sdia",
    "coo_to_whdia",
    "coo_to_hybrid",
    "hybrid_split_stats",
    "degree_sort_perm",
    "local_degree_perm",
    "estimate_formats",
    "suggest_format",
    "whell_update_values",
    "symmetric_relabel",
    "bcoo_to_bhdia",
    "compute_bcoo_size",
    "compute_dia_alloc_pitch",
    "compute_dia_diagonals_count",
    "compute_hdia_hack_offsets",
    "compute_hdia_hack_offsets_from_coo",
    "coo_to_hdia_size",
    "compute_ell_alloc_pitch",
    "compute_ell_row_lengths",
    "compute_hell_alloc_size",
    "coo_to_bcoo",
    "coo_to_dia",
    "coo_to_ell",
    "coo_to_hdia",
    "coo_to_hell",
    "dia_to_hdia",
    "ell_to_hell",
    "ell_to_oell",
    "get_hdia_hacks_count",
]
