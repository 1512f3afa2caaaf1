"""Format-selection heuristic tests (the diaPerf fallback analogue)."""

import numpy as np

from spgpu_tpu.convert import estimate_formats, suggest_format
from spgpu_tpu.utils.fixtures import laplacian_2d, random_banded, random_fem_like


def test_banded_prefers_diagonal_formats():
    coo = random_banded(2000, bands=9, wander=0, seed=1, dtype=np.float32)
    assert suggest_format(coo) in ("dia", "whdia")


def test_wandering_band_prefers_whdia_over_dia():
    coo = random_banded(4000, bands=9, wander=37, seed=2, dtype=np.float32)
    est = estimate_formats(coo)
    assert est["whdia"].bytes_per_product < est["dia"].bytes_per_product


def test_irregular_prefers_whell_over_ell():
    coo = random_fem_like(4000, 16.0, span=300, far_frac=0.02, seed=3,
                          dtype=np.float32)
    est = estimate_formats(coo)
    assert est["whell"].bytes_per_product < est["ell"].bytes_per_product


def test_laplacian_diagonal_formats_win():
    coo = laplacian_2d(50, 50, np.float32)
    assert suggest_format(coo) in ("dia", "whdia")
