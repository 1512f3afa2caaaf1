"""Bench harness smoke test (small CPU sizes): the measurement machinery
itself must stay runnable in CI — the reference's perf harnesses were
only compiled, never exercised, and rotted (`cusparsePerf` disabled in
the build, `CMakeLists.txt:182-183`)."""

import json


def test_run_suite_small():
    from spgpu_tpu.bench import run_suite

    lines = []
    results = run_suite("small", out=lines.append)
    assert len(results) >= 8
    kinds = set()
    for line in lines:
        d = json.loads(line)
        kinds.add(d.get("config"))
        if "gflops" in d:
            assert d["gflops"] > 0
        if "eff_bandwidth_gbs" in d:
            assert d["eff_bandwidth_gbs"] > 0
    # SpMV rows + BLAS-1 rows + conversion/vendor anchors all present
    assert {"fem_irregular", "banded", "blas1", "conversion",
            "vendor"} <= kinds


def test_traffic_models_match_storage():
    """The bytes-per-product models behind every roofline claim must
    track the measured slab sizes (within the x/z vector terms)."""
    import numpy as np

    from spgpu_tpu.convert import coo_to_whdia, coo_to_whell
    from spgpu_tpu.utils.fixtures import random_banded, random_fem_like

    fem = random_fem_like(20000, 27.0, span=768, far_frac=0.01, seed=0,
                          dtype=np.float32)
    a = coo_to_whell(fem, packed=True)
    model = a.values.size * 6  # 4B value + 1B residue + 1B page slot
    slabs = (int(a.values.size) * 4 + int(a.residue.size)
             + int(a.page_tab.size))
    assert abs(model - slabs) / slabs < 0.02

    band = random_banded(20000, bands=11, wander=7, seed=2,
                         dtype=np.float32).sum_duplicates()
    d = coo_to_whdia(band)
    if d.slot_r0 is not None:
        model = d.values.size * 6  # 4B value + 2B lane-replicated r0
        slabs = int(d.values.size) * 4 + int(d.slot_r0.size) * 2
    else:
        # pattern mode: values-only traffic + 4B/tile packed scalars
        model = d.values.size * 4
        slabs = int(d.values.size) * 4 + int(d.tile_r0.size) * 4
    assert abs(model - slabs) / slabs < 0.02


def test_roofline_report_shape():
    from spgpu_tpu.utils.profiling import roofline_report

    rep = roofline_report("x", 1e-3, 1_000_000, 2_000_000)
    assert rep["gflops"] > 0
    assert rep["achieved_gbs"] > 0
