"""Bench harness smoke test (small CPU sizes): the measurement machinery
itself must stay runnable in CI — the reference's perf harnesses were
only compiled, never exercised, and rotted (`cusparsePerf` disabled in
the build, `CMakeLists.txt:182-183`)."""

import json


def test_run_suite_small():
    from spgpu_tpu.bench import run_suite

    lines = []
    results = run_suite("small", out=lines.append)
    assert len(results) >= 4
    for line in lines:
        d = json.loads(line)
        assert d["gflops"] > 0
        assert d["nnz"] > 0
        assert d["t_avg_s"] > 0


def test_roofline_report_shape():
    from spgpu_tpu.utils.profiling import roofline_report

    rep = roofline_report("x", 1e-3, 1_000_000, 2_000_000)
    assert rep["gflops"] > 0
    assert rep["achieved_gbs"] > 0
