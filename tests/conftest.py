"""Test configuration.

Runs the whole suite on CPU with 8 virtual devices so the multi-chip
sharding logic is testable without TPUs (SURVEY §4 distributed-testing
note), and enables x64 so fp64 — the reference's primary precision — is
exact.  Must run before the first ``import jax`` anywhere in the tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start; the
# env var alone cannot override it — re-update before any backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


# Heavy tests (>~6 s each, measured full-suite durations r4) — the full
# suite runs ~17 min; `pytest -m "not slow"` keeps a ~5-minute core
# loop (VERDICT r3 weak #8).  Parametrized variants share the base id.
_SLOW = {
    "test_bench_harness.py::test_run_suite_small",
    "test_hygiene_r4.py::test_solve_fmt_blocks_and_pcell",
    "test_hygiene_r4.py::test_spmv_dispatch_pcell",
    "test_hygiene_r4.py::test_spmv_dispatch_blocked_packed",
    "test_whell.py::test_row_segmentation_smem_budget",
    "test_whell.py::test_row_segmentation_dd",
    "test_whell.py::test_spmm_fused_packed",
    "test_whell.py::test_spmm_fused_bf16_values_fp32_x",
    "test_whell.py::test_spmm_fused_way_split",
    "test_whell.py::test_update_values_packed_plan",
    "test_whell.py::test_packed_column_panels",
    "test_whell.py::test_way_split_rows",
    "test_whell.py::test_packed_alpha_beta_duplicates_empty",
    "test_overlap.py::test_weak_scaling_breakdown_keys",
    "test_overlap.py::test_overlap_dd_spmv_and_cg",
    "test_overlap.py::test_overlap_matches_plain_and_golden",
    "test_overlap.py::test_blocks_tuple_dd_zero_copy",
    "test_parallel.py::test_blocked_packed_whell_single_device",
    "test_parallel.py::test_packed_partition_dist_spmv_and_cg",
    "test_parallel.py::test_blocks_tuple_zero_copy_path",
    "test_parallel.py::test_packed_partition_uneven_and_2shards",
    "test_parallel.py::test_dist_bicgstab_dd_packed",
    "test_parallel.py::test_dist_cg_whell",
    "test_sdia.py::test_tall_rectangular",
    "test_sdia.py::test_wide_rectangular",
    "test_sdia.py::test_solve_dd_sdia",
    "test_sdia.py::test_dd_fp64",
    "test_solvers.py::test_solve_routes_large_whell_to_blocks",
    "test_solvers.py::test_high_level_solve_auto",
    "test_dd.py::test_bicgstab_complex_planes",
    "test_dd.py::test_whdia_dd_spmv_and_solve",
    "test_dd.py::test_hermitian_cg_fast_path",
    "test_dd.py::test_complex_solve_routes_dia_class",
    "test_dd.py::test_bicgstab_dd_nonsymmetric",
    "test_io.py::test_bench_mtx_pipeline",
    "test_io.py::test_bench_mtx_complex",
    "test_spmm_fused.py::test_dia_spmm_fused_true_rejected_for_dd",
    "test_spmm_fused.py::test_sdia_spmm_fused_golden",
    "test_spmm_fused.py::test_whdia_spmm_fused_golden_and_epilogue",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test (full suite only; deselect with "
        "-m 'not slow' for the ~5-minute core loop)")


def pytest_collection_modifyitems(config, items):
    for it in items:
        base = it.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW:
            it.add_marker(pytest.mark.slow)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    A full one-process suite run accumulates hundreds of live XLA:CPU
    executables; past ~200 compilations the CPU backend has segfaulted
    INSIDE a later compile (observed repeatedly at different tests in
    jax 0.x backend_compile_and_load — every affected module passes in
    isolation).  Releasing the jit caches per module keeps the live-
    executable population small; costs a few re-compiles of shared
    helpers."""
    yield
    jax.clear_caches()
