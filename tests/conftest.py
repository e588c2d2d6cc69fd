"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (mirrors the reference's
distributed-without-a-cluster test strategy, SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS; force cpu explicitly.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the runtime/mesh integration tests compile
# multi-minute CPU programs; cache only the big ones (>=10 s) so repeat
# runs (CI retries, local iteration) skip them.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
# CPU XLA convs default to a reduced-precision oneDNN path; parity tests
# need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# Fast-tier contract: ``pytest -m "not slow"`` must stay under ~3 minutes on
# ONE cpu core (VERDICT r4 item 8).  Tests below are integration-grade or
# compile-heavy (measured >= ~8 s single-core, mostly XLA CPU compiles of
# large or unique-shape programs); they carry the ``slow`` marker centrally
# so the tier stays fast without scattering marks.  The slow tier runs them
# all (CI build.yml full job / nightly).
_SLOW_PATTERNS = (
    "test_pred_async.py::",
    "test_apis.py::test_init_segmentor_from_pth",
    "test_heads_zoo.py::test_cascade_pointrend_inference",
    "test_heads_zoo.py::test_knet_head_forward",
    "test_heads_zoo.py::test_neck_forward[JPU]",
    "test_seg_device.py::",
    "test_heads_zoo.py::test_timm_adapter",
    "test_heads_zoo.py::test_neck_forward[MLANeck]",
    "test_zoo_import.py::test_augreg_vit_converter",
    "test_zoo_import.py::test_official_twins_svt_lsa_branch",
    "test_fmm_pallas.py::test_pallas_sweep_matches_xla[2-",
    "test_fmm_pallas.py::test_pallas_sweep_matches_xla[1-shape1",
    "test_fmm_pallas.py::test_pallas_sweep_matches_xla[5-shape1",
    "test_models.py::test_inference_returns_raw_logits",
    "test_models.py::test_converted_tree_matches_init_structure",
    "test_transforms_extra.py::test_aug_inference_matches_single",
    "test_export_roundtrip.py::test_pth_export_import_roundtrip",
    "test_fmm_oracle.py::test_fmm_oracle_golden_map",
    "test_fmm_oracle.py::test_fmm_oracle_decision_parity",
    "test_image_dataset.py::test_tools_confusion_matrix",
    "test_fmm.py::test_order2_point_source_accuracy",
    "test_fmm.py::test_order2_batched_matches_single",
    "test_fmm.py::test_batched_solve",
    "test_fmm.py::test_maze_converges",
    "test_fmm.py::test_empty_grid_point_source",
    "test_fmm.py::test_set_goal_auto_improve",
    "test_zoo_import.py::test_official_stdc_converter",
    "test_zoo_import.py::test_timm_vit_converter",
    "test_zoo_import.py::test_official_twins_converter",
    "test_zoo_import.py::test_official_swin_roundtrip_forward",
    "test_zoo_import.py::test_swin_block_matches_numpy_oracle",
    "test_zoo_import.py::test_official_beit_converter",
    "test_backbones_zoo.py::test_beit_mae",
    "test_mask_rcnn.py::test_roi_align_batched_matches_single",
    "test_mask_rcnn.py::test_roi_align_multilevel_fpn_elongated",
    "test_checkpoint_manifests.py::",
)

# Zoo component sweeps: a representative fast subset stays in the tier;
# the long tail (each 2-9 s of unique-shape compiles) moves to slow.
_FAST_ZOO_HEADS = {"PSPHead", "FCNHead", "ASPPHead", "UPerHead", "OCRHead",
                   "SegFormerHead"}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        nodeid = item.nodeid.split("/")[-1]
        if any(p in nodeid for p in _SLOW_PATTERNS):
            item.add_marker(slow)
            continue
        if "test_heads_zoo.py::test_zoo_head_forward[" in nodeid:
            pid = nodeid.split("[", 1)[1].rstrip("]")
            if pid not in _FAST_ZOO_HEADS:
                item.add_marker(slow)
