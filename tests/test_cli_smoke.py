"""End-to-end CLI smoke test: synthetic data -> run_inversion -> output
tree + metric log + embedding-cache reuse.

Covers the orchestration layer the unit tests skip: cli/run_inversion.py
argument plumbing, PTIDataset directory walking, InversionPipeline.run,
artifact layout (spi/run_inversion.py:60-79) and the embedding cache
(base_coach.py:62-99 semantics).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _make_smoke_data(root: str, n: int):
    spec = importlib.util.spec_from_file_location(
        "make_smoke_data", os.path.join(_TOOLS, "make_smoke_data.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for i in range(n):
        mod.make_identity(root, f"synth{i}", seed=i)


@pytest.fixture(scope="module")
def smoke_run(tmp_path_factory):
    """One full CLI run on 1 synthetic identity with the tiny generator."""
    from spi_tpu.cli import run_inversion

    data_root = str(tmp_path_factory.mktemp("smoke_data"))
    out_root = str(tmp_path_factory.mktemp("smoke_out"))
    _make_smoke_data(data_root, 1)

    argv = [
        "--data_root", data_root,
        "--data_mode", "png",
        "--output_root", out_root,
        "--random_init", "--tiny", "--fp32",
        "--first_inv_type", "mir",
        "--first_inv_steps", "2",
        "--G_1_type", "RotBbox",
        "--G_1_step", "2",
        "--pt_rot_lambda", "0.1",
        "--pt_depth_lambda", "1",
        # random-weight LPIPS distances can land under the 0.05 default
        # threshold on step 1; disable early-stop so steps_run is exact
        "--LPIPS_value_threshold", "-1",
        "--log_snapshot", "2",
    ]
    results = run_inversion.main(argv)
    return data_root, out_root, argv, results


def test_cli_results(smoke_run):
    _, _, _, results = smoke_run
    assert len(results) == 1
    r = results[0]
    assert r["name"] == "synth0"
    assert r["steps_run"] == 2
    assert np.asarray(r["w"]).ndim == 3
    m = r["metrics"]
    for key in ("l2", "lpips", "id", "l2_m", "lpips_m", "id_m"):
        assert key in m and np.isfinite(float(m[key])), (key, m)


def test_cli_output_tree(smoke_run):
    _, out_root, _, _ = smoke_run
    coach = "RotBboxCoach_mir_2_rot0.1_dep1.0"
    found = {d for d in os.listdir(out_root)}
    assert {"checkpoints", "embedding", "experiments", "image", "image_m"} <= found
    coach_dirs = os.listdir(os.path.join(out_root, "checkpoints"))
    assert len(coach_dirs) == 1, coach_dirs
    coach = coach_dirs[0]
    assert os.path.exists(os.path.join(out_root, "checkpoints", coach, "synth0.npz"))
    assert os.path.exists(os.path.join(out_root, "embedding", coach, "synth0.npz"))
    assert os.path.exists(os.path.join(out_root, "image", coach, "synth0.jpg"))
    assert os.path.exists(os.path.join(out_root, "image_m", coach, "synth0.jpg"))
    log = os.path.join(out_root, "experiments", "metric_log.txt")
    with open(log) as f:
        text = f.read()
    # reference format logs per-image rows by index, not name
    # (base_coach.py:156-198): header + one mode block with an AVG line
    assert "Coach name:" in text
    assert "Mode: G1_inv" in text and "Mode: G1_inv AVG" in text
    # --log_snapshot 2 with 2 tuning steps -> one mid-run snapshot at step 0
    assert os.path.exists(
        os.path.join(out_root, "image", coach, "synth0_step0.jpg")
    )


def test_cli_embedding_cache_reuse(smoke_run):
    """A second run pointed at the first run's embeddings must reuse the
    cached w/noise (load_embedding_coach_name, base_coach.py:66-79): the
    loaded pivot equals the stored one."""
    from spi_tpu.cli import run_inversion

    data_root, out_root, argv, results = smoke_run
    coach = os.listdir(os.path.join(out_root, "embedding"))[0]
    cached = np.load(os.path.join(out_root, "embedding", coach, "synth0.npz"))

    argv2 = list(argv) + [
        "--load_embedding_coach_name", coach,
        "--G_1_step", "0",  # no tuning: final w IS the cached pivot
    ]
    results2 = run_inversion.main(argv2)
    np.testing.assert_array_equal(np.asarray(results2[0]["w"]), cached["w"])
