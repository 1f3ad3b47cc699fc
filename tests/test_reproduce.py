"""reproduce-grid: the one-command published-quality-grid reproduction
(VERDICT r2 next #3). Tiny-shape end-to-end run on the synthetic fallback +
table/consistency units."""

import json
import os

import numpy as np
import pytest

from aliasfree_diffusion_models_pytorch_tpu.reproduce import (
    GRID_CONFIGS,
    PUBLISHED,
    format_grid_markdown,
    reproduce_grid,
    validate_inception_weights,
)


def test_grid_tables_consistent():
    """Every published row must have a runnable config and vice versa; the
    13 configurations mirror README.md:178-190 exactly."""
    assert len(GRID_CONFIGS) == 13
    for dataset, rows in PUBLISHED.items():
        assert set(rows) == set(GRID_CONFIGS), dataset
    # Spot-check the headline cells (BASELINE.md): D-1N CIFAR FID 90.21,
    # D-2N MNIST-M FID 82.46, A MNIST FID 9.61.
    assert PUBLISHED["CIFAR10"]["D-1N"][1] == 90.21
    assert PUBLISHED["MNISTM"]["D-2N"][1] == 82.46
    assert PUBLISHED["MNIST"]["A"][1] == 9.61
    # Naming decodes: letter -> variant, digit -> beta, N -> normalized.
    assert GRID_CONFIGS["A"] == (0, None, True)
    assert GRID_CONFIGS["D-2N"] == (3, 2.0, True)
    assert GRID_CONFIGS["B-0"] == (1, 0.0, False)


def test_validate_inception_weights_unknown(tmp_path):
    p = tmp_path / "w.npz"
    p.write_bytes(b"not real weights")
    info = validate_inception_weights(str(p))
    assert info["known"] is None
    assert len(info["sha256"]) == 64


@pytest.mark.slow
def test_reproduce_grid_synthetic_end_to_end(tmp_path):
    """Full pipeline on the synthetic fallback: train -> generate -> metric
    -> JSON + markdown, labeled not-comparable."""
    out = str(tmp_path / "grid.json")
    result = reproduce_grid(
        "MNIST", None,
        configs=["A", "D-2N"],
        epochs=1, batch_size=8, seed=0, gen_total=12, gen_per_batch=8,
        image_size=8, image_channels=1, noise_steps=20,
        root=str(tmp_path), out_path=out,
    )
    assert result["comparable_to_published"] is False
    assert result["feature_space"] == "random-conv-v2"
    assert [r["config"] for r in result["rows"]] == ["A", "D-2N"]
    for r in result["rows"]:
        assert np.isfinite(r["fid"])
        assert "delta_fid" not in r  # deltas only when comparable
    assert os.path.exists(out)
    with open(out) as f:
        assert json.load(f)["dataset"] == "MNIST"
    md = format_grid_markdown(result)
    assert "NOT comparable" in md and "| A |" in md


def test_reproduce_grid_rejects_unknown_config():
    with pytest.raises(ValueError, match="unknown grid config"):
        reproduce_grid("MNIST", None, configs=["Z-9"], epochs=1)


@pytest.mark.slow
def test_reproduce_grid_resume_skips_finished_configs(tmp_path):
    """--resume reloads prior rows and runs only the missing configs: the
    first run's training root is deleted before the resume, so config A can
    only appear in the output via the reloaded artifact."""
    out = str(tmp_path / "grid.json")
    recipe = dict(
        epochs=1, batch_size=8, seed=0, gen_total=12, gen_per_batch=8,
        image_size=8, image_channels=1, noise_steps=20, out_path=out,
    )
    first = reproduce_grid(
        "MNIST", None, configs=["A"], root=str(tmp_path / "r1"), **recipe,
    )
    import shutil

    shutil.rmtree(tmp_path / "r1")  # a re-train of A would have no data to load

    resumed = reproduce_grid(
        "MNIST", None, configs=["A", "D-2N"], root=str(tmp_path / "r2"),
        resume=True, **recipe,
    )
    assert resumed["complete"] is True
    assert [r["config"] for r in resumed["rows"]] == ["A", "D-2N"]
    assert resumed["rows"][0] == first["rows"][0]  # reloaded, not re-run

    # A mismatched recipe must refuse to mix rows.
    with pytest.raises(ValueError, match="different recipe"):
        reproduce_grid(
            "MNIST", None, configs=["A"], root=str(tmp_path / "r3"),
            resume=True, **{**recipe, "noise_steps": 10},
        )


def test_spearman_matches_scipy():
    """benchmarks/grid_analysis.py reimplements Spearman scipy-free; pin it
    to the scipy oracle, including tie handling."""
    scipy_stats = pytest.importorskip("scipy.stats")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from benchmarks.grid_analysis import spearman

    rng = np.random.default_rng(0)
    a = rng.standard_normal(13)
    b = 0.5 * a + rng.standard_normal(13)
    assert spearman(a, b) == pytest.approx(scipy_stats.spearmanr(a, b).statistic)
    # ties (rounded metrics produce them constantly)
    a2 = np.round(a, 0)
    b2 = np.round(b, 0)
    assert spearman(a2, b2) == pytest.approx(
        scipy_stats.spearmanr(a2, b2).statistic)


@pytest.mark.slow
def test_reuse_checkpoints_inherits_training_facts(tmp_path):
    """--reuse-checkpoints skips training but the row keeps the prior
    artifact's final_loss/train_s (they describe the checkpoint in use);
    the persisted gen_*.npz set is written and --reuse-generated reloads
    it bit-identically."""
    out = str(tmp_path / "grid.json")
    recipe = dict(
        epochs=1, batch_size=8, seed=0, gen_total=12, gen_per_batch=8,
        image_size=8, image_channels=1, noise_steps=20, out_path=out,
    )
    first = reproduce_grid(
        "MNIST", None, configs=["A"], root=str(tmp_path), **recipe,
    )
    assert first["rows"][0]["train_s"] is not None
    gen_path = tmp_path / "gen_MNIST_A.npz"
    assert gen_path.exists()
    gen_first = np.load(gen_path)["images"]

    second = reproduce_grid(
        "MNIST", None, configs=["A"], root=str(tmp_path),
        reuse_checkpoints=True, reuse_generated=True, **recipe,
    )
    r = second["rows"][0]
    assert r["final_loss"] == first["rows"][0]["final_loss"]
    assert r["train_s"] == first["rows"][0]["train_s"]
    # metrics recomputed from the identical persisted set -> identical
    assert r["fid"] == first["rows"][0]["fid"]
    np.testing.assert_array_equal(np.load(gen_path)["images"], gen_first)
    # full-precision fields ride along for the ordering analysis
    assert round(r["fid_raw"], 2) == r["fid"]
    assert round(r["kid_x100_raw"], 2) == r["kid_x100"]

    # --reuse-generated alone is artifact-only: a fresh root with NO
    # checkpoints must not retrain — metrics recompute from gen_*.npz.
    fresh_root = tmp_path / "fresh"
    fresh_root.mkdir()
    third = reproduce_grid(
        "MNIST", None, configs=["A"], root=str(fresh_root),
        reuse_generated=True, **recipe,
    )
    r3 = third["rows"][0]
    assert r3["fid"] == first["rows"][0]["fid"]
    assert r3["train_s"] == first["rows"][0]["train_s"]  # inherited meta
    # no training artifacts were created under the fresh root
    assert list(fresh_root.iterdir()) == []
