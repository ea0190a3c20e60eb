"""Mechanical smoke test for the cross-framework showdown tool.

The real showdown (full-size records, 14 epochs, both frameworks) runs via
``python tools/showdown.py run`` and its results are recorded in
docs/PARITY.md; this test only pins that the tool's phases run end-to-end
on tiny sizes and produce the expected artifacts/report schema.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

pytest.importorskip("jax")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_showdown():
    spec = importlib.util.spec_from_file_location(
        "showdown", os.path.join(HERE, "tools", "showdown.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dataset_generator_deterministic_and_labeled():
    sd = _load_showdown()
    x1, y1 = sd.make_split(8, seed=7, T=256)
    x2, y2 = sd.make_split(8, seed=7, T=256)
    np.testing.assert_array_equal(x1, x2)
    assert x1.shape == (8, 12, 256) and y1.shape == (8, 5)
    # NORM is the absence of the other four (PTB-XL-like semantics)
    assert all((y[4] == 1.0) == (y[:4].sum() == 0) for y in y1)
    # hard variant with label noise differs but stays deterministic
    xh, yh = sd.make_split(8, seed=7, T=256, hard=True, label_flip=0.5)
    xh2, yh2 = sd.make_split(8, seed=7, T=256, hard=True, label_flip=0.5)
    np.testing.assert_array_equal(yh, yh2)
    assert not np.array_equal(x1, xh)


@pytest.mark.slow
def test_showdown_phases_end_to_end(tmp_path, monkeypatch):
    sd = _load_showdown()
    monkeypatch.setattr(sd, "OUT_DIR", str(tmp_path))
    cfg = {"n_train": 24, "n_val": 16, "n_test": 16, "T": 512, "seed": 0,
           "batch_size": 8, "epochs": 1, "lr": 1.5e-3, "weight_decay": 1e-4}

    sd.run_jax(cfg)
    assert os.path.exists(tmp_path / "jax.json")
    jrec = json.load(open(tmp_path / "jax.json"))
    # round-4+ calibration instrumentation: full test AND best-model val
    # probs must land in the artifact (small splits — under the 1000 cap)
    assert len(jrec["test_probs"]) == cfg["n_test"]
    assert len(jrec["val_probs"]) == cfg["n_val"]
    assert len(jrec["val_y"]) == cfg["n_val"]

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    sd.run_torch(cfg)
    trec = json.load(open(tmp_path / "torch.json"))
    assert len(trec["val_probs"]) == cfg["n_val"]

    rc = sd.compare(budget=1.0, cfg=cfg)  # mechanics, not convergence
    assert rc == 0
    report = json.load(open(tmp_path / "report.json"))
    for k in ("torch", "jax", "delta_auroc", "within_budget", "config"):
        assert k in report

    # calib analysis over these artifacts must produce the val-fitted
    # deployable estimate alongside the test-oracle bound
    rows = sd.calibration_analysis(cfg)
    assert rows and all("f1_at_val_threshold" in r for r in rows)
    assert all(0.0 <= r["f1_at_val_threshold"] <= 1.0 for r in rows)


def test_synth_demo_deterministic_and_correlated():
    sd = _load_showdown()
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=(400, 5)) < 0.4).astype(np.float32)
    d1 = sd.synth_demo_split(y, seed=3)
    d2 = sd.synth_demo_split(y, seed=3)
    np.testing.assert_array_equal(d1, d2)
    assert d1.shape == (400, 5)
    # age correlates with HYP (the FiLM fusion has real signal to use)
    hyp = y[:, 2].astype(bool)
    assert d1[hyp, 0].mean() > d1[~hyp, 0].mean() + 0.05
    # sex/pacemaker are binary
    assert set(np.unique(d1[:, 1])) <= {0.0, 1.0}
    assert set(np.unique(d1[:, 4])) <= {0.0, 1.0}


def test_arch_labels_af_single_logit():
    sd = _load_showdown()
    y = np.arange(10, dtype=np.float32).reshape(2, 5)
    ya = sd.arch_labels(y, "af")
    assert ya.shape == (2, 1)
    np.testing.assert_array_equal(ya[:, 0], y[:, 0])
    assert sd.arch_labels(y, "baseline") is y


@pytest.mark.slow
def test_showdown_multimodal_phase_end_to_end(tmp_path, monkeypatch):
    sd = _load_showdown()
    monkeypatch.setattr(sd, "OUT_DIR", str(tmp_path))
    cfg = {"n_train": 24, "n_val": 16, "n_test": 16, "T": 512, "seed": 0,
           "batch_size": 8, "epochs": 1, "lr": 1.5e-3, "weight_decay": 1e-4,
           "arch": "multimodal"}
    sd.run_jax(cfg)
    assert os.path.exists(tmp_path / "jax_mm.json")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    sd.run_torch(cfg)
    assert sd.compare(budget=1.0, cfg=cfg) == 0


def test_compare_deficit_gating(tmp_path, monkeypatch):
    """The budget is a no-regression bound: jax ABOVE torch passes at any
    gap; jax BELOW torch is gated at the budget (single-seed and means)."""
    sd = _load_showdown()
    monkeypatch.setattr(sd, "OUT_DIR", str(tmp_path))
    cfg = {"n_train": 1, "n_val": 1, "n_test": 1, "T": 8, "seed": 0,
           "batch_size": 1, "epochs": 1, "lr": 1e-3, "weight_decay": 0.0}

    def write(name, auroc, train_seed=None):
        # real artifacts store the effective train seed in config
        # (tools/showdown.py run_jax/run_torch); fabricate the same shape
        blob = {"framework": name.split("_")[0],
                "config": dict(cfg, train_seed=train_seed),
                "curves": [], "best_epoch": 0, "test_auroc_macro": auroc,
                "test_auprc_macro": auroc, "test_f1_macro": auroc,
                "wall_s": 1.0}
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump(blob, f)

    # jax far ahead -> deficit 0 -> pass
    write("torch", 0.80)
    write("jax", 0.90)
    assert sd.compare(budget=0.005, cfg=cfg) == 0
    rep = json.load(open(tmp_path / "report.json"))
    assert rep["deficit_vs_torch"] == 0.0 and rep["delta_auroc"] > 0.005

    # jax behind beyond budget -> fail
    write("jax", 0.79)
    assert sd.compare(budget=0.005, cfg=cfg) == 1

    # means mode: extra seeds pull the jax mean above torch -> pass
    write("torch_ts43", 0.80, train_seed=43)
    write("jax_ts43", 0.84, train_seed=43)
    assert sd.compare(budget=0.005, cfg=cfg) == 0
    rep = json.load(open(tmp_path / "report.json"))
    assert rep["deficit_vs_torch_means"] == 0.0


def test_collect_seed_runs_dedups_effective_seed(tmp_path, monkeypatch):
    """Round-4 advisor finding: a base artifact (effective train seed =
    --seed) and an explicit _tsN artifact with the SAME numeric seed must
    collapse to one seed in the paired means, the explicitly tagged one."""
    sd = _load_showdown()
    monkeypatch.setattr(sd, "OUT_DIR", str(tmp_path))
    cfg = {"n_train": 1, "n_val": 1, "n_test": 1, "T": 8, "seed": 42,
           "batch_size": 1, "epochs": 1, "lr": 1e-3, "weight_decay": 0.0}

    def write(name, auroc, train_seed):
        blob = {"framework": "jax", "config": dict(cfg, train_seed=train_seed),
                "curves": [], "best_epoch": 0, "test_auroc_macro": auroc,
                "test_auprc_macro": auroc, "test_f1_macro": auroc,
                "wall_s": 1.0}
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump(blob, f)

    write("jax", 0.80, train_seed=None)       # effective seed 42
    write("jax_ts42", 0.90, train_seed=42)    # SAME effective seed, tagged
    write("jax_ts43", 0.85, train_seed=43)
    runs = sd._collect_seed_runs("jax", "")
    assert set(runs) == {"_ts42", "_ts43"}    # 2 seeds, not 3
    # the explicitly tagged artifact wins the collision
    assert runs["_ts42"]["file"] == "jax_ts42.json"
