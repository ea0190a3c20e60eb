"""Dataset classes against the synthetic PTB-XL fixture."""

import numpy as np
import pytest

from ptbxl_tpu.data import PTBXLAFDataset, PTBXLDataset, PTBXLECGMultimodalDataset
from ptbxl_tpu.data.datasets import zscore_per_lead
from ptbxl_tpu.data.manifest import ValidityManifest

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def test_split_semantics(ptbxl_dir):
    # fixture: 40 records, folds 1..10 round-robin -> 4 per fold
    train = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    val = PTBXLDataset(ptbxl_dir, "val", CLASSES)
    test = PTBXLDataset(ptbxl_dir, "test", CLASSES)
    # record idx 5 (fold 6, train) has a deleted .dat -> dropped
    assert len(train) == 4 * 8 - 1
    assert len(val) == 4
    assert len(test) == 4


def test_getitem_shapes_and_normalization(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    x, y = ds[0]
    assert x.shape == (12, 512) and x.dtype == np.float32
    assert y.shape == (5,) and y.dtype == np.float32
    # per-lead z-score: mean ~0, std ~1
    np.testing.assert_allclose(x.mean(axis=1), 0, atol=1e-4)
    np.testing.assert_allclose(x.std(axis=1), 1, atol=1e-2)

    raw = ds.get_raw(0)
    np.testing.assert_allclose(zscore_per_lead(raw), x, atol=1e-6)


def test_normalize_none(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES, normalize="none")
    x, _ = ds[0]
    assert abs(x.std(axis=1).mean() - 1) > 1e-3  # not normalized


def test_multimodal_drops_missing_age(ptbxl_dir):
    mm = PTBXLECGMultimodalDataset(ptbxl_dir, "train", CLASSES)
    base = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    # record idx 3 (fold 4, train) has NaN age -> one extra drop
    assert len(mm) == len(base) - 1
    x, d, y = mm[0]
    assert x.shape == (12, 512) and d.shape == (5,) and y.shape == (5,)


def test_demo_vector_quirks(ptbxl_dir):
    mm = PTBXLECGMultimodalDataset(ptbxl_dir, "train", CLASSES)
    # sex is numeric in PTB-XL -> always 0.5
    assert np.all(mm.demo[:, 1] == 0.5)
    # pacemaker strings -> float() fails -> 0.0
    assert np.all(mm.demo[:, 4] == 0.0)
    # age>=300 clamps to 90 -> age_norm 0.9 (fixture row 4, fold 5 = train)
    row4 = mm.df[mm.df["ecg_id"] == 5]
    if len(row4):
        i = row4.index[0]
        assert mm.demo[i, 0] == pytest.approx(0.9)


def test_af_dataset(ptbxl_dir):
    ds = PTBXLAFDataset(ptbxl_dir, "train")
    x, y = ds[0]
    assert y.shape == (1,)
    # fixture labels AFIB via description match
    assert set(np.unique(ds.y)) <= {0.0, 1.0}
    assert ds.y.sum() > 0  # some AF records exist


def test_validity_manifest_caches(ptbxl_dir):
    m = ValidityManifest(ptbxl_dir)
    rels = [f"records500/00000/{i:05d}_hr" for i in range(1, 41)]
    mask = m.filter_valid(rels)
    assert sum(mask) == 39  # one deleted .dat
    # second instance reads from the JSON cache
    m2 = ValidityManifest(ptbxl_dir)
    assert m2.filter_valid(rels) == mask


def test_manifest_invalidates_on_file_change(ptbxl_dir, tmp_path):
    """A record modified on disk must be re-checked, not served stale."""
    import shutil

    root = str(tmp_path / "mini")
    shutil.copytree(ptbxl_dir, root)
    rel = "records500/00000/00001_hr"
    m = ValidityManifest(root)
    assert m.filter_valid([rel]) == [True]
    # truncate the .dat -> structurally invalid now
    dat = f"{root}/{rel}.dat"
    with open(dat, "r+b") as f:
        f.truncate(10)
    m2 = ValidityManifest(root)
    assert m2.filter_valid([rel]) == [False]


def test_malformed_label_rows_all_zero(ptbxl_dir):
    ds = PTBXLDataset(ptbxl_dir, "train", CLASSES)
    # fixture rows 7,8 (ecg_id 8,9) have malformed scp_codes
    for eid in (8, 9):
        sel = ds.df[ds.df["ecg_id"] == eid]
        if len(sel):
            np.testing.assert_array_equal(ds.y[sel.index[0]], np.zeros(5))
