"""Label construction semantics, incl. the reference's silent-failure quirks."""

import numpy as np
import pandas as pd
import pytest

from ptbxl_tpu.utils.label_maps import (
    build_af_binary_labels,
    build_label_matrix,
    find_af_codes,
    load_metadata,
)

CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]


def _scp_frame():
    return pd.DataFrame(
        {
            "scp_code": ["IMI", "NDT", "LVH", "CLBBB", "NORM", "AFIB", "AFLT", "SR"],
            "description": [
                "inferior myocardial infarction",
                "non-diagnostic T abnormalities",
                "left ventricular hypertrophy",
                "complete left bundle branch block",
                "normal ECG",
                "Atrial Fibrillation",
                "atrial flutter",
                "sinus rhythm",
            ],
            "diagnostic_class": ["MI", "STTC", "HYP", "CD", "NORM", "", "", ""],
        }
    )


def test_multi_hot_basic():
    df = pd.DataFrame({"scp_codes": ["{'IMI': 100.0, 'LVH': 50.0}", "{'NORM': 100.0}"]})
    y = build_label_matrix(df, _scp_frame(), CLASSES)
    assert y.shape == (2, 5) and y.dtype == np.float32
    np.testing.assert_array_equal(y[0], [1, 0, 1, 0, 0])
    np.testing.assert_array_equal(y[1], [0, 0, 0, 0, 1])


def test_malformed_scp_codes_silently_zero():
    # reference: label_maps.py:57-62 — unparseable/non-dict rows stay all-zero
    df = pd.DataFrame({"scp_codes": ["{'IMI': broken", "['IMI']", "42", "{'IMI': 100.0}"]})
    y = build_label_matrix(df, _scp_frame(), CLASSES)
    np.testing.assert_array_equal(y[:3], np.zeros((3, 5)))
    np.testing.assert_array_equal(y[3], [1, 0, 0, 0, 0])


def test_unknown_code_ignored():
    df = pd.DataFrame({"scp_codes": ["{'ZZZZ': 100.0}"]})
    y = build_label_matrix(df, _scp_frame(), CLASSES)
    np.testing.assert_array_equal(y, np.zeros((1, 5)))


def test_af_keyword_match_case_insensitive():
    codes = find_af_codes(_scp_frame())
    assert codes == ["AFIB"]  # "Atrial Fibrillation" matched lowercase; flutter not


def test_af_binary_labels():
    df = pd.DataFrame(
        {"scp_codes": ["{'AFIB': 100.0, 'SR': 0.0}", "{'SR': 100.0}", "{'AFLT': 100.0}", "bad{"]}
    )
    y = build_af_binary_labels(df, _scp_frame())
    assert y.shape == (4, 1)
    np.testing.assert_array_equal(y[:, 0], [1, 0, 0, 0])


def test_load_metadata_renames_first_scp_column(ptbxl_dir):
    df, scp = load_metadata(ptbxl_dir)
    assert scp.columns[0] == "scp_code"
    assert "diagnostic_class" in scp.columns
    assert len(df) == 40


def test_missing_csv_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_metadata(str(tmp_path))
