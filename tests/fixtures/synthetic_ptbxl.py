"""Generate a tiny synthetic PTB-XL-shaped dataset for hermetic tests.

Reproduces the structural features the data layer depends on (SURVEY.md §2.1):
ptbxl_database.csv with scp_codes dict-strings / strat_fold / filename_hr /
demographics (numeric sex! string pacemaker!), scp_statements.csv with
diagnostic_class + description, and WFDB format-16 records under records500/.

Deliberate edge cases baked in:
* one record with a missing .dat file           (validity filter must drop it)
* one record with a malformed scp_codes string  (label row must stay all-zero)
* one record with scp_codes parsing to a list   (ditto)
* one row with NaN age, one with age >= 300     (demo-vector clamp rules)
* pacemaker column holds strings ("ja, pacemaker") so float() fails -> 0.0
* sex column is numeric 0/1, so the reference's "M"/"F" string check always
  falls through to 0.5 (observed in the reference demo pack)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ptbxl_tpu.io.wfdb_io import write_record_fmt16

SCP_STATEMENTS = [
    # scp_code, description, diagnostic_class, diagnostic
    ("IMI", "inferior myocardial infarction", "MI", 1),
    ("AMI", "anterior myocardial infarction", "MI", 1),
    ("NDT", "non-diagnostic T abnormalities", "STTC", 1),
    ("ISC_", "non-specific ischemic", "STTC", 1),
    ("LVH", "left ventricular hypertrophy", "HYP", 1),
    ("RVH", "right ventricular hypertrophy", "HYP", 1),
    ("CLBBB", "complete left bundle branch block", "CD", 1),
    ("IRBBB", "incomplete right bundle branch block", "CD", 1),
    ("NORM", "normal ECG", "NORM", 1),
    ("AFIB", "atrial fibrillation", "", 0),
    ("AFLT", "atrial flutter", "", 0),
    ("SR", "sinus rhythm", "", 0),
]

_CODE_POOL = ["IMI", "AMI", "NDT", "ISC_", "LVH", "RVH", "CLBBB", "IRBBB", "NORM", "AFIB", "SR"]


def _ecg_waveform(rng: np.random.Generator, n_samples: int, fs: float = 500.0) -> np.ndarray:
    """A crude 12-lead ECG-ish signal: sum of beat impulses + noise, [T, 12]."""
    t = np.arange(n_samples) / fs
    hr = rng.uniform(50, 100)  # bpm
    beat = np.sin(2 * np.pi * hr / 60.0 * t) ** 63  # spiky R-ish peaks
    leads = []
    for lead in range(12):
        amp = rng.uniform(0.5, 2.0)
        baseline_wander = 0.1 * np.sin(2 * np.pi * 0.3 * t + rng.uniform(0, 6))
        noise = 0.02 * rng.standard_normal(n_samples)
        leads.append(amp * beat + baseline_wander + noise)
    return np.stack(leads, axis=1)


def make_synthetic_ptbxl(
    base_dir: str,
    n_records: int = 40,
    n_samples: int = 512,
    seed: int = 0,
) -> pd.DataFrame:
    """Write CSVs + WFDB records into base_dir; return the database frame."""
    rng = np.random.default_rng(seed)
    os.makedirs(base_dir, exist_ok=True)

    scp = pd.DataFrame(SCP_STATEMENTS, columns=["scp_code", "description", "diagnostic_class", "diagnostic"])
    # PTB-XL's first column is the unnamed index of scp codes
    scp_out = scp.rename(columns={"scp_code": ""})
    scp_out.to_csv(os.path.join(base_dir, "scp_statements.csv"), index=False)

    rows = []
    for i in range(n_records):
        ecg_id = i + 1
        n_codes = rng.integers(1, 4)
        codes = list(rng.choice(_CODE_POOL, size=n_codes, replace=False))
        scp_codes = "{" + ", ".join(f"'{c}': {float(rng.choice([0, 50, 100]))}" for c in codes) + "}"

        age = float(rng.integers(20, 90))
        if i == 3:
            age = np.nan  # multimodal dataset drops this row
        if i == 4:
            age = 300.0  # clamps to 90
        sex = int(rng.integers(0, 2))  # numeric, like real PTB-XL
        height = float(rng.integers(150, 200)) if rng.random() > 0.3 else np.nan
        weight = float(rng.integers(45, 120)) if rng.random() > 0.3 else np.nan
        pacemaker = "ja, pacemaker" if rng.random() < 0.1 else ""

        # folds 1..10 round-robin so every split is populated
        strat_fold = (i % 10) + 1
        filename_hr = f"records500/00000/{ecg_id:05d}_hr"

        if i == 7:
            scp_codes = "{'IMI': broken"  # malformed -> all-zero labels
        if i == 8:
            scp_codes = "['IMI']"  # parses to a list -> all-zero labels

        rows.append(
            dict(
                ecg_id=ecg_id,
                patient_id=1000 + i,
                age=age,
                sex=sex,
                height=height,
                weight=weight,
                pacemaker=pacemaker,
                scp_codes=scp_codes,
                strat_fold=strat_fold,
                filename_lr=f"records100/00000/{ecg_id:05d}_lr",
                filename_hr=filename_hr,
            )
        )

    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(base_dir, "ptbxl_database.csv"), index=False)

    for i, row in df.iterrows():
        rec_path = os.path.join(base_dir, row["filename_hr"])
        sig = _ecg_waveform(rng, n_samples)
        write_record_fmt16(rec_path, sig, fs=500.0, gain=1000.0)
        if i == 5:
            os.remove(rec_path + ".dat")  # unreadable record -> dropped by validity scan

    return df
