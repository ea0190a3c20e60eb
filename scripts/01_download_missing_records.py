#!/usr/bin/env python
# scripts/01_download_missing_records.py
#
# Locate missing PTB-XL waveform files (.hea / .dat) and download them from
# PhysioNet with per-file retries (reference: scripts/01:48-79, 3 retries).

import argparse
import os
import sys
from time import sleep
from typing import List, Tuple
from urllib.parse import urljoin

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402

try:
    import requests
except ImportError:  # environment without requests: report at use time
    requests = None


def find_missing_records(base_dir: str) -> List[Tuple[str, str, str]]:
    """Rows of ptbxl_database.csv whose .hea or .dat is absent locally."""
    db_path = os.path.join(base_dir, "ptbxl_database.csv")
    if not os.path.exists(db_path):
        raise FileNotFoundError(f"ptbxl_database.csv not found at {db_path}")

    df = pd.read_csv(db_path)
    if "filename_hr" not in df.columns:
        raise KeyError("Column 'filename_hr' missing in ptbxl_database.csv")

    missing = []
    for rel_path in df["filename_hr"].tolist():
        rec_path = os.path.join(base_dir, rel_path)
        hea_path = rec_path + ".hea"
        dat_path = rec_path + ".dat"
        if not (os.path.exists(hea_path) and os.path.exists(dat_path)):
            missing.append((rel_path, hea_path, dat_path))
    return missing


def download_file(url: str, dst_path: str, session, retries: int = 3) -> bool:
    os.makedirs(os.path.dirname(dst_path), exist_ok=True)
    for attempt in range(1, retries + 1):
        try:
            print(f"  -> Downloading {url}")
            resp = session.get(url, stream=True, timeout=30)
            if resp.status_code != 200:
                print(f"     HTTP {resp.status_code} (attempt {attempt})")
                sleep(1.0)
                continue
            with open(dst_path, "wb") as f:
                for chunk in resp.iter_content(chunk_size=8192):
                    if chunk:
                        f.write(chunk)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"     Error on attempt {attempt}: {e}")
            sleep(1.0)
    print(f"  !! Failed to download {url}")
    return False


def download_missing_records(base_dir, base_url="https://physionet.org/files/ptb-xl/1.0.3/", max_missing=None):
    print(f"Local PTB-XL directory: {base_dir}")

    missing = find_missing_records(base_dir)
    print(f"Missing records: {len(missing)}")
    if not missing:
        print("All waveform files are present.")
        return

    if max_missing is not None:
        missing = missing[:max_missing]
        print(f"Processing only first {len(missing)} records (max_missing={max_missing})")

    if requests is None:
        raise RuntimeError("The 'requests' package is required to download records.")
    session = requests.Session()

    completed = 0
    for idx, (rel_path, hea_path, dat_path) in enumerate(missing, start=1):
        print(f"\n[{idx}/{len(missing)}] {rel_path}")

        ok_hea = True
        ok_dat = True
        if not os.path.exists(hea_path):
            ok_hea = download_file(urljoin(base_url, rel_path + ".hea"), hea_path, session)
        if not os.path.exists(dat_path):
            ok_dat = download_file(urljoin(base_url, rel_path + ".dat"), dat_path, session)

        if ok_hea and ok_dat:
            completed += 1
        else:
            print("  Incomplete after download attempts.")

    print(f"\nCompleted {completed} / {len(missing)} records.")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, required=True,
                        help="Local PTB-XL directory containing ptbxl_database.csv.")
    parser.add_argument("--base_url", type=str,
                        default="https://physionet.org/files/ptb-xl/1.0.3/",
                        help="Remote base URL of PTB-XL dataset.")
    parser.add_argument("--max_missing", type=int, default=None,
                        help="Limit number of records to download.")
    args = parser.parse_args()
    download_missing_records(args.base_dir, args.base_url, args.max_missing)


if __name__ == "__main__":
    main()
