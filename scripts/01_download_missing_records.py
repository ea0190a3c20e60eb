#!/usr/bin/env python
# scripts/01_download_missing_records.py
#
# Complete a partial local PTB-XL mirror: diff ptbxl_database.csv against the
# waveform files on disk and fetch absent .hea/.dat pairs from PhysioNet.
# CLI flags/defaults match the reference tool (reference: scripts/
# 01_download_missing_records.py); the implementation lives in
# ptbxl_tpu/data/fetch.py (stdlib urllib, atomic writes, bounded retries).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.data.fetch import DEFAULT_BASE_URL, fetch_missing  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Download missing PTB-XL waveform records from PhysioNet."
    )
    parser.add_argument("--base_dir", type=str, required=True,
                        help="Local PTB-XL directory containing ptbxl_database.csv.")
    parser.add_argument("--base_url", type=str, default=DEFAULT_BASE_URL,
                        help="Remote base URL of PTB-XL dataset.")
    parser.add_argument("--max_missing", type=int, default=None,
                        help="Limit number of records to download.")
    args = parser.parse_args()

    report = fetch_missing(args.base_dir, args.base_url, args.max_missing)
    if report.failed_records:
        sys.exit(1)


if __name__ == "__main__":
    main()
