#!/usr/bin/env python
# scripts/02_prepare_data.py — PTB-XL metadata sanity report: row counts,
# strat_fold distribution, diagnostic-class counts (reference: scripts/02).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ptbxl_tpu.utils.label_maps import load_metadata  # noqa: E402


def report(base_dir: str) -> None:
    print(f"Base dir: {base_dir}")

    # load_metadata performs the existence checks + scp_code rename
    df, scp = load_metadata(base_dir)

    print(f"\nLoaded ptbxl_database.csv: {len(df)} rows")
    print("Columns:", list(df.columns))

    print("\nstrat_fold distribution:")
    print(df["strat_fold"].value_counts().sort_index())

    print(f"\nLoaded scp_statements.csv: {len(scp)} rows")
    print("Columns:", list(scp.columns))

    if "diagnostic_class" in scp.columns:
        print("\nDiagnostic classes:")
        print(scp["diagnostic_class"].value_counts())


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", type=str, required=True,
                        help="Path to PTB-XL 1.0.3 directory (contains ptbxl_database.csv)")
    report(parser.parse_args().base_dir)
