#!/usr/bin/env python
# scripts/02_prepare_data.py
#
# Sanity-check PTB-XL metadata: row counts, strat_fold distribution,
# diagnostic-class counts (reference: scripts/02_prepare_data.py:28-40).

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pandas as pd  # noqa: E402


def main(base_dir: str) -> None:
    print(f"Base dir: {base_dir}")

    db_path = os.path.join(base_dir, "ptbxl_database.csv")
    scp_path = os.path.join(base_dir, "scp_statements.csv")

    if not os.path.exists(db_path):
        raise FileNotFoundError(f"ptbxl_database.csv not found at {db_path}")
    if not os.path.exists(scp_path):
        raise FileNotFoundError(f"scp_statements.csv not found at {scp_path}")

    df = pd.read_csv(db_path)
    scp = pd.read_csv(scp_path)

    first_col = scp.columns[0]
    scp = scp.rename(columns={first_col: "scp_code"})

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
    args = parser.parse_args()
    main(args.base_dir)
