"""Aggregate eval CSV logs: per-run / per-sequence / overall means.

Counterpart of reference evals/process_logs_tum.py and
process_logs_7scenes.py (pandas group-by over the sweep CSVs).
"""
from __future__ import annotations

import argparse

import pandas as pd


def summarize(csv_path: str, metrics=("ate_rmse",)) -> pd.DataFrame:
    df = pd.read_csv(csv_path)
    present = [m for m in metrics if m in df.columns]
    per_seq = df.groupby("sequence")[present].agg(["mean", "std", "count"])
    print("== per-sequence ==")
    print(per_seq.to_string())
    print("\n== per-trial means ==")
    print(df.groupby("trial")[present].mean().to_string())
    print("\n== overall ==")
    print(df[present].agg(["mean", "std"]).to_string())
    return per_seq


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--metrics", nargs="+",
                   default=["ate_rmse", "wall_s", "rmse_accuracy",
                            "rmse_completeness", "chamfer_rmse"])
    args = p.parse_args()
    summarize(args.csv, args.metrics)


if __name__ == "__main__":
    main()
