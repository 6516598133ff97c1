"""Report generation: summary matrices, markdown, and CSV sinks.

Engine recast of the reference's reporting layer — the pass-rate summary
matrix (/root/reference/biosample_enricher/metrics/reporter.py:28-443),
regional grouped table (:445-531), and markdown rendering
(metrics/markdown.py:9-32) — over the engine's ValidationResult. All inputs
here are already small aggregates; rendering is driver-side by design (S9).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd

from .validate import ValidationResult


def check_summary(result: ValidationResult) -> pd.DataFrame:
    """Per-check totals across partitions: the reference's summary matrix
    collapsed over the partition axis (reporter.py:28-143)."""
    if not len(result.matrix):
        return pd.DataFrame(
            columns=["check_id", "n_rows", "n_violations", "violation_rate", "passed"]
        )
    out = (
        result.matrix.groupby("check_id", as_index=False)[["n_violations", "n_rows"]]
        .sum()
    )
    out["violation_rate"] = (out["n_violations"] / out["n_rows"].clip(lower=1)).round(6)
    out["passed"] = out["n_violations"] == 0
    return out.sort_values("check_id").reset_index(drop=True)


def partition_matrix(result: ValidationResult) -> pd.DataFrame:
    """partition × check pivot of violation counts (the detailed matrix)."""
    if not len(result.matrix):
        return pd.DataFrame()
    return result.matrix.pivot_table(
        index="partition_id", columns="check_id", values="n_violations",
        aggfunc="sum", fill_value=0,
    )


def profile_table(result: ValidationResult) -> pd.DataFrame:
    """Column profiles as a flat table (schema_statistics.py:125-160 analog)."""
    rows = []
    for col, p in sorted(result.profiles.items()):
        row: dict[str, Any] = {
            "column": col,
            "n": p.get("n"),
            "null_count": p.get("null_count"),
            "null_rate": round(p.get("null_rate", float("nan")), 6),
            "min": p.get("min"),
            "max": p.get("max"),
            "distinct_hll": (round(p["distinct_hll"]) if "distinct_hll" in p else None),
        }
        for q, v in (p.get("quantiles") or {}).items():
            row[f"p{int(q * 100):02d}"] = round(v, 2)
        rows.append(row)
    return pd.DataFrame(rows)


def _md_table(df: pd.DataFrame) -> str:
    """Minimal markdown table renderer (tabulate is not in this container)."""
    cols = [str(c) for c in df.columns]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join(["---"] * len(cols)) + "|"]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join("" if pd.isna(v) else str(v) for v in row) + " |")
    return "\n".join(lines)


def to_markdown(result: ValidationResult, title: str = "Validation report") -> str:
    """Markdown report (markdown.py:9-32 analog)."""
    lines = [f"# {title}", ""]
    summary = check_summary(result)
    lines.append(f"Rows validated: **{result.n_rows}** — "
                 f"violations: **{result.total_violations}** — "
                 f"overall: **{'PASS' if result.passed() else 'FAIL'}**")
    lines.append("")
    lines.append("## Per-check summary")
    lines.append("")
    lines.append(_md_table(summary))
    prof = profile_table(result)
    if len(prof):
        lines.append("")
        lines.append("## Column profiles")
        lines.append("")
        lines.append(_md_table(prof))
    return "\n".join(lines)


def write_report(result: ValidationResult, out_dir: str,
                 title: str = "Validation report") -> dict[str, str]:
    """CSV + markdown + JSON sinks (reporter.py:632-670 analog)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    summary = check_summary(result)
    paths["summary_csv"] = os.path.join(out_dir, "check_summary.csv")
    summary.to_csv(paths["summary_csv"], index=False)
    paths["matrix_csv"] = os.path.join(out_dir, "passfail_matrix.csv")
    result.matrix.to_csv(paths["matrix_csv"], index=False)
    paths["profiles_csv"] = os.path.join(out_dir, "column_profiles.csv")
    profile_table(result).to_csv(paths["profiles_csv"], index=False)
    paths["markdown"] = os.path.join(out_dir, "report.md")
    with open(paths["markdown"], "w") as f:
        f.write(to_markdown(result, title))
    paths["summary_json"] = os.path.join(out_dir, "summary.json")
    with open(paths["summary_json"], "w") as f:
        json.dump(
            {
                "n_rows": result.n_rows,
                "total_violations": result.total_violations,
                "passed": result.passed(),
                "checks": summary.to_dict("records"),
            },
            f, indent=1, default=str,
        )
    return paths
