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


def _svg_bar_chart(labels: list[str], values: list[float], *, width: int = 720,
                   bar_h: int = 18, gap: int = 6, color_fn=None) -> str:
    """Dependency-free horizontal bar chart as inline SVG (the visualizer
    analog, metrics/visualizer.py:370-413 — no matplotlib in this stack)."""
    import html as _html

    vmax = max([v for v in values if v == v] + [1e-12])
    label_w = 220
    rows = []
    for i, (lab, v) in enumerate(zip(labels, values)):
        y = i * (bar_h + gap)
        w = max(1.0, (width - label_w - 80) * (v / vmax)) if v == v else 0
        color = color_fn(v) if color_fn else "#4878a8"
        # user-defined check ids (YAML suites) may contain <, &, quotes
        lab = _html.escape(str(lab))
        rows.append(
            f'<text x="{label_w - 8}" y="{y + bar_h - 4}" text-anchor="end" '
            f'font-size="12" font-family="monospace">{lab}</text>'
            f'<rect x="{label_w}" y="{y}" width="{w:.1f}" height="{bar_h}" '
            f'fill="{color}" rx="2"/>'
            f'<text x="{label_w + w + 6:.1f}" y="{y + bar_h - 4}" '
            f'font-size="12" font-family="monospace">{v:.6g}</text>'
        )
    h = len(labels) * (bar_h + gap)
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{h}" viewBox="0 0 {width} {h}">' + "".join(rows) + "</svg>")


def _svg_histogram(edges, counts, *, width: int = 340, height: int = 120,
                   title: str = "") -> str:
    """Dependency-free vertical histogram as inline SVG — the per-column
    distribution plot (metrics/visualizer.py:370-413 analog; the reference
    plots matplotlib histograms per column, this stack has no matplotlib).
    ``counts`` has len(edges)+1 bins (under/overflow from FixedHistogram);
    the finite interior bins are drawn, under/overflow shown as edge bars."""
    import html as _html

    import numpy as np

    counts = np.asarray(counts, dtype=np.float64)
    edges = np.asarray(edges, dtype=np.float64)
    n = len(counts)
    vmax = max(counts.max(), 1.0)
    pad_b, pad_t = 18, 14
    bar_w = width / n
    plot_h = height - pad_b - pad_t
    bars = []
    for i, c in enumerate(counts):
        h = plot_h * (c / vmax)
        x = i * bar_w
        fill = "#b0784a" if i == 0 or i == n - 1 else "#4878a8"  # under/over
        bars.append(
            f'<rect x="{x:.1f}" y="{pad_t + plot_h - h:.1f}" '
            f'width="{max(bar_w - 1, 1):.1f}" height="{h:.1f}" fill="{fill}">'
            f'<title>{c:.0f}</title></rect>'
        )
    lo = f"{edges[0]:.6g}" if len(edges) else ""
    hi = f"{edges[-1]:.6g}" if len(edges) else ""
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<text x="4" y="11" font-size="11" font-family="monospace">'
        f'{_html.escape(title)} (max {vmax:.6g})</text>'
        + "".join(bars)
        + f'<text x="4" y="{height - 5}" font-size="10" '
          f'font-family="monospace">{lo}</text>'
        + f'<text x="{width - 4}" y="{height - 5}" text-anchor="end" '
          f'font-size="10" font-family="monospace">{hi}</text></svg>'
    )


def column_distribution_svgs(result: ValidationResult) -> dict[str, str]:
    """One SVG histogram per profiled column that carries a FixedHistogram
    sketch (merged across partitions — the distributed analog of the
    reference's per-column distribution plots)."""
    out = {}
    for col, p in sorted((result.profiles or {}).items()):
        h = p.get("_hist")
        if h is not None:
            out[col] = _svg_histogram(h.edges, h.counts, title=col)
    return out


def to_html_dashboard(result: ValidationResult,
                      title: str = "Validation dashboard") -> str:
    """Self-contained HTML dashboard: headline tiles, per-check violation-rate
    bars, column-profile table (metrics/dashboard.py:9 analog; zero deps —
    inline SVG, renders in any browser)."""
    import html as _html

    summary = check_summary(result)
    status = "PASS" if result.passed() else "FAIL"
    status_color = "#2e7d32" if result.passed() else "#c62828"
    title = _html.escape(str(title))
    bars = ""
    if len(summary):
        bars = _svg_bar_chart(
            summary["check_id"].tolist(),
            summary["violation_rate"].astype(float).tolist(),
            color_fn=lambda v: "#2e7d32" if v == 0 else "#c62828",
        )
    prof = profile_table(result)
    prof_html = prof.to_html(index=False, border=0) if len(prof) else ""
    dists = column_distribution_svgs(result)
    dist_html = ""
    if dists:
        dist_html = ("<h2>Column distributions</h2>\n<div class=\"dists\">"
                     + "".join(f'<div class="dist">{svg}</div>'
                               for svg in dists.values())
                     + "</div>")
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 24px; color: #222; }}
 .tiles {{ display: flex; gap: 16px; margin-bottom: 24px; }}
 .tile {{ border: 1px solid #ddd; border-radius: 8px; padding: 12px 20px; }}
 .tile b {{ display: block; font-size: 22px; }}
 table {{ border-collapse: collapse; font-size: 13px; }}
 td, th {{ padding: 4px 10px; border-bottom: 1px solid #eee; text-align: right; }}
 th {{ background: #f5f5f5; }}
 .dists {{ display: flex; flex-wrap: wrap; gap: 12px; }}
 .dist {{ border: 1px solid #eee; border-radius: 6px; padding: 6px; }}
</style></head><body>
<h1>{title}</h1>
<div class="tiles">
 <div class="tile"><b style="color:{status_color}">{status}</b>overall</div>
 <div class="tile"><b>{result.n_rows:,}</b>rows validated</div>
 <div class="tile"><b>{result.total_violations:,}</b>violations</div>
 <div class="tile"><b>{len(summary)}</b>checks</div>
</div>
<h2>Violation rate per check</h2>
{bars}
{dist_html}
<h2>Column profiles</h2>
{prof_html}
</body></html>"""


def write_report(result: ValidationResult, out_dir: str,
                 title: str = "Validation report") -> dict[str, str]:
    """CSV + markdown + JSON + HTML-dashboard sinks (reporter.py:632-670 +
    metrics/dashboard.py analog)."""
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
    paths["html"] = os.path.join(out_dir, "dashboard.html")
    with open(paths["html"], "w") as f:
        f.write(to_html_dashboard(result, title))
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
