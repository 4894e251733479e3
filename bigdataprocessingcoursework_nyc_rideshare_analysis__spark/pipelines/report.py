"""Visualization surface for the reference's notebook charts.

The reference ships two matplotlib notebooks outside its Spark code
(``codes/task2_vis.ipynb`` — three bar charts of trip count / platform
profit / driver earnings per business-month, read from the task-2 CSV
sinks; ``codes/task5_vis.ipynb`` — average waiting time per January day
from the task-5 sink).  This module is the engine-native equivalent of
those four charts, designed for where an engine actually runs:

- ``text_bar_chart`` renders a deterministic monospace bar chart — always
  available (cluster shell, CI log, driver stdout), no plotting library.
- ``render_png`` draws the same chart with matplotlib WHEN the library is
  importable (it is not installed in this environment — the call is
  import-gated and raises a clear error otherwise, per the container's
  stub-don't-require rule).

Chart semantics mirror the notebooks exactly: the three task-2 charts
sort rows ASCENDING by value (their ``sort_values``), the task-5 chart
runs in day order (``task5_vis.ipynb`` plots ``data['day']`` unsorted);
labels are ``business-month`` (task 2) / day (task 5), bar length
proportional to the value.  Every chart collects only the AGGREGATE frame
(|businesses| × 12 rows, or ≤ 31 days) — model-sized driver state, same
rule as every other collect in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import rideshare as tasks

#: monospace bar width of the longest bar
BAR_WIDTH = 40


def text_bar_chart(
    pairs: list[tuple[str, float]],
    title: str,
    value_label: str,
    width: int = BAR_WIDTH,
) -> str:
    """Deterministic monospace bar chart: one ``label | bar value`` line per
    pair, bars scaled to ``width`` characters of ``#`` at the maximum
    value.  Negative values (possible for profit) render an empty bar with
    the exact number still printed — the number is the record, the bar is
    the glance."""
    lines = [title, "=" * len(title)]
    if not pairs:
        return "\n".join(lines + ["(no rows)"])
    label_w = max(len(str(label)) for label, _ in pairs)
    peak = max(max(value for _, value in pairs), 0.0)
    for label, value in pairs:
        n = int(round(width * value / peak)) if peak > 0 and value > 0 else 0
        lines.append(f"{str(label):<{label_w}} | {'#' * n:<{width}} {value:g}")
    lines.append(f"({value_label}; bar = {BAR_WIDTH} chars at max)")
    return "\n".join(lines)


def chart_from_rollup(
    df: DataFrame,
    label_cols: list[str],
    value_col: str,
    title: str,
    order_cols: list[str] | None = None,
) -> str:
    """Render one notebook chart from its aggregate frame: sort by
    ``order_cols`` (default: ascending by value then labels — the three
    task-2 notebooks' ``sort_values`` by the metric; ``task5_vis.ipynb``
    plots bars in DAY order instead, so its caller passes the label
    column), join the label columns with ``-`` (their
    ``business + '-' + month``), collect the aggregate-sized result, and
    draw."""
    rows = df.orderBy(*(order_cols or [value_col, *label_cols])).collect()
    pairs = [
        ("-".join(str(r[c]) for c in label_cols), float(r[value_col])) for r in rows
    ]
    return text_bar_chart(pairs, title, value_col)


def rideshare_report(enriched: DataFrame) -> str:
    """All four notebook charts from the enriched trips view — the
    ``task2_vis.ipynb`` triple and the ``task5_vis.ipynb`` waiting-time
    chart — as one monospace report.  Reads the same rollup frames the CSV
    sinks export, so chart data ≡ sink data by construction."""
    rollups = tasks.task2_monthly_rollups(enriched)
    task5 = tasks.task5_daily_anomaly(enriched)
    sections = [
        chart_from_rollup(
            rollups["trip_count"],
            ["business", "month"],
            "trip_count",
            "Trip counts per business-month",
        ),
        chart_from_rollup(
            rollups["total_profit"],
            ["business", "month"],
            "total_profit",
            "Platform profits per business-month",
        ),
        chart_from_rollup(
            rollups["total_earnings"],
            ["business", "month"],
            "total_earnings",
            "Driver earnings per business-month",
        ),
        chart_from_rollup(
            task5["daily"],
            ["day"],
            "average_waiting_time",
            "Average waiting time by January day",
            # task5_vis.ipynb bars run in day order (no sort_values there —
            # only the three task-2 charts sort by the metric)
            order_cols=["day"],
        ),
        # subtask 5b's narrative line (``task5.py:91-92``): the reference
        # collects the daily frame to pandas and prints the >300 s days;
        # here the threshold is applied in Spark and only the ≤31-row
        # anomaly list is collected
        "Days with average waiting time exceeding 300 seconds: "
        + str([r["day"] for r in task5["anomalous_days"].orderBy("day").collect()]),
    ]
    return "\n\n".join(sections)


def render_png(
    pairs: list[tuple[str, float]], title: str, value_label: str, out_path: str
) -> str:
    """Matplotlib backend for the same chart — import-gated: this container
    does not ship plotting libraries, so the text renderer is the primary
    surface and this raises with a clear message when matplotlib is
    absent (mirroring the multimodal decoders' fail-closed gates)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - matplotlib not installed here
        raise NotImplementedError(
            "render_png needs matplotlib, which is not installed in this "
            "environment; use text_bar_chart / rideshare_report instead"
        ) from exc
    labels = [label for label, _ in pairs]  # pragma: no cover - needs matplotlib
    values = [value for _, value in pairs]  # pragma: no cover
    plt.figure(figsize=(10, 6))  # pragma: no cover
    plt.bar(labels, values)  # pragma: no cover
    plt.ylabel(value_label)  # pragma: no cover
    plt.title(title)  # pragma: no cover
    plt.tight_layout()  # pragma: no cover
    plt.savefig(out_path)  # pragma: no cover
    plt.close()  # pragma: no cover
    return out_path  # pragma: no cover
