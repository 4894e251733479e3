"""The per-task CLI surface: ``python -m <pkg> taskN --trips … --zones …``
must run a task end-to-end from CSVs on disk and export the reference-named
CSV files the vis notebooks consume."""

from __future__ import annotations

import csv
import glob
import shutil
import tempfile

import pytest

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.cli import main

TRIPS_HEADER = (
    "business,pickup_location,dropoff_location,trip_length,request_to_pickup,"
    "total_ride_time,on_scene_to_pickup,on_scene_to_dropoff,time_of_day,date,"
    "passenger_fare,driver_total_pay,rideshare_profit,hourly_rate,dollars_per_mile"
)
ZONES_HEADER = "LocationID,Borough,Zone,service_zone"

# epoch 1672531200 = 2023-01-01 UTC
TRIPS_ROWS = [
    "Uber,1,2,2.0,400.0,600.0,10.0,610.0,morning,1672531200,10.0,6.0,4.0,30.0,5.0",
    "Uber,1,2,2.0,450.0,600.0,10.0,610.0,evening,1672531200,10.0,6.0,4.0,30.0,5.0",
    "Lyft,2,1,2.0,100.0,600.0,10.0,610.0,night,1672617600,5.0,7.0,-2.0,30.0,2.5",
]
ZONES_ROWS = [
    "1,Manhattan,Midtown,Yellow Zone",
    "2,Brooklyn,Bay Ridge,Boro Zone",
]


@pytest.fixture()
def csv_inputs(spark):
    d = tempfile.mkdtemp(prefix="cli_test_")
    with open(f"{d}/trips.csv", "w") as f:
        f.write("\n".join([TRIPS_HEADER, *TRIPS_ROWS]) + "\n")
    with open(f"{d}/zones.csv", "w") as f:
        f.write("\n".join([ZONES_HEADER, *ZONES_ROWS]) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_csv(pattern):
    [path] = glob.glob(pattern)
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def test_cli_task2_exports_reference_csvs(spark, csv_inputs):
    rc = main(
        ["task2", "--trips", f"{csv_inputs}/trips.csv", "--zones", f"{csv_inputs}/zones.csv",
         "--out", f"{csv_inputs}/out"]
    )
    assert rc == 0
    header, rows = _read_csv(f"{csv_inputs}/out/trip_count/part-*.csv")
    assert header == ["business", "month", "trip_count"]
    assert {tuple(r) for r in rows} == {("Uber", "1", "2"), ("Lyft", "1", "1")}
    header, rows = _read_csv(f"{csv_inputs}/out/total_profit/part-*.csv")
    assert header == ["business", "month", "total_profit"]
    # money exported as format_number strings (vis-notebook contract)
    assert {tuple(r) for r in rows} == {("Uber", "1", "8.00"), ("Lyft", "1", "-2.00")}


def test_cli_task5_exports_avgwaitingtime(spark, csv_inputs):
    rc = main(
        ["task5", "--trips", f"{csv_inputs}/trips.csv", "--zones", f"{csv_inputs}/zones.csv",
         "--out", f"{csv_inputs}/out5"]
    )
    assert rc == 0
    header, rows = _read_csv(f"{csv_inputs}/out5/avgwaitingtime_task5/part-*.csv")
    assert header == ["day", "average_waiting_time"]
    assert [r[0] for r in rows] == ["1", "2"]
    assert float(rows[0][1]) == 425.0  # (400+450)/2


def test_cli_task1_runs(spark, csv_inputs, capsys):
    rc = main(["task1", "--trips", f"{csv_inputs}/trips.csv", "--zones", f"{csv_inputs}/zones.csv"])
    assert rc == 0
    assert "rows: 3" in capsys.readouterr().out


def test_report_task_renders_all_four_notebook_charts(capsys, csv_inputs):
    """The ``report`` task (the vis-notebook surface) must print one
    monospace bar chart per notebook figure — trip counts, profits,
    earnings per business-month, and January daily waiting time — with
    labels joined the way the notebooks build them and bars scaled to the
    values."""
    assert main(["report", "--trips", f"{csv_inputs}/trips.csv", "--zones", f"{csv_inputs}/zones.csv"]) == 0
    out = capsys.readouterr().out
    for title in (
        "Trip counts per business-month",
        "Platform profits per business-month",
        "Driver earnings per business-month",
        "Average waiting time by January day",
    ):
        assert title in out, title
    # fixture facts: Uber has 2 January trips, Lyft 1 — ascending order
    # puts Lyft-1 before Uber-1, and Uber's bar is the 40-char maximum
    lines = out.splitlines()
    trip_lines = [l for l in lines if l.startswith(("Uber-1", "Lyft-1"))]
    assert trip_lines and trip_lines[0].startswith("Lyft-1")
    uber_trip = next(l for l in trip_lines if l.startswith("Uber-1") and l.rstrip().endswith(" 2"))
    assert "#" * 40 in uber_trip
    # negative profit (Lyft -2.0) renders an empty bar but the exact number
    profit_lines = [l for l in lines if l.rstrip().endswith("-2")]
    assert profit_lines and "#" not in profit_lines[0]


def test_report_task5_chart_golden_with_anomalous_day(capsys, csv_inputs):
    """End-to-end semantic golden for the task-5 report section on a
    fixture shaped like the reference's published output (one January day
    above the 300 s threshold, per ``CSV/avgwaitingtime_task5.csv``): the
    chart must run in DAY order (``task5_vis.ipynb`` plots ``data['day']``
    unsorted — only the task-2 notebooks sort by the metric), and the
    subtask-5b narrative line (``task5.py:91-92``) must name exactly the
    >300 s days.  Pinned as full rendered text so a sort/threshold/format
    regression fails on the exact line."""
    assert main(["report", "--trips", f"{csv_inputs}/trips.csv", "--zones", f"{csv_inputs}/zones.csv"]) == 0
    out = capsys.readouterr().out
    # fixture: day 1 avg (400+450)/2 = 425 (anomalous), day 2 avg 100
    golden = "\n".join(
        [
            "Average waiting time by January day",
            "===================================",
            f"1 | {'#' * 40} 425",
            f"2 | {'#' * 9:<40} 100",
            "(average_waiting_time; bar = 40 chars at max)",
            "",
            "Days with average waiting time exceeding 300 seconds: [1]",
        ]
    )
    assert golden in out, out


def test_text_bar_chart_is_deterministic_and_scaled():
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.pipelines.report import (
        text_bar_chart,
    )

    chart = text_bar_chart([("a", 1.0), ("b", 2.0)], "T", "v", width=10)
    assert chart == text_bar_chart([("a", 1.0), ("b", 2.0)], "T", "v", width=10)
    lines = chart.splitlines()
    assert lines[0] == "T"
    a_line = next(l for l in lines if l.startswith("a"))
    b_line = next(l for l in lines if l.startswith("b"))
    assert a_line.count("#") == 5 and b_line.count("#") == 10
    assert "(no rows)" in text_bar_chart([], "T", "v")


def test_render_png_gated_without_matplotlib():
    import importlib.util

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.pipelines.report import (
        render_png,
    )

    if importlib.util.find_spec("matplotlib") is not None:
        import pytest

        pytest.skip("matplotlib present — gate not exercised")
    import pytest

    with pytest.raises(NotImplementedError):
        render_png([("a", 1.0)], "T", "v", "/tmp/never.png")
