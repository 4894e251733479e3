"""Re-pin BASELINE.json's per-query bench baselines from BENCH_DETAIL.json.

Run bench.py (the exact sweep the driver runs) with the machine otherwise
quiet — pins must be recorded under sweep-identical conditions so a
future BENCH_rN line is comparable number-for-number.  To absorb sweep
noise, pass several BENCH_DETAIL files (copies from consecutive runs):
the pin for each query is the element-wise MAX across runs, so the 2×
regression gate only fires on something no observed run exhibited.

Usage: python tools/repin_baseline.py [round_label] [detail.json ...]
       (defaults to the single latest BENCH_DETAIL.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "r4"
    paths = [Path(p) for p in sys.argv[2:]] or [REPO / "BENCH_DETAIL.json"]
    details = [json.loads(p.read_text()) for p in paths]
    detail = details[-1]
    if len(details) > 1:
        merged = {}
        for d in details:
            for q, sec in d["queries"].items():
                merged[q] = max(merged.get(q, 0.0), sec)
        detail = dict(detail)
        detail["queries"] = merged
        detail["value"] = round(sum(merged.values()), 4)
        detail["n_queries"] = len(merged)
    baseline_path = REPO / "BASELINE.json"
    baseline = json.loads(baseline_path.read_text())
    pins = baseline.setdefault("bench_pins", {})
    prev_total = pins.get("perquery_sec") and round(sum(pins["perquery_sec"].values()), 2)
    pins[f"{label}_total_sec"] = detail["value"]
    pins["perquery_sec"] = detail["queries"]
    pins["stage_build_sec"] = detail.get("stage_build_sec")
    if "warehouse" in detail:
        pins["warehouse"] = detail["warehouse"]
    runs = max(1, len(paths))
    pins["comment"] = (
        f"Per-query regression pins (seconds, sf{detail.get('sf')}, local[32], cold cache "
        f"per query, staging+warehouse built during warmup — their costs are "
        f"stage_build_sec / warehouse.build_sec, not query time).  perquery_sec recorded at "
        f"END of round {label[1:]} on shipped code ({detail.get('n_queries')} queries) under "
        f"SWEEP-IDENTICAL conditions (full bench.py, element-wise max over {runs} run(s)). "
        f"Previous pinned total: {prev_total}.  A query >2x its pin without a plan-change "
        f"justification is a regression."
    )
    baseline_path.write_text(json.dumps(baseline, indent=1, sort_keys=False) + "\n")
    print(f"pinned {detail.get('n_queries')} queries, total {detail['value']}s (prev {prev_total})")


if __name__ == "__main__":
    main()
