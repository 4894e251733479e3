"""Re-pin BASELINE.json's per-query bench baselines from the latest
BENCH_DETAIL.json (run bench.py SOLO first — concurrent Spark sessions
inflate timings ~15-20%).

Usage: python tools/repin_baseline.py [round_label]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "r4"
    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    baseline_path = REPO / "BASELINE.json"
    baseline = json.loads(baseline_path.read_text())
    pins = baseline.setdefault("bench_pins", {})
    prev_total = pins.get("perquery_sec") and round(sum(pins["perquery_sec"].values()), 2)
    pins[f"{label}_total_sec"] = detail["value"]
    pins["perquery_sec"] = detail["queries"]
    pins["stage_build_sec"] = detail.get("stage_build_sec")
    if "warehouse" in detail:
        pins["warehouse"] = detail["warehouse"]
    pins["comment"] = (
        f"Per-query regression pins (seconds, sf{detail.get('sf')}, local[32], cold cache "
        f"per query, staging+warehouse built during warmup — their costs are "
        f"stage_build_sec / warehouse.build_sec, not query time).  perquery_sec recorded at "
        f"END of round {label[1:]} on shipped code ({detail.get('n_queries')} queries, run solo). "
        f"Previous pinned total: {prev_total}.  A query >2x its pin without a plan-change "
        f"justification is a regression."
    )
    baseline_path.write_text(json.dumps(baseline, indent=1, sort_keys=False) + "\n")
    print(f"pinned {detail.get('n_queries')} queries, total {detail['value']}s (prev {prev_total})")


if __name__ == "__main__":
    main()
