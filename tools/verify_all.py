"""One-command round gate: every verification surface, in dependency order.

    python tools/verify_all.py [--fast]

Runs (1) the bare-session driver-contract smoke from a NEUTRAL cwd (catches
sys.path / worker-pickling assumptions pytest can't — see
.claude/skills/verify/SKILL.md), (2) the full DuckDB oracle replica at
sf0.01 on a bare session, (3) the pytest suite, (4) a bench.py smoke at
sf0.001 asserting the single-JSON-line stdout contract.  ``--fast`` skips
(3) and (4)'s sweep cost by running bench at sf0.001 only (it already
does) and pytest with -x.

Exit code 0 only if every surface passes — the state every round should
end in.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE = """
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
rows = e.entry(spark).collect()
assert rows, "entry() returned no rows"
qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs), "oracle_sql keys not a subset of queries"
print(f"SMOKE_OK entry_rows={{len(rows)}} queries={{len(qs)}} oracles={{len(osql)}}")
"""


def run(name: str, cmd: list[str], cwd: str | None = None, env=None) -> str:
    print(f"== {name}: {' '.join(cmd[:4])} ...", flush=True)
    out = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
        raise SystemExit(f"{name} FAILED (exit {out.returncode})")
    return out.stdout


def check_driver_verified_fold() -> None:
    """Fail when any CORRECTNESS_r*.json full-pass (hash_match) name is
    absent from ``registry.DRIVER_VERIFIED`` — the bookkeeping the judge
    had to flag in rounds 5 and 7.  Exception: names currently queued in
    ``CHANGED_SINCE_VERIFIED`` (an edit deliberately invalidated the row)."""
    import glob

    sys.path.insert(0, REPO)
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark import registry

    missing: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        stale = [
            name
            for name, row in rows.items()
            if row.get("hash_match")
            and name not in registry.DRIVER_VERIFIED
            and name not in registry.CHANGED_SINCE_VERIFIED
        ]
        if stale:
            missing[os.path.basename(path)] = stale
    if missing:
        raise SystemExit(
            "driver-verified-fold FAILED: full-pass names missing from "
            f"registry.DRIVER_VERIFIED: {missing}"
        )
    print(f"== driver-verified-fold OK ({len(registry.DRIVER_VERIFIED)} names)")


def main() -> None:
    fast = "--fast" in sys.argv[1:]

    # 0. bookkeeping gates (cheap, pure-python — run first): every recorded
    #    full-pass is folded into DRIVER_VERIFIED, and COVERAGE.md's totals +
    #    rows-only evidence table match the live registry
    check_driver_verified_fold()
    out = run("coverage-totals", [sys.executable, os.path.join(REPO, "tools", "coverage_totals.py")], cwd=REPO)
    print("   " + out.strip().splitlines()[-1])

    # 1. bare-session driver contract from a neutral cwd
    with tempfile.TemporaryDirectory() as td:
        out = run("driver-contract", [sys.executable, "-c", SMOKE.format(repo=REPO)], cwd=td)
        assert "SMOKE_OK" in out, out
        print("   " + [l for l in out.splitlines() if "SMOKE_OK" in l][0])

    # 2. full oracle replica, bare session, sf0.01 (the driver's gate)
    out = run(
        "oracle-replica",
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), "--bare",
         "/root/testdata/sf0.01"],
        cwd=REPO,
    )
    summary = [l for l in out.splitlines() if "ok; failed" in l][-1]
    print("   " + summary)
    assert "failed: []" in summary, summary

    # 3. pytest
    args = [sys.executable, "-m", "pytest", "tests/", "-q"] + (["-x"] if fast else [])
    out = run("pytest", args, cwd=REPO)
    print("   " + out.splitlines()[-1])

    # 4. bench stdout contract: exactly one JSON line
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="8")
    out = run("bench-contract", [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO, env=env)
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, f"bench stdout must be ONE line, got {len(lines)}"
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "queries", "sf"} <= set(payload), payload.keys()
    # the headline line carries the slowest-10 preview; n_queries is the count
    print(f"   bench OK: {payload['value']}s over {payload.get('n_queries')} queries")

    print("ALL SURFACES GREEN")


if __name__ == "__main__":
    main()
