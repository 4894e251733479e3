"""Physical-plan inspection helpers.

"The first plan that passes" is not the goal — these helpers let tests pin
the plan we actually want: broadcast joins where dimensions are small, no
cartesian products, pruned scan schemas, whole-stage codegen on the hot path.
A regression that silently turns a broadcast join into a sort-merge join (or
widens a pruned scan) fails CI instead of surfacing as a 10× slowdown at the
next scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``df.explain`` prints; this returns)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in physical plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = plan_string(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in physical plan:\n{plan}"
