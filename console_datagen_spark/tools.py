"""Plan inspection helpers — the perf-iteration feedback loop.

``plan_summary`` condenses ``explain("formatted")`` into the facts that
matter at scale: which scans push filters / prune columns, which join
strategies were picked, how many exchanges (shuffles) the plan carries.
Used interactively while tuning and by tests/test_plans_audit.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_probe(tag: str, df: DataFrame) -> None:
    """Dump ``df``'s formatted plan when $SPARK_GRAFT_PLAN_DIR is set.

    The iterative operators (components, pagerank, kcenter) checkpoint or
    cache their per-round frames, so the registered query's tail explain
    shows only a ``Scan ExistingRDD`` / InMemoryRelation stub — the plans
    their optimizations actually changed are the PRE-checkpoint frames
    (VERDICT r14 #2/#9). Call sites probe the frame being checkpointed;
    with the env var unset this is one getenv and nothing else, so the
    query path at bench/production time is untouched.
    """
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
    if not plan_dir:
        return
    os.makedirs(plan_dir, exist_ok=True)
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(plan_dir, f"{tag}.txt"), "w") as f:
        f.write(text)


@dataclass
class PlanSummary:
    joins: list[str] = field(default_factory=list)
    exchanges: int = 0
    scans: list[dict] = field(default_factory=list)
    cartesian: bool = False
    wholestage_spans: int = 0
    raw: str = ""

    def describe(self) -> str:
        lines = [
            f"joins={self.joins or '-'} exchanges={self.exchanges} "
            f"codegen_spans={self.wholestage_spans} cartesian={self.cartesian}"
        ]
        for s in self.scans:
            lines.append(
                f"  scan cols={s['n_cols']} pushed={s['pushed'] or '-'}"
            )
        return "\n".join(lines)


_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def plan_summary(df: DataFrame) -> PlanSummary:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    out = PlanSummary(raw=text)
    # an executed AQE plan prints "== Final Plan ==" then "== Initial
    # Plan ==" — count operators from the final section only, not twice
    counted = text.split("== Initial Plan ==")[0]
    out.joins = sorted(set(_JOIN_RE.findall(counted)))
    out.cartesian = "CartesianProduct" in counted
    out.exchanges = len(
        re.findall(r"^\s*\(\d+\) Exchange", counted, re.M)
    ) or counted.count("Exchange ")
    # formatted mode doesn't print WholeStageCodegen nodes; the simple plan
    # marks fused operators with "*(n)" — count distinct codegen stage ids
    simple = df._jdf.queryExecution().executedPlan().toString()
    out.wholestage_spans = len(set(re.findall(r"\*\((\d+)\)", simple)))
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.scans.append({"pushed": m.group(1), "n_cols": None})
    for i, m in enumerate(re.finditer(r"ReadSchema: struct<([^>]*)", text)):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        if i < len(out.scans):
            out.scans[i]["n_cols"] = len(cols)
        else:
            out.scans.append({"pushed": "", "n_cols": len(cols)})
    return out
