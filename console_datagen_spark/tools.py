"""Plan inspection helpers — the perf-iteration feedback loop.

``plan_summary`` condenses ``explain("formatted")`` into the facts that
matter at scale: which scans push filters / prune columns, which join
strategies were picked, how many exchanges (shuffles) the plan carries.
Used interactively while tuning and by tests/test_plans_audit.py.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


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
    out.joins = sorted(set(_JOIN_RE.findall(text)))
    out.cartesian = "CartesianProduct" in text
    out.exchanges = len(re.findall(r"^\s*\(\d+\) Exchange", text, re.M)) or text.count(
        "Exchange "
    )
    out.wholestage_spans = len(re.findall(r"WholeStageCodegen", text))
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.scans.append({"pushed": m.group(1), "n_cols": None})
    for i, m in enumerate(re.finditer(r"ReadSchema: struct<([^>]*)", text)):
        cols = [c for c in m.group(1).split(",") if ":" in c]
        if i < len(out.scans):
            out.scans[i]["n_cols"] = len(cols)
        else:
            out.scans.append({"pushed": "", "n_cols": len(cols)})
    return out
