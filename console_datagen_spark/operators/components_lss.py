"""Large-star / small-star connected components (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond").

An alternative kernel to operators/dedup.dup_components' min-label
propagation. Label propagation needs O(diameter) rounds — a 10M-node
near-dup chain (pathological but real: template pages that drift one
token per crawl) needs 10M rounds. Large-star/small-star converges in
O(log n) rounds regardless of diameter, at the cost of rewriting the
edge list each round instead of carrying a label table:

- large-star: every node u connects its LARGER neighbors to
  m = min(N(u) ∪ {u}) — long chains fold toward small ids;
- small-star: every node u connects its smaller-or-equal neighbors
  (and itself) to m — the graph collapses into stars.

Both steps preserve connectivity and never create cross-component
edges, and the fixpoint is a union of stars centered at each
component's minimum id — so the final labels are EXACTLY
dup_components' labels (min reachable id), and the same recursive-CTE
oracle certifies both implementations.

Scale shape: each half-round is one groupBy-min + one equi-join on the
edge list, checkpointed per round (same plan-truncation rationale as
dup_components — a self-referencing loop otherwise doubles the logical
plan until analysis OOMs). Convergence = canonical edge set unchanged,
checked with two anti-join probes on the (small) edge frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LAST_ROUNDS: int | None = None
_LAST_ROUND_STATS: list[dict] = []


def last_lss_rounds() -> int | None:
    """Rounds the most recent dup_components_lss call needed to converge
    — the scale probe's O(log n) evidence (scripts/scale_probe.py)."""
    return _LAST_ROUNDS


def last_lss_round_stats() -> list[dict]:
    """Per-round telemetry of the most recent call: wall seconds and edge
    count per round — the scale probe's per-round cost evidence (the r8
    endpoint-fit exponent hid an accelerating per-leg curve)."""
    return list(_LAST_ROUND_STATS)


def _canon(edges: DataFrame) -> DataFrame:
    """Distinct (hi, lo) canonical form, self-loops dropped."""
    return (
        edges.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """(v, min(N(u) ∪ {u})) for every neighbor v > u, over all nodes u."""
    sym = canon.select("a", "b").union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
    m = F.least(F.col("a"), F.col("mn"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), m.alias("b"))
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """Per larger endpoint u with smaller neighbors N: re-wire
    N ∪ {u} onto m = min(N) — (x, m) for every x ≠ m."""
    mins = canon.groupBy("a").agg(F.min("b").alias("mn"))
    joined = canon.join(mins, "a")
    rewired = joined.select(F.col("b").alias("x"), F.col("mn").alias("m")).union(
        joined.select(F.col("a").alias("x"), F.col("mn").alias("m"))
    )
    return rewired.where(F.col("x") != F.col("m")).select(
        F.col("x").alias("a"), F.col("m").alias("b")
    )


def dup_components_lss(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 16,
) -> DataFrame:
    """(doc_id, component) — identical labels to dup_components, computed
    with the O(log n)-round large-star/small-star kernel."""

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    # one materialization of the (possibly expensive) upstream pair
    # pipeline; nodes and the canonical edge set both derive from it
    raw = _ckpt(pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")))
    nodes = raw.select(F.col("a").alias("doc_id")).union(
        raw.select(F.col("b").alias("doc_id"))
    ).distinct()
    edges = _ckpt(_canon(raw))
    n_edges = edges.count()
    converged = False
    global _LAST_ROUNDS
    _LAST_ROUND_STATS.clear()
    import time as _time

    for _round in range(max_iter):
        _LAST_ROUNDS = _round + 1
        _t0 = _time.perf_counter()
        new_edges = _ckpt(_canon(_small_star(_canon(_large_star(edges)))))
        # both frames are distinct sets, so equal counts + one empty
        # one-sided anti probe ⇒ set equality (counts over checkpointed
        # partitions are near-free; at corpus scale the probe is the
        # same O(|E|) cost as one half-round)
        n_new = new_edges.count()
        _LAST_ROUND_STATS.append(
            {
                "round": _round + 1,
                "sec": round(_time.perf_counter() - _t0, 3),
                "n_edges": n_new,
                "n_parts": new_edges.rdd.getNumPartitions(),
            }
        )
        if n_new == n_edges and new_edges.exceptAll(edges).limit(1).count() == 0:
            converged = True
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new
    if not converged:
        raise RuntimeError(
            f"dup_components_lss did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed = O(log n))"
        )
    # fixpoint = stars centered at component minima: every non-root
    # appears as `a` with b = root; roots appear only as `b`
    labels = edges.select(F.col("a").alias("doc_id"), F.col("b").alias("component"))
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .orderBy("doc_id")
    )
