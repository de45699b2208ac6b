"""Central registry of declared queries.

A QuerySpec binds one name to (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (b) an equivalent DuckDB SQL oracle (or None for ops whose
semantics aren't batch-SQL-expressible — the driver then records a weaker
rows-only check).

Contract (SURVEY.md §2.11, FIXTURES.md D1–D5): column names identical on
both sides, total ORDER BY, DECIMAL(18,2) casts for double aggregates,
DATE-granularity time projections, no nondeterministic functions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""
    tables: tuple[str, ...] = field(default=())


from ..caching import CacheSlot  # re-export for plan modules  # noqa: E402

_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def sql_query(
    name: str,
    spark_sql: str,
    oracle: str | None = "",
    tables: tuple[str, ...] = (),
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> QuerySpec:
    """Register a query given as Spark SQL text.

    ``oracle=""`` (default) means the Spark SQL is dialect-portable and is
    reused verbatim as the DuckDB oracle; pass an explicit string when the
    dialects differ (e.g. get_json_object vs json_extract_string), or None
    for rows-only checks.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, tables)
        # __PAR__ = session core count, substituted at RUN time: fixed
        # REPARTITION(32) hints were tuned to the local box and would cap
        # a real cluster's scan fan-out at 32 (and skew the driver's
        # lower-core-count scaling runs); the hint must track the session
        # (r14 opt, guide §2: make partitioning scale-adaptive)
        sql = spark_sql
        if "__PAR__" in sql:
            sql = sql.replace(
                "__PAR__", str(spark.sparkContext.defaultParallelism)
            )
        return spark.sql(sql)

    run.__doc__ = doc or spark_sql
    return register(
        QuerySpec(
            name=name,
            spark=run,
            oracle=spark_sql if oracle == "" else oracle,
            tags=tags,
            doc=doc,
            tables=tables,
        )
    )


def df_query(
    name: str,
    fn: SparkQuery,
    oracle: str | None,
    tables: tuple[str, ...] = (),
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> QuerySpec:
    """Register a query implemented with the DataFrame API."""
    return register(
        QuerySpec(name=name, spark=fn, oracle=oracle, tags=tags, doc=doc, tables=tables)
    )


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def promote(names: list[str]) -> None:
    """Reorder the registry so ``names`` come first, in the given order.

    Registry *names* are append-only (external harnesses key results by
    name) but *order* is a presentation concern: a prefix-window harness
    certifies the first N entries, so each round rotates never-yet-sampled
    queries to the front. Unknown names raise — the rotation list must not
    drift from the registry.
    """
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise KeyError(f"promote: unknown query names {missing}")
    if len(set(names)) != len(names):
        dups = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"promote: duplicate names {dups} — a repeated entry would "
            "silently shrink the certification window"
        )
    front = {n: _REGISTRY[n] for n in names}
    rest = {n: s for n, s in _REGISTRY.items() if n not in front}
    _REGISTRY.clear()
    _REGISTRY.update(front)
    _REGISTRY.update(rest)


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]
