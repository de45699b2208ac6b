"""console_datagen_spark — a PySpark-native analytics/data-generation engine.

A brand-new engine with the query and data-processing capabilities of
``streamshub/console-datagen`` (see SURVEY.md), re-expressed Spark-first:
DataFrame / Spark SQL for the relational surface, Structured Streaming for
the generator/counter paths, Pandas UDFs only where built-ins can't express
the semantics.

Layout:
    session     SparkSession factory (local test defaults, cluster-ready)
    catalog     fixture-table loading / temp-view registration
    naming      topic/group/client-id name generation (SURVEY §2.2 G10)
    config      typed config tree + client-config derivation (SURVEY §1.3)
    schemas     record/key/value StructTypes (SURVEY §1.1) + fixture schemas
    plans/      declared queries: each has a Spark callable + DuckDB oracle
    operators/  reusable DataFrame transforms (dedup, similarity, top-k, ...)
    functions/  column-expression helpers (vector math, text, hashing, rate)
    sources/    record generator, Kafka IO, admin lifecycle
    streaming/  counters, health analytics, windowed streaming ops
"""

__version__ = "0.1.0"
