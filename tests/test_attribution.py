"""Multi-touch attribution: every model must conserve total cents."""

from __future__ import annotations

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.plans import all_queries


def test_every_model_conserves_total_cents(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    total = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")))
        .collect()[0][0]
    )
    rows = all_queries()["seq_attribution"].spark(spark, sf_dir).collect()
    assert sum(r.last_touch_cents for r in rows) == total
    assert sum(r.first_touch_cents for r in rows) == total
    assert sum(r.linear_cents for r in rows) == total
    # last-touch wins partition the purchases exactly once each
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    assert sum(r.n_last_wins for r in rows) == n_purchases
