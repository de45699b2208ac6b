"""As-of and binned range joins: semantics vs naive theta-join equivalents."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.temporal import as_of_join, range_join_binned


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [("u", 100, "L1"), ("u", 205, "L2"), ("v", 50, "L3")],
        "k STRING, ts LONG, lbl STRING",
    )
    right = spark.createDataFrame(
        [("u", 90, "A"), ("u", 100, "B"), ("u", 201, "C"), ("w", 10, "X")],
        "k STRING, ts LONG, val STRING",
    )
    out = {
        (r.lbl): r.asof_val
        for r in as_of_join(left, right, "k", value_cols=["val"]).collect()
    }
    assert out["L1"] == "B"  # same-ts right row counts (<= semantics)
    assert out["L2"] == "C"
    assert out["L3"] is None  # no right row for v at all


def test_asof_null_value_cols_come_from_same_row(spark):
    # a NULL in one value column of the latest right row must surface as
    # NULL, not be backfilled from an older right row (all carried columns
    # come from ONE struct — the latest as-of row)
    left = spark.createDataFrame([("u", 300, "L1")], "k STRING, ts LONG, lbl STRING")
    right = spark.createDataFrame(
        [("u", 100, "old-a", "old-b"), ("u", 200, "new-a", None)],
        "k STRING, ts LONG, a STRING, b STRING",
    )
    row = as_of_join(left, right, "k", value_cols=["a", "b"]).collect()[0]
    assert row.asof_a == "new-a"
    assert row.asof_b is None  # NOT "old-b"


def test_salted_join_rejects_outer_joins(spark):
    from console_datagen_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "x")], "k LONG, a STRING")
    dim = spark.createDataFrame([(1, "y")], "k LONG, b STRING")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(fact, dim, ["k"], how="right")
    assert salted_join(fact, dim, ["k"], how="left").count() == 1


def test_asof_matches_theta_join_on_fixture(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    left = ev.where("event_type = 'purchase'").select("user_id", "event_id", "ts")
    right = ev.where("event_type = 'click'").select("user_id", "ts", "event_id")
    fast = {
        (r.user_id, r.event_id): r.asof_event_id
        for r in as_of_join(
            left, right, "user_id", value_cols=["event_id"], tiebreak="event_id"
        ).collect()
    }
    # naive correlated max (quadratic — fine at fixture scale)
    ev.createOrReplaceTempView("events")
    naive = {
        (r.user_id, r.event_id): r.last_click
        for r in spark.sql(
            "SELECT p.user_id, p.event_id, "
            "(SELECT c.event_id FROM events c WHERE c.user_id = p.user_id "
            " AND c.event_type = 'click' AND c.ts <= p.ts "
            " ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click "
            "FROM events p WHERE p.event_type = 'purchase'"
        ).collect()
    }
    assert fast == naive


def test_range_join_matches_theta(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    bands = spark.createDataFrame(
        [("a", 0, 30), ("b", 25, 80), ("c", 81, 500)],  # overlapping bands
        "band STRING, lo INT, hi INT",
    )
    probe = ev.select("event_id", F.floor("value").cast("int").alias("v"))
    fast = {
        (r.event_id, r.band)
        for r in range_join_binned(probe, bands, "v", bin_width=37).collect()
    }
    theta = {
        (r.event_id, r.band)
        for r in probe.join(
            bands, probe.v.between(bands.lo, bands.hi)
        ).collect()
    }
    assert fast == theta
    assert fast  # nonempty


def test_range_join_no_nested_loop(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    bands = spark.createDataFrame(
        [("a", 0, 30)], "band STRING, lo INT, hi INT"
    )
    probe = ev.select("event_id", F.floor("value").cast("int").alias("v"))
    plan = (
        range_join_binned(probe, bands, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan[:1500]
