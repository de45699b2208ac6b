"""Edge-case tests for the leakage-safe feature tier (plans/features.py)
and the supervision tier (plans/supervision.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from console_datagen_spark.plans import all_queries


@pytest.fixture(scope="module")
def synth_sf(tmp_path_factory):
    """A tiny hand-built events fixture with the edge shapes the real
    data may not exercise: same-instant changelog ties, a purchase
    before any dim change, a click exactly on the 1 h funnel boundary,
    and one just past it."""
    d = tmp_path_factory.mktemp("synth_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            -- user 1: two changes at the SAME ts (event 11 must win),
            -- then a purchase between changes, then after both
            (10, TIMESTAMP '2024-01-01 00:00:00', 1, 'view',     1.00, '{{}}'),
            (11, TIMESTAMP '2024-01-01 00:00:00', 1, 'click',    2.00, '{{}}'),
            (12, TIMESTAMP '2024-01-01 01:00:00', 1, 'purchase', 9.99, '{{}}'),
            (13, TIMESTAMP '2024-01-01 02:00:00', 1, 'view',     3.00, '{{}}'),
            (14, TIMESTAMP '2024-01-01 03:00:00', 1, 'purchase', 9.99, '{{}}'),
            -- user 2: purchase is the FIRST event (PIT feature: the
            -- purchase row itself is the only change at-or-before)
            (20, TIMESTAMP '2024-01-02 00:00:00', 2, 'purchase', 5.00, '{{}}'),
            (21, TIMESTAMP '2024-01-02 01:00:00', 2, 'view',     6.00, '{{}}'),
            -- user 3: click exactly +1h after a view (counts), and a
            -- second view whose first click is +1h 1s later (does not)
            (30, TIMESTAMP '2024-01-03 00:00:00', 3, 'view',     1.00, '{{}}'),
            (31, TIMESTAMP '2024-01-03 01:00:00', 3, 'click',    1.00, '{{}}'),
            (32, TIMESTAMP '2024-01-03 02:00:00', 3, 'view',     1.00, '{{}}'),
            (33, TIMESTAMP '2024-01-03 03:00:01', 3, 'click',    1.00, '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def _run(spark, name, sf_dir):
    return all_queries()[name].spark(spark, sf_dir)


def test_scd2_same_instant_tie_latest_event_wins(spark, synth_sf):
    rows = {
        (r.user_id, r.version): r
        for r in _run(spark, "cdc_scd2_history", synth_sf).collect()
    }
    # user 1's first version must be event 11 (value 2.00), not event 10
    v1 = rows[(1, 1)]
    assert v1.event_id == 11
    assert v1.value_cents == 200
    # intervals tile: version 1 closes where version 2 opens
    assert v1.valid_to == rows[(1, 2)].valid_from
    # the last version is open-ended and flagged current
    last = rows[(1, max(v for (u, v) in rows if u == 1))]
    assert last.valid_to is None and last.is_current == 1


def test_pit_join_reads_version_valid_at_purchase(spark, synth_sf):
    out = {
        r.event_id: r
        for r in _run(spark, "join_point_in_time", synth_sf).collect()
    }
    # purchase 12 at 01:00 sees the 00:00 change — and the tie-winner 11
    assert out[12].feat_event_id == 11
    assert out[12].feat_cents == 200
    # purchase 14 at 03:00 sees the 02:00 change (event 13), NOT later data
    assert out[14].feat_event_id == 13
    assert out[14].feat_cents == 300
    # user 2's purchase precedes every feature event -> NULL (left join)
    assert out[20].feat_cents is None


def test_windowed_funnel_boundary_inclusive(spark, synth_sf):
    out = {
        r.user_id: (r.n_views, r.n_conv)
        for r in _run(spark, "seq_funnel_windowed", synth_sf).collect()
    }
    # user 3: view 30 converts (click exactly +1h), view 32 does not
    # (first click is +1h1s away)
    assert out[3] == (2, 1)
    # user 1: view 10 has a same-instant click (>= ts counts), view 13's
    # next click never comes
    assert out[1] == (2, 1)


def test_feature_matrix_prior_counts_and_cohort(spark, synth_sf):
    out = {
        r.event_id: r
        for r in _run(spark, "pipeline_feature_matrix", synth_sf).collect()
    }
    # purchase 12 is user 1's third event -> 2 prior; same-day cohort
    assert out[12].n_prior == 2
    assert out[12].cohort_age_days == 0
    # user 2's purchase is their first event
    assert out[20].n_prior == 0


def test_kappa_degenerate_constant_labelers(spark, tmp_path):
    # all docs long + diverse -> both LFs always vote keep -> pe = 1000;
    # the guard must emit kappa=1000 (perfect agreement), not divide by 0
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (0, 'alpha beta gamma delta epsilon zeta', 'en', 's1', 400),
            (1, 'one two three four five six seven', 'en', 's1', 500)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    row = _run(spark, "label_agreement_kappa", str(tmp_path)).collect()[0]
    assert row.pe_permille == 1000
    assert row.kappa_permille == 1000
