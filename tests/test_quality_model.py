"""Quality-classifier tier invariants beyond the oracle gate.

The oracle tests pin Spark == DuckDB; these pin the MODEL quality bar
the r12 verdict set for the rich feature basis (held-out AUC at the
driver's gate scale must not regress below the 4-feature tier's 957
permille) — computed via DuckDB only, so the check is cheap enough to
run at sf0.01 inside the unit suite."""

from __future__ import annotations

import duckdb
import pytest

from console_datagen_spark.plans import get_query

GATE_SF_DIR = "/root/testdata/sf0.01"


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.mark.parametrize("sf_dir", [GATE_SF_DIR])
def test_rich_auc_meets_r12_bar(sf_dir):
    """Rich-basis held-out AUC >= the 4-feature tier's, at sf0.01
    (measured: 963 vs 957 permille)."""
    rich = _duck(sf_dir, get_query("quality_classifier_rich_auc").oracle)
    base = _duck(sf_dir, get_query("quality_classifier_auc").oracle)
    assert rich[0][2] >= base[0][2] >= 900, (rich, base)
    assert rich[0][2] >= 957, rich


def test_importance_covers_all_features():
    rows = _duck(
        GATE_SF_DIR, get_query("quality_classifier_features").oracle
    )
    feats = {r[0] for r in rows}
    assert feats == {
        "w_stop", "w_ttr", "w_mwl", "w_len", "w_rep", "w_ent", "w_bias",
    }
    # ranks are a permutation 1..7 ordered by |weight| desc
    assert [r[3] for r in rows] == list(range(1, 8))
    imps = [r[2] for r in rows]
    assert imps == sorted(imps, reverse=True)
    assert all(r[2] == abs(r[1]) for r in rows)


def test_by_lang_auc_shape():
    rows = _duck(
        GATE_SF_DIR, get_query("quality_classifier_auc_by_lang").oracle
    )
    assert len(rows) >= 3  # several languages present in the fixture
    for lang, n_val, n_pos, auc in rows:
        assert n_val >= 1 and 0 <= n_pos <= n_val
        # NULL only where the val slice is single-class
        if 0 < n_pos < n_val:
            assert auc is not None and 0 <= auc <= 1000, (lang, auc)
        else:
            assert auc is None
