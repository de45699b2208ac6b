"""Weak supervision + data-quality drift (the labeling layer of a
training-data pipeline).

Before a corpus trains anything, labels come from somewhere — usually a
stack of cheap programmatic labeling functions (LFs) whose votes are
aggregated, audited for agreement, and monitored for drift between
splits. This module certifies the three canonical shapes:

- ``label_model_vote``: Snorkel-style majority vote over three
  deterministic LFs (length rule, lexical-diversity rule, stopword-
  presence rule), each emitting keep(+1)/drop(-1)/abstain(0). The vote,
  unanimity and conflict tallies are pure per-row expressions + one
  hash agg — map-side at any scale.
- ``label_agreement_kappa``: Cohen's kappa between two LFs on the docs
  where both vote, in integer permille (kappa = (po-pe)*1000 DIV
  (1000-pe) over permille observed/expected agreement). The standard
  "are my labelers redundant or complementary" audit.
- ``dq_split_drift``: distribution drift between the train and val
  hash-splits — per-bin permille frequencies of the value histogram,
  L2 distance and max per-bin gap as integers. The monitor that
  catches a broken split or a shifted ingest before training does.

All arithmetic is integer (permille / squared-permille), so every
verdict is hash-exact across engines.
"""

from __future__ import annotations

from ..functions.hashing import bucket_sql_duck, bucket_sql_spark
from .registry import sql_query

DOCS = ("documents",)
EV = ("events",)

# ---- labeling functions ----------------------------------------------------
# votes: +1 keep / -1 drop / 0 abstain; expressions are dialect-portable
# except the token-diversity spelling
_LF_LEN = (
    "CASE WHEN n_chars >= 300 THEN 1 WHEN n_chars < 150 THEN -1 ELSE 0 END"
)
_LF_DIV_SPARK = (
    "CASE WHEN size(array_distinct(split(text, ' '))) * 1000 "
    "          DIV size(split(text, ' ')) >= 650 THEN 1 "
    "     WHEN size(array_distinct(split(text, ' '))) * 1000 "
    "          DIV size(split(text, ' ')) < 450 THEN -1 ELSE 0 END"
)
_LF_DIV_DUCK = (
    "CASE WHEN len(list_distinct(string_split(text, ' '))) * 1000 "
    "          // len(string_split(text, ' ')) >= 650 THEN 1 "
    "     WHEN len(list_distinct(string_split(text, ' '))) * 1000 "
    "          // len(string_split(text, ' ')) < 450 THEN -1 ELSE 0 END"
)
_LF_THE = "CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END"


def _vote_sql(lf_div: str) -> str:
    return (
        f"WITH lf AS (SELECT doc_id, {_LF_LEN} AS v1, {lf_div} AS v2, "
        f"  {_LF_THE} AS v3 FROM documents), "
        "voted AS (SELECT doc_id, v1, v2, v3, v1 + v2 + v3 AS s, "
        "  CASE WHEN v1 + v2 + v3 > 0 THEN 'keep' "
        "       WHEN v1 + v2 + v3 < 0 THEN 'drop' ELSE 'abstain' END AS label, "
        "  CASE WHEN GREATEST(v1, v2, v3) = 1 AND LEAST(v1, v2, v3) = -1 "
        "       THEN 1 ELSE 0 END AS conflict, "
        "  CASE WHEN ABS(v1 + v2 + v3) = ABS(v1) + ABS(v2) + ABS(v3) "
        "       AND v1 + v2 + v3 <> 0 THEN 1 ELSE 0 END AS unanimous "
        "  FROM lf) "
        "SELECT label, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(unanimous) AS BIGINT) AS n_unanimous, "
        "CAST(SUM(conflict) AS BIGINT) AS n_conflict "
        "FROM voted GROUP BY label ORDER BY label"
    )


sql_query(
    "label_model_vote",
    _vote_sql(_LF_DIV_SPARK),
    oracle=_vote_sql(_LF_DIV_DUCK),
    tables=DOCS,
    tags=("supervision", "labeling", "quality"),
    doc="Snorkel-style majority vote over 3 deterministic labeling "
    "functions (length / lexical diversity / stopword presence) with "
    "unanimity and conflict tallies — map-side expressions + one agg",
)


def _kappa_sql(lf_div: str, idiv: str) -> str:
    return (
        f"WITH lf AS (SELECT {_LF_LEN} AS v1, {lf_div} AS v2 FROM documents), "
        "bothv AS (SELECT v1, v2 FROM lf WHERE v1 <> 0 AND v2 <> 0), "
        "m AS (SELECT COUNT(*) AS n, "
        "  SUM(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS agree, "
        "  SUM(CASE WHEN v1 = 1 THEN 1 ELSE 0 END) AS k1, "
        "  SUM(CASE WHEN v2 = 1 THEN 1 ELSE 0 END) AS k2 FROM bothv), "
        # n = 0 (no doc gets a non-zero vote from both LFs) would divide
        # by zero — and Spark's ANSI DIV throws where DuckDB returns
        # NULL, so the guard is a cross-engine contract, not just safety
        "p AS (SELECT n, "
        f"  CASE WHEN n = 0 THEN 0 ELSE agree * 1000 {idiv} n END AS po, "
        "  CASE WHEN n = 0 THEN 0 ELSE "
        f"    (k1 * k2 + (n - k1) * (n - k2)) * 1000 {idiv} (n * n) END AS pe "
        "  FROM m) "
        "SELECT CAST(n AS BIGINT) AS n_both_vote, "
        "CAST(po AS BIGINT) AS po_permille, CAST(pe AS BIGINT) AS pe_permille, "
        # pe = 1000 (labelers with constant marginals) makes kappa's
        # denominator zero; the convention here is 1000 on perfect
        # agreement, else 0 — guarded so degenerate data can't divide by 0
        "CAST(CASE WHEN pe = 1000 THEN "
        "  CASE WHEN po = 1000 THEN 1000 ELSE 0 END "
        f"ELSE (po - pe) * 1000 {idiv} (1000 - pe) END AS BIGINT) "
        "  AS kappa_permille "
        "FROM p"
    )


sql_query(
    "label_agreement_kappa",
    _kappa_sql(_LF_DIV_SPARK, "DIV"),
    oracle=_kappa_sql(_LF_DIV_DUCK, "//"),
    tables=DOCS,
    tags=("supervision", "labeling", "agreement"),
    doc="Cohen's kappa (integer permille) between the length and "
    "lexical-diversity labeling functions on jointly-voting docs — the "
    "labeler redundancy audit",
)


# ---- split drift monitor ---------------------------------------------------
# same (seed, key) as feat_target_encode's split so the two queries
# describe the SAME train/val boundary
_DRIFT_BUCKET_SPARK = bucket_sql_spark("event_id")
_DRIFT_BUCKET_DUCK = bucket_sql_duck("event_id")


def _drift_sql(bucket: str, idiv: str) -> str:
    return (
        "WITH tagged AS (SELECT "
        f"  LEAST(CAST(FLOOR(value * 100) AS BIGINT) {idiv} 2000, 15) AS bin, "
        f"  CASE WHEN {bucket} < 800 THEN 'train' ELSE 'val' END AS split "
        "  FROM events), "
        "tot AS (SELECT "
        "  SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS na, "
        "  SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS nb FROM tagged), "
        "hist AS (SELECT bin, "
        "  SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ca, "
        "  SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS cb "
        "  FROM tagged GROUP BY bin), "
        # empty-split guard: ANSI DIV 0 throws on the Spark side
        "freq AS (SELECT bin, "
        f"  CASE WHEN na = 0 THEN 0 ELSE ca * 1000 {idiv} na END AS pa, "
        f"  CASE WHEN nb = 0 THEN 0 ELSE cb * 1000 {idiv} nb END AS pb "
        "  FROM hist CROSS JOIN tot) "
        "SELECT (SELECT CAST(na AS BIGINT) FROM tot) AS n_train, "
        "(SELECT CAST(nb AS BIGINT) FROM tot) AS n_val, "
        "CAST(SUM((pa - pb) * (pa - pb)) AS BIGINT) AS l2_drift, "
        "CAST(MAX(ABS(pa - pb)) AS BIGINT) AS max_bin_gap_permille "
        "FROM freq ORDER BY n_train"
    )


sql_query(
    "dq_split_drift",
    _drift_sql(_DRIFT_BUCKET_SPARK, "DIV"),
    oracle=_drift_sql(_DRIFT_BUCKET_DUCK, "//"),
    tables=EV,
    tags=("quality", "drift", "sampling"),
    doc="train/val distribution drift over a 16-bin value histogram: "
    "per-bin permille frequencies, squared-L2 distance and max bin gap "
    "— the split-health monitor, integers end-to-end",
)


# ---- statistical audit battery ---------------------------------------------
# Three classic data-forensics gauges, all in exact integer arithmetic:
#
# - Benford first-digit audit: natural multi-scale quantities follow
#   log10(1+1/d); fabricated or truncated feeds don't. Expected permille
#   per digit is a precomputed integer table; the deviation statistic is
#   the same squared-permille L2 the drift monitor uses.
# - Cramér's V: association between two categoricals (event_type x
#   value quartile-bin) from the contingency table — chi-square scaled
#   to V² permille with every division floored last, so the verdict is
#   hash-exact. The "is this feature redundant with the label" audit.
# - lag-1 autocorrelation of the daily event count, as r² permille via
#   the cross-multiplied Pearson formula (no sqrt, no floats): the
#   time-series health check that catches synthetic/periodic feeds.

_BENFORD_PERMILLE = (301, 176, 124, 96, 79, 66, 57, 51, 45)  # digits 1..9


def _benford_sql(idiv: str) -> str:
    expected = " UNION ALL ".join(
        f"SELECT {d + 1} AS digit, {p} AS ep"
        for d, p in enumerate(_BENFORD_PERMILLE)
    )
    return (
        "WITH iv AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v "
        "  FROM events WHERE value >= 0.01), "
        "fd AS (SELECT CAST(substr(CAST(v AS STRING), 1, 1) AS BIGINT) "
        "  AS digit FROM iv), "
        "obs AS (SELECT digit, COUNT(*) AS c FROM fd GROUP BY digit), "
        "tot AS (SELECT SUM(c) AS n FROM obs), "
        f"exp AS ({expected}) "
        "SELECT e.digit, CAST(e.ep AS BIGINT) AS benford_permille, "
        f"CAST(COALESCE(o.c, 0) * 1000 {idiv} t.n AS BIGINT) "
        "  AS observed_permille, "
        f"CAST(ABS(COALESCE(o.c, 0) * 1000 {idiv} t.n - e.ep) AS BIGINT) "
        "  AS abs_gap_permille "
        "FROM exp e LEFT JOIN obs o ON e.digit = o.digit "
        "CROSS JOIN tot t ORDER BY e.digit"
    )


sql_query(
    "dq_benford_digits",
    _benford_sql("DIV"),
    oracle=_benford_sql("//").replace("CAST(v AS STRING)", "CAST(v AS VARCHAR)"),
    tables=EV,
    tags=("quality", "forensics", "benford"),
    doc="Benford first-digit audit of value cents: observed vs expected "
    "permille per leading digit + absolute gaps — the fabricated-feed "
    "tripwire, integer arithmetic end-to-end",
)


def _cramers_sql(idiv: str) -> str:
    # value bin = quartile by fixed thresholds on cents (domain-bound,
    # portable); chi2_scaled = sum over cells of
    # (observed*N - rowsum*colsum)^2 // (rowsum*colsum) — i.e. N^2 * chi2
    # with integer floors; V2 permille = chi2_scaled * 1000 // (N^2 * N *
    # min(r-1, c-1)).
    return (
        "WITH t AS (SELECT event_type AS a, "
        "  LEAST(CAST(FLOOR(value * 100) AS BIGINT) {d} 2500, 3) AS b "
        "  FROM events), "
        "cell AS (SELECT a, b, COUNT(*) AS o FROM t GROUP BY a, b), "
        "rs AS (SELECT a, SUM(o) AS ra FROM cell GROUP BY a), "
        "cs AS (SELECT b, SUM(o) AS cb FROM cell GROUP BY b), "
        "n AS (SELECT SUM(o) AS n FROM cell), "
        # full r x c grid (CROSS JOIN rs/cs, LEFT JOIN cell): a zero-count
        # cell still contributes its expected term (ra*cb)^2 // (ra*cb) =
        # ra*cb to the chi-square sum — summing only non-empty cells
        # understates chi2 whenever any cell is empty
        "chi AS (SELECT SUM((COALESCE(c.o, 0) * n.n - r.ra * s.cb) * "
        "  (COALESCE(c.o, 0) * n.n - r.ra * s.cb) "
        "  {d} (r.ra * s.cb)) AS chi2s, MAX(n.n) AS n, "
        "  COUNT(DISTINCT r.a) AS nr, COUNT(DISTINCT s.b) AS nc "
        "  FROM rs r CROSS JOIN cs s "
        "  LEFT JOIN cell c ON c.a = r.a AND c.b = s.b "
        "  CROSS JOIN n) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_rows_cat, "
        "CAST(nc AS BIGINT) AS n_cols_cat, "
        "CAST(chi2s {d} (n * n) AS BIGINT) AS chi2_floor, "
        "CAST(chi2s * 1000 {d} (n * n * n * "
        "  (CASE WHEN nr < nc THEN nr ELSE nc END - 1)) AS BIGINT) "
        "  AS cramers_v2_permille "
        "FROM chi ORDER BY n"
    ).format(d=idiv)


sql_query(
    "dq_association_cramers",
    _cramers_sql("DIV"),
    oracle=_cramers_sql("//"),
    tables=EV,
    tags=("quality", "association", "profiling"),
    doc="Cramér's V² (permille, floored-integer chi-square) between "
    "event_type and the value quartile bin — the categorical-association "
    "audit that flags redundant or leaking features",
)


def _autocorr_sql(idiv: str) -> str:
    # x = day's count, y = next day's count (lead over the daily series);
    # r2 permille = (n*Sxy - Sx*Sy)^2 * 1000 // ((n*Sxx - Sx^2) *
    # (n*Syy - Sy^2)) — Pearson squared without sqrt, integers only.
    return (
        "WITH daily AS (SELECT CAST(ts AS DATE) AS day, "
        "  COUNT(*) AS c FROM events GROUP BY CAST(ts AS DATE)), "
        "lagd AS (SELECT day, c AS x, "
        "  LEAD(c) OVER (ORDER BY day) AS y FROM daily), "
        "pairs AS (SELECT x, y FROM lagd WHERE y IS NOT NULL), "
        "s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
        "  SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy "
        "  FROM pairs) "
        "SELECT CAST(n AS BIGINT) AS n_pairs, "
        "CAST(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 "
        "  THEN 0 ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000 "
        f"  {idiv} ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS BIGINT) "
        "  AS r2_permille, "
        "CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END AS INT) "
        "  AS sign "
        "FROM s"
    )


sql_query(
    "seq_daily_autocorr",
    _autocorr_sql("DIV"),
    oracle=_autocorr_sql("//"),
    tables=EV,
    tags=("sequence", "quality", "timeseries"),
    doc="lag-1 autocorrelation of the daily event count as signed r² "
    "permille (cross-multiplied Pearson, no sqrt/floats) — the "
    "periodic/synthetic-feed detector over the ingest time series",
)
