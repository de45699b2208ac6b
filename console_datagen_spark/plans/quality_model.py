"""Trained model-based quality classifier (DCLM / fastText-style tier).

The text tier has heuristic filters (text_quality, Gopher gates),
trained-profile lang-ID, and weak-supervision voting — this module adds
the missing standard stage (r11 verdict #6): a DISCRIMINATIVE quality
scorer trained by gradient descent on integer text features, then
applied to a held-out split with an AUC-style ranking gauge.

Setup (the DCLM recipe at fixture scale): DCLM/fastText classifiers
distill "reference-like" into a smooth scorer — positives come from a
curated reference set, and the model learns to rank unseen pages
against it. The synthetic fixture corpus has no organic quality axis
(every lang draws the same word-soup vocabulary — measured: no token
concentrates above 47% in one lang vs a 44% base rate, so lang-vs-rest
is unlearnable), so the reference set is DEFINED the way the text tier
defines quality: a heuristic gate on RAW counts (n_chars >= 250 AND
absolute stopword count >= 2 — 283/500 positive at sf0.01). The
classifier never sees those raw counts; it must recover the gate's
decision surface from PERMILLE-scaled features (stopword ratio,
type-token ratio, mean word length, capped length), a correlated but
different basis — the distillation task is real, and held-out AUC
lands well above chance and below perfection.

Why this is hash-certifiable where textbook logistic regression is not:
every quantity is integer fixed-point (weights in MICRO units, features
in PERMILLE units), and the logistic sigmoid is replaced by the
hard-sigmoid link clamp(1/2 + z/4, 0, 1) — pure rational arithmetic, so
Spark and DuckDB compute bit-identical training trajectories with no
transcendental (exp) cross-engine ULP risk. Divisions that can see
NEGATIVE operands use FLOOR over IEEE double division (exactly
specified, identical in both engines for operands < 2^53 — every
intermediate here is bounded well inside that); nonnegative divisions
use the engines' integer division like the rest of the codebase.

Training is the ``vocab_bpe_merges`` fold pattern: a fixed number of
rounds expressed as chained CTEs over 1-row weight frames — each round
is one scan of the train split (map-side feature compute + one hash
aggregate for the 5 gradient sums) against a CROSS JOIN'd 1-row weight
frame (a broadcast in Spark's physical plan). Zero driver actions, no
Python in the data path. At 100 TB the same plan holds: R rounds = R
scans of the (sampled) train split; the gradient aggregate's width is
the feature count, not the corpus; the only caveat is the raw gradient
sum's BIGINT headroom (~1e9 per row — sample the train split below
~1e9 rows per GD batch, which a quality-classifier fit does anyway).

Reference anchor: this tier is north-star (LLM-pipeline) scope, not
streamshub/console-datagen scope — the reference has no ML surface.
"""

from __future__ import annotations

from ..functions.hashing import bucket_sql_duck, bucket_sql_spark
from .registry import sql_query

DOCS = ("documents",)

_ROUNDS = 4
_LR = 4  # fixed-point learning rate (real lr = 4.0; hard-sigmoid's 1/4
#          slope is folded into it)
_SPLIT_SEED = "qc1"
_TRAIN_LT = 800  # permille bucket < 800 -> train, else val (the
#                  vocab_oov_rate / feat_target_encode split idiom)

_STOPS = "('the','a','of','to')"  # the text-tier stopword set
_W = ("w_stop", "w_ttr", "w_mwl", "w_len", "w_bias")
_X = ("x_stop", "x_ttr", "x_mwl", "x_len", "x_bias")


def _fdiv(a: str, b: str) -> str:
    """FLOOR division via IEEE double — sign-correct and cross-engine
    exact for |operands| < 2^53 (integer '/' is double division in both
    Spark and DuckDB; FLOOR of the identical double is identical)."""
    return f"CAST(FLOOR(({a}) / ({b})) AS BIGINT)"


def _feats_cte(dialect: str) -> str:
    """Per-doc integer features + label + split, one scan of documents.

    All features are PERMILLE-scaled BIGINTs in [0, 1000]; the label is
    the heuristic reference gate on RAW counts (n_chars, absolute
    stopword count) — quantities the feature basis only sees as
    ratios/caps, so the gate must be LEARNED, not copied."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        n = f"size({toks})"
        stop_n = f"size(filter({toks}, w -> w IN {_STOPS}))"
        uniq_n = f"size(array_distinct({toks}))"
        bucket, idiv = bucket_sql_spark("doc_id", seed=_SPLIT_SEED), "DIV"
    else:
        toks = "string_split(text, ' ')"
        n = f"len({toks})"
        stop_n = f"len(list_filter({toks}, w -> w IN {_STOPS}))"
        uniq_n = f"len(list_distinct({toks}))"
        bucket, idiv = bucket_sql_duck("doc_id", seed=_SPLIT_SEED), "//"
    # mean word length x100: token chars = n_chars - (n_tok - 1) spaces
    return (
        "feats AS (SELECT doc_id, "
        f"  CAST(CASE WHEN n_chars >= 250 AND ({stop_n}) >= 2 "
        "    THEN 1 ELSE 0 END AS BIGINT) AS y, "
        f"  CAST(1000 * ({stop_n}) {idiv} ({n}) AS BIGINT) AS x_stop, "
        f"  CAST(1000 * ({uniq_n}) {idiv} ({n}) AS BIGINT) AS x_ttr, "
        f"  LEAST(CAST(100 * (n_chars - ({n}) + 1) {idiv} ({n}) AS BIGINT), "
        "    1000) AS x_mwl, "
        f"  LEAST(CAST(2 * ({n}) AS BIGINT), 1000) AS x_len, "
        "  CAST(1000 AS BIGINT) AS x_bias, "
        f"  CASE WHEN {bucket} < {_TRAIN_LT} THEN 'train' ELSE 'val' END "
        "    AS split "
        "FROM documents)"
    )


def _train_ctes(dialect: str, rounds: int = _ROUNDS) -> str:
    """The GD fold: w0 = 0; each round scores the train split with the
    hard-sigmoid link and applies one full-batch step, all in BIGINT
    micro units. Chained CTEs over 1-row weight frames — the
    vocab_bpe_merges shape."""
    z = " + ".join(f"{w} * {x}" for w, x in zip(_W, _X))
    parts = [
        _feats_cte(dialect),
        ", train AS (SELECT * FROM feats WHERE split = 'train')",
        ", w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS {w}" for w in _W)
        + ")",
    ]
    for k in range(1, rounds + 1):
        prev = f"w{k - 1}"
        # z_micro = (w . x) / 1000 (weights micro x features permille);
        # hard sigmoid p_micro = clamp(500000 + z_micro/4, 0, 1000000)
        p = (
            "LEAST(GREATEST(500000 + "
            + _fdiv(_fdiv(z, "1000"), "4")
            + ", CAST(0 AS BIGINT)), CAST(1000000 AS BIGINT))"
        )
        grads = ", ".join(
            f"CAST(SUM((p - y * 1000000) * {x}) AS BIGINT) AS g_{w}"
            for w, x in zip(_W, _X)
        )
        step = ", ".join(
            f"{w} - " + _fdiv(f"{_LR} * g_{w}", "n * 1000") + f" AS {w}"
            for w in _W
        )
        parts.append(
            f", p{k} AS (SELECT t.y, "
            + ", ".join(f"t.{x}" for x in _X)
            + f", {p} AS p FROM train t CROSS JOIN {prev})"
            f", g{k} AS (SELECT {grads}, COUNT(*) AS n FROM p{k})"
            f", w{k} AS (SELECT {step} FROM {prev} CROSS JOIN g{k})"
        )
    return "".join(parts)


def _train_sql(dialect: str, rounds: int = _ROUNDS) -> str:
    unions = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS round, "
        + ", ".join(f"{w} AS {w}_micro" for w in _W)
        + f" FROM w{k}"
        for k in range(1, rounds + 1)
    )
    return (
        "WITH "
        + _train_ctes(dialect, rounds)
        + f" SELECT * FROM ({unions}) t ORDER BY round"
    )


def _score_sql(dialect: str, rounds: int = _ROUNDS) -> str:
    """Final weights applied to the HELD-OUT split: per-doc fixed-point
    score (z, micro) and hard-sigmoid probability."""
    z = " + ".join(f"{w} * {x}" for w, x in zip(_W, _X))
    p = (
        "LEAST(GREATEST(500000 + "
        + _fdiv(_fdiv(z, "1000"), "4")
        + ", CAST(0 AS BIGINT)), CAST(1000000 AS BIGINT))"
    )
    return (
        "WITH "
        + _train_ctes(dialect, rounds)
        + ", scored AS (SELECT f.doc_id, f.y AS label, "
        + _fdiv(z, "1000")
        + f" AS score_micro, {p} AS p_micro "
        + f"FROM feats f CROSS JOIN w{rounds} WHERE f.split = 'val') "
        "SELECT doc_id, label, score_micro, p_micro FROM scored "
        "ORDER BY doc_id"
    )


def _auc_sql(dialect: str, rounds: int = _ROUNDS) -> str:
    """Held-out rank AUC (Mann-Whitney form), permille: positives'
    rank-sum over the val split under (score, doc_id) order — the
    deterministic tie-break keeps both engines' rankings identical.
    The global ranking windows the VAL SAMPLE only (the gauge's input
    is bounded by the split, not the corpus)."""
    return (
        "WITH "
        + _train_ctes(dialect, rounds)
        + ", scored AS (SELECT f.doc_id, f.y, "
        + _fdiv(" + ".join(f"{w} * {x}" for w, x in zip(_W, _X)), "1000")
        + f" AS z FROM feats f CROSS JOIN w{rounds} WHERE f.split = 'val'), "
        "ranked AS (SELECT y, CAST(ROW_NUMBER() OVER "
        "  (ORDER BY z, doc_id) AS BIGINT) AS r FROM scored) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_val, "
        "CAST(SUM(y) AS BIGINT) AS n_pos, "
        + _fdiv(
            "1000 * (SUM(CASE WHEN y = 1 THEN r ELSE 0 END) "
            "- SUM(y) * (SUM(y) + 1) / 2)",
            "SUM(y) * (COUNT(*) - SUM(y))",
        )
        + " AS auc_permille FROM ranked"
    )


sql_query(
    "quality_classifier_train",
    _train_sql("spark"),
    oracle=_train_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "model", "iterative"),
    doc=f"trained quality classifier (DCLM-style): {_ROUNDS} full-batch GD "
    "rounds of hard-sigmoid logistic regression over integer permille "
    "text features (en slice = reference positives), weights in exact "
    "BIGINT micro units — per-round weight trajectory, bit-identical to "
    "the DuckDB CTE replay",
)

sql_query(
    "quality_classifier_score",
    _score_sql("spark"),
    oracle=_score_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "model", "inference"),
    doc="the trained classifier applied to the held-out val split: "
    "per-doc fixed-point score and hard-sigmoid probability (micro "
    "units) — the inference pass a curation pipeline filters on",
)

sql_query(
    "quality_classifier_auc",
    _auc_sql("spark"),
    oracle=_auc_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "model", "gauge"),
    doc="held-out rank-AUC gauge (Mann-Whitney permille) for the trained "
    "quality classifier — the train/apply loop's quality bar; "
    "deterministic (score, doc_id) tie-break keeps the ranking "
    "engine-identical",
)
