"""Log-domain corpus analytics: token entropy + PMI collocations.

Two standard text-pipeline measurements that were previously locked out
of the hash-exact oracle contract because they need logarithms — now
expressed on :mod:`..functions.intlog`'s deterministic fixed-point
binary log (pure BIGINT on both engines):

- **Per-document token entropy** — the Shannon entropy of a doc's
  unigram distribution, a classic quality/diversity feature (low
  entropy = repetitive or boilerplate text; used alongside repetition
  ratios in web-scale filters). Algebra avoids per-term division:
  H = -sum (tf/dl) log(tf/dl) = log2(dl) - (sum tf*log2(tf)) / dl,
  so one lg per DISTINCT count value suffices and the only division is
  the final integer DIV by dl.

- **PMI collocations** — pointwise mutual information over adjacent
  word pairs (Church & Hanks '90), the standard phrase/collocation
  miner feeding tokenizer vocab decisions. PMI factors into a SUM of
  logs of individual counts: lg(c2) + 2*lg(U) - lg(Nbg) - lg(c1x) -
  lg(c1y), so every intlog argument is a bare count (never a product
  of counts) and the fixed-point error is a bounded sum of per-term
  truncations — deterministic and identical across engines, which is
  all the gate needs. Bare counts can still be corpus TOTALS (U, Nbg
  here reach ~2e13 at 100 TB); intlog handles any BIGINT argument
  exactly in that regime via its min(e,20) mantissa identity — see
  :mod:`..functions.intlog` for the domain analysis.

Both queries group on raw word strings (no hashing needed — the words
themselves are the keys), so the corpus-sized work is one split+explode
plus hash aggregates; the lg chains run over the DISTINCT COUNT VALUES
frame, which is tiny (<= max count rows) and broadcasts into the final
join. No cartesian, no floats, no transcendentals.

Reference anchor: north-star (LLM-pipeline text analysis) scope.
"""

from __future__ import annotations

from ..functions.hashing import bucket_sql_duck, bucket_sql_spark
from ..functions.intlog import log2_fp_ctes
from .registry import sql_query

_PMI_MIN_C2 = 5  # collocation min support
_PMI_TOPK = 20


def _entropy_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = (
            "SELECT doc_id, explode(split(text, ' ')) AS w FROM documents"
        )
    else:
        toks = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
            "FROM documents"
        )
    return (
        f"WITH toks AS (SELECT doc_id, w, COUNT(*) AS tf FROM ({toks}) r "
        "GROUP BY doc_id, w), "
        "dl AS (SELECT doc_id, SUM(tf) AS dl FROM toks GROUP BY doc_id), "
        # one lg per distinct count value (tf values union dl values)
        "vals AS (SELECT DISTINCT tf AS v FROM toks "
        "UNION SELECT DISTINCT dl FROM dl), "
        + log2_fp_ctes("vals", "v", "v", "1", dialect, out="lg")
        + ", "
        "tl AS (SELECT t.doc_id, SUM(t.tf * g.lg_fp) AS s "
        "FROM toks t JOIN lg g ON g.v = t.tf GROUP BY t.doc_id) "
        "SELECT d.doc_id, CAST(d.dl AS BIGINT) AS n_tokens, "
        f"CAST(gd.lg_fp - (tl.s {idiv} d.dl) AS BIGINT) AS entropy_fp "
        "FROM dl d JOIN lg gd ON gd.v = d.dl "
        "JOIN tl ON tl.doc_id = d.doc_id "
        "ORDER BY d.doc_id"
    )


sql_query(
    "text_token_entropy",
    _entropy_sql("spark"),
    oracle=_entropy_sql("duck"),
    tables=("documents",),
    tags=("text", "quality", "entropy", "infotheory"),
    doc="per-doc Shannon entropy of the unigram distribution in 2^-10-"
    "bit fixed point (H = lg dl - (sum tf*lg tf) DIV dl): the low-"
    "entropy-is-boilerplate quality feature, hash-exact via the integer "
    "binary log — one lg per DISTINCT count value, broadcast back",
)


def _pmi_sql(dialect: str) -> str:
    if dialect == "spark":
        toks = (
            "SELECT doc_id, explode(split(text, ' ')) AS w FROM documents"
        )
        bg = (
            "SELECT explode(transform(sequence(1, size(l) - 1), "
            "i -> struct(element_at(l, i) AS w1, element_at(l, i + 1) "
            "AS w2))) AS p "
            "FROM (SELECT split(text, ' ') AS l FROM documents) d "
            "WHERE size(l) >= 2"
        )
        pair_cols = "p.w1 AS w1, p.w2 AS w2"
    else:
        toks = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
            "FROM documents"
        )
        bg = (
            "SELECT unnest(list_transform(generate_series(1, len(l) - 1), "
            "i -> {'w1': l[i], 'w2': l[i+1]})) AS p "
            "FROM (SELECT string_split(text, ' ') AS l FROM documents) d "
            "WHERE len(l) >= 2"
        )
        pair_cols = "p.w1 AS w1, p.w2 AS w2"
    return (
        f"WITH uni AS (SELECT w, COUNT(*) AS c1 FROM ({toks}) t GROUP BY w), "
        "u AS (SELECT SUM(c1) AS u FROM uni), "
        f"pairs AS (SELECT {pair_cols} FROM ({bg}) b), "
        "big AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2 "
        f"HAVING COUNT(*) >= {_PMI_MIN_C2}), "
        "nbg AS (SELECT COUNT(*) AS nbg FROM pairs), "
        # one lg per distinct count value across c2, c1, U, Nbg
        "vals AS (SELECT DISTINCT c2 AS v FROM big "
        "UNION SELECT DISTINCT c1 FROM uni "
        "UNION SELECT u FROM u UNION SELECT nbg FROM nbg), "
        + log2_fp_ctes("vals", "v", "v", "1", dialect, out="lg")
        + ", "
        "scored AS (SELECT b.w1, b.w2, b.c2, "
        "CAST(g2.lg_fp + 2 * gu.lg_fp - gn.lg_fp - gx.lg_fp - gy.lg_fp "
        "AS BIGINT) AS pmi_fp "
        "FROM big b "
        "JOIN uni ux ON ux.w = b.w1 JOIN uni uy ON uy.w = b.w2 "
        "JOIN lg g2 ON g2.v = b.c2 "
        "JOIN lg gx ON gx.v = ux.c1 JOIN lg gy ON gy.v = uy.c1 "
        "CROSS JOIN u JOIN lg gu ON gu.v = u.u "
        "CROSS JOIN nbg JOIN lg gn ON gn.v = nbg.nbg), "
        # distributed top-k first (TakeOrderedAndProject), THEN rank the
        # k survivors — a global ROW_NUMBER window would drag the whole
        # scored frame to one partition
        "sel AS (SELECT w1, w2, c2, pmi_fp FROM scored "
        f"ORDER BY pmi_fp DESC, w1, w2 LIMIT {_PMI_TOPK}) "
        "SELECT w1, w2, CAST(c2 AS BIGINT) AS n_pair, pmi_fp, "
        "CAST(ROW_NUMBER() OVER (ORDER BY pmi_fp DESC, w1, w2) AS INT) "
        "AS rnk FROM sel ORDER BY rnk"
    )


sql_query(
    "text_pmi_collocations",
    _pmi_sql("spark"),
    oracle=_pmi_sql("duck"),
    tables=("documents",),
    tags=("text", "collocations", "pmi", "infotheory", "topk"),
    doc="top-20 adjacent-word collocations by fixed-point PMI "
    "(lg c2 + 2*lg U - lg Nbg - lg c1x - lg c1y, min support 5): the "
    "Church & Hanks phrase miner feeding tokenizer vocab decisions, "
    "hash-exact because PMI factors into logs of bare counts",
)


def _xent_sql(dialect: str) -> str:
    """Per-doc cross-entropy against the corpus unigram LM.

    The CCNet perplexity filter's exact-arithmetic analog: documents
    whose token distribution diverges from the corpus LM score high
    (rare-token soup), repetitive in-distribution docs score low.
    H(doc, corpus) = -sum_w (tf_w/dl) lg(c_w/U)
                   = (sum_w tf_w * (lg U - lg c_w)) DIV dl
    — every log argument is a bare count, one lg per DISTINCT value.
    The existing ccnet tier buckets on count proxies; this is the real
    log-domain quantity, hash-exact.
    """
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = "SELECT doc_id, explode(split(text, ' ')) AS w FROM documents"
    else:
        toks = (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
            "FROM documents"
        )
    return (
        f"WITH toks AS (SELECT doc_id, w, COUNT(*) AS tf FROM ({toks}) r "
        "GROUP BY doc_id, w), "
        "uni AS (SELECT w, SUM(tf) AS c FROM toks GROUP BY w), "
        "u AS (SELECT SUM(c) AS u FROM uni), "
        "dl AS (SELECT doc_id, SUM(tf) AS dl FROM toks GROUP BY doc_id), "
        "vals AS (SELECT DISTINCT c AS v FROM uni "
        "UNION SELECT u FROM u), "
        + log2_fp_ctes("vals", "v", "v", "1", dialect, out="lg")
        + ", "
        "contrib AS (SELECT t.doc_id, "
        "SUM(t.tf * (gu.lg_fp - gc.lg_fp)) AS s "
        "FROM toks t "
        "JOIN uni n ON n.w = t.w "
        "JOIN lg gc ON gc.v = n.c "
        "CROSS JOIN u JOIN lg gu ON gu.v = u.u "
        "GROUP BY t.doc_id) "
        "SELECT c.doc_id, CAST(d.dl AS BIGINT) AS n_tokens, "
        f"CAST(c.s {idiv} d.dl AS BIGINT) AS xent_fp "
        "FROM contrib c JOIN dl d ON d.doc_id = c.doc_id "
        "ORDER BY c.doc_id"
    )


sql_query(
    "text_cross_entropy",
    _xent_sql("spark"),
    oracle=_xent_sql("duck"),
    tables=("documents",),
    tags=("text", "quality", "perplexity", "infotheory"),
    doc="per-doc cross-entropy vs the corpus unigram LM in 2^-10-bit "
    "fixed point ((sum tf*(lg U - lg c_w)) DIV dl): the exact "
    "log-domain CCNet perplexity-filter quantity the count-proxy ccnet "
    "tier approximates, hash-exact via the integer binary log",
)


def _kl_sql(dialect: str) -> str:
    """KL(train || val) over unigram distributions, per language.

    The log-domain upgrade of dq_split_drift's count proxies: the
    actual divergence the drift literature defines, exact because
    KL = sum_w p_w (lg p_w - lg q_w) expands into logs of bare counts
    (add-1 smoothed on the val side so unseen tokens stay finite):
    KL_fp = (sum_w c_w*((lg c_w - lg U) - (lg (d_w+1) - lg (V+S))))
            DIV U
    with c/U train counts+total, d/V val counts+total, S the smoothing
    mass (train vocab size). Split = the canonical hash-bucket idiom.
    """
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        toks = (
            "SELECT lang, explode(split(text, ' ')) AS w, "
            + bucket_sql_spark("doc_id", "kl1", 10)
            + " AS b FROM documents"
        )
    else:
        toks = (
            "SELECT lang, unnest(string_split(text, ' ')) AS w, "
            + bucket_sql_duck("doc_id", "kl1", 10)
            + " AS b FROM documents"
        )
    return (
        f"WITH toks AS ({toks}), "
        "tr AS (SELECT lang, w, COUNT(*) AS c FROM toks WHERE b < 8 "
        "GROUP BY lang, w), "
        "va AS (SELECT lang, w, COUNT(*) AS d FROM toks WHERE b >= 8 "
        "GROUP BY lang, w), "
        "ut AS (SELECT lang, SUM(c) AS u, COUNT(*) AS s FROM tr "
        "GROUP BY lang), "
        "uv AS (SELECT lang, SUM(d) AS v FROM va GROUP BY lang), "
        # one lg per distinct bare-count value across all four families.
        # The literal 1 must always be present: train-only words smooth to
        # d+1 = 1 on the val side, and the inner join on lg would silently
        # drop them (the largest-divergence terms) if no train count
        # happened to equal 1 — both engines agreed, so the hash gate
        # could not catch it (ADVICE r12).
        "vals AS (SELECT DISTINCT c AS vv FROM tr "
        "UNION SELECT DISTINCT d + 1 FROM va "
        "UNION SELECT 1 "
        "UNION SELECT u FROM ut UNION SELECT v + s FROM uv "
        "JOIN ut ON ut.lang = uv.lang), "
        + log2_fp_ctes("vals", "vv", "vv", "1", dialect, out="lg")
        + ", "
        "terms AS (SELECT tr.lang, "
        "SUM(tr.c * ((gc.lg_fp - gu.lg_fp) - (gd.lg_fp - gs.lg_fp))) AS s "
        "FROM tr "
        "LEFT JOIN va ON va.lang = tr.lang AND va.w = tr.w "
        "JOIN ut ON ut.lang = tr.lang "
        "JOIN uv ON uv.lang = tr.lang "
        "JOIN lg gc ON gc.vv = tr.c "
        "JOIN lg gd ON gd.vv = COALESCE(va.d, 0) + 1 "
        "JOIN lg gu ON gu.vv = ut.u "
        "JOIN lg gs ON gs.vv = uv.v + ut.s "
        "GROUP BY tr.lang) "
        "SELECT t.lang, CAST(u.u AS BIGINT) AS n_train_tokens, "
        f"CAST(t.s {idiv} u.u AS BIGINT) AS kl_fp "
        "FROM terms t JOIN ut u ON u.lang = t.lang ORDER BY t.lang"
    )


sql_query(
    "dq_kl_split_drift",
    _kl_sql("spark"),
    oracle=_kl_sql("duck"),
    tables=("documents",),
    tags=("dq", "drift", "kl", "infotheory"),
    doc="per-language KL(train||val) of unigram distributions in "
    "2^-10-bit fixed point (80/20 hash split, add-1 smoothed val side): "
    "the actual divergence dq_split_drift's count proxies approximate, "
    "hash-exact via logs of bare counts",
)
