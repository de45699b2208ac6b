"""RAG-shape chunk retrieval — the full text→vector→ANN loop in-engine.

The retrieval-augmented-generation data path: chunk the corpus, featurize
every chunk, index, retrieve top-k chunks per query. Here the encoder is
a hashing vectorizer (dim j = count of chunk tokens whose 60-bit hash
lands in bucket j — the classic feature-hashing trick), so the ENTIRE
pipeline is deterministic integers and the DuckDB oracle hash-checks it
end-to-end; a real deployment swaps the featurizer for an embedding UDF
(operators/multimodal.py shows the Arrow-batched shape) and everything
downstream composes unchanged.

Scale shape: chunking + featurization are pure map-side expressions
inside the scan stage (zero shuffles); candidate generation is an
equi-join on the DOMINANT feature dim (each side's argmax bucket — the
1-probe analog of IVF's nearest-centroid cut, recall bounded to
same-dominant-dim chunks by design); ranking is an exact integer dot
product over candidates only. No cartesian anywhere.
"""

from __future__ import annotations

from ..functions.hashing import token_id_sql_duck, token_id_sql_spark
from .registry import sql_query

_W = 64  # tokens per chunk (non-overlapping)
_DIMS = 16
_K = 3
_NQ = 5  # docs whose chunks act as queries


def _rag_sql(dialect: str) -> str:
    if dialect == "spark":
        tid = token_id_sql_spark("t")
        # the fixture corpus is one parquet file -> one input partition;
        # without the hint the whole md5-featurization chain runs on a
        # single core (measured 7 s -> 1.2 s at sf0.1 on local[32]). At
        # real scale the scan has many splits and the hint is harmless.
        hint = "/*+ REPARTITION(__PAR__) */ "
        split_ = "split(text, ' ')"
        nchunks = f"CAST(ceil(size(toks) / CAST({_W} AS DOUBLE)) AS INT)"
        chunk = f"slice(toks, (i - 1) * {_W} + 1, {_W})"
        seq = "explode(sequence(1, nc)) AS i"
        vec = (
            f"transform(sequence(0, {_DIMS - 1}), "
            f"j -> size(filter(tids, t -> t % {_DIMS} = j)))"
        )
        tids = f"transform(ctoks, t -> {tid})"
        dot = (
            "aggregate(zip_with(qv, cv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        argmax = "array_position(vec, array_max(vec)) - 1"
    else:
        tid = token_id_sql_duck("t")
        split_ = "string_split(text, ' ')"
        nchunks = f"CAST(ceil(len(toks) / CAST({_W} AS DOUBLE)) AS INT)"
        chunk = f"toks[(i - 1) * {_W} + 1 : i * {_W}]"
        seq = "unnest(generate_series(1, nc)) AS i"
        vec = (
            f"list_transform(generate_series(0, {_DIMS - 1}), "
            f"j -> len(list_filter(tids, t -> t % {_DIMS} = j)))"
        )
        tids = f"list_transform(ctoks, t -> {tid})"
        dot = "CAST(list_inner_product(qv::DOUBLE[], cv::DOUBLE[]) AS BIGINT)"
        argmax = "list_position(vec, list_aggregate(vec, 'max')) - 1"
        hint = ""
    # the chunk slice: Spark's slice(arr, start, len) vs DuckDB arr[a:b]
    common = (
        f"WITH d AS (SELECT {hint}doc_id, {split_} AS toks FROM documents), "
        f"dn AS (SELECT doc_id, toks, {nchunks} AS nc FROM d), "
        f"c0 AS (SELECT doc_id, i, {chunk} AS ctoks FROM "
        f"       (SELECT doc_id, toks, nc, {seq} FROM dn) e), "
        f"c1 AS (SELECT doc_id * 1000 + i AS chunk_id, doc_id, "
        f"       {tids} AS tids FROM c0), "
        f"c2 AS (SELECT chunk_id, doc_id, {vec} AS vec FROM "
        "       (SELECT chunk_id, doc_id, tids FROM c1) x), "
        f"feat AS (SELECT chunk_id, doc_id, vec, {argmax} AS dom FROM c2), "
        f"q AS (SELECT chunk_id AS qchunk, doc_id AS qdoc, vec AS qv, dom "
        f"      FROM feat WHERE doc_id < {_NQ}), "
        "cand AS (SELECT q.qchunk, f.chunk_id, q.qv, f.vec AS cv "
        "         FROM q JOIN feat f ON q.dom = f.dom AND q.qdoc <> f.doc_id), "
        f"scored AS (SELECT qchunk, chunk_id, {dot} AS dp FROM cand), "
        "r AS (SELECT qchunk, chunk_id, dp, "
        "      ROW_NUMBER() OVER (PARTITION BY qchunk "
        "                         ORDER BY dp DESC, chunk_id) AS rnk "
        "      FROM scored) "
        f"SELECT qchunk, chunk_id, dp, CAST(rnk AS INT) AS rnk FROM r "
        f"WHERE rnk <= {_K} ORDER BY qchunk, rnk"
    )
    return common


sql_query(
    "rag_chunk_topk",
    _rag_sql("spark"),
    oracle=_rag_sql("duck"),
    tables=("documents",),
    tags=("rag", "similarity", "chunking", "topk"),
    doc="RAG chunk retrieval end-to-end: 64-token chunks, 16-dim hashing-"
    "vectorizer features (map-side, zero shuffle), dominant-dim bucket "
    "candidates (1-probe IVF analog), exact integer-dot top-3 per query "
    "chunk — hash-exact across engines",
)


# ---- hybrid retrieval with reciprocal-rank fusion --------------------------
# Production RAG retrieval is hybrid: a lexical ranker (token overlap /
# BM25 family) and a vector ranker disagree in useful ways, and
# reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09) combines them
# using ONLY ranks — no score calibration across modalities. Fused score
# = sum over rankers of 1/(60 + rank), here scaled to integers
# (1000000 DIV (60 + rank)) so the fusion is hash-exact. The doc and
# embedding fixtures share the same id space (doc_id == vec_id), which
# is exactly the id discipline a real corpus needs for hybrid search.
# Scale shape: lexical candidates come from a distinct-token equi-join
# (query side is _NQH docs — broadcast); vector candidates from the
# same broadcast-query cosine kernel as sim_topk_brute; the fusion
# itself is a full-outer join of two k-row-per-query rank lists.

_NQH = 10  # query docs
_HK = 20  # per-ranker candidate depth
_RRF_K = 60
_HTOP = 5


def _hybrid_sql(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"
        tid = token_id_sql_spark("t")
        toks = (
            "SELECT doc_id, tid FROM (SELECT doc_id, "
            f"explode(array_distinct(transform(split(text, ' '), t -> {tid}))) "
            "AS tid FROM documents) x"
        )
        vcast = "transform(embedding, x -> CAST(x AS DOUBLE))"

        def dot(a: str, b: str) -> str:
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
    else:
        idiv = "//"
        tid = token_id_sql_duck("t")
        toks = (
            "SELECT doc_id, unnest(list_distinct(list_transform("
            f"string_split(text, ' '), t -> {tid}))) AS tid FROM documents"
        )
        vcast = "embedding::DOUBLE[]"

        def dot(a: str, b: str) -> str:
            return f"list_inner_product({a}, {b})"
    return (
        f"WITH toks AS ({toks}), "
        f"qt AS (SELECT doc_id AS qid, tid FROM toks WHERE doc_id < {_NQH}), "
        "ov AS (SELECT qt.qid, t.doc_id AS did, COUNT(*) AS shared "
        "       FROM qt JOIN toks t ON qt.tid = t.tid AND t.doc_id <> qt.qid "
        "       GROUP BY qt.qid, t.doc_id), "
        "kw AS (SELECT qid, did, rnk FROM ("
        "  SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid "
        "         ORDER BY shared DESC, did) AS rnk FROM ov) x "
        f"  WHERE rnk <= {_HK}), "
        f"ev AS (SELECT vec_id, {vcast} AS v FROM embeddings), "
        f"en AS (SELECT vec_id, v, sqrt({dot('v', 'v')}) AS nrm FROM ev), "
        f"eq AS (SELECT vec_id AS qid, v AS qv0, nrm AS qn FROM en "
        f"       WHERE vec_id < {_NQH}), "
        f"vs AS (SELECT eq.qid, c.vec_id AS did, "
        f"       {dot('eq.qv0', 'c.v')} / (eq.qn * c.nrm) "
        "       AS cos FROM en c, eq WHERE c.vec_id <> eq.qid), "
        "vr AS (SELECT qid, did, rnk FROM ("
        "  SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid "
        "         ORDER BY cos DESC, did) AS rnk FROM vs) x "
        f"  WHERE rnk <= {_HK}), "
        "fused AS (SELECT COALESCE(k.qid, v.qid) AS qid, "
        "  COALESCE(k.did, v.did) AS did, "
        f"  COALESCE(1000000 {idiv} ({_RRF_K} + k.rnk), 0) "
        f"  + COALESCE(1000000 {idiv} ({_RRF_K} + v.rnk), 0) AS rrf "
        "  FROM kw k FULL OUTER JOIN vr v "
        "  ON k.qid = v.qid AND k.did = v.did) "
        "SELECT qid AS query_id, did AS doc_id, "
        "CAST(rrf AS BIGINT) AS rrf_score, CAST(rnk AS INT) AS rnk FROM ("
        "  SELECT qid, did, rrf, ROW_NUMBER() OVER (PARTITION BY qid "
        "         ORDER BY rrf DESC, did) AS rnk FROM fused) x "
        f"WHERE rnk <= {_HTOP} ORDER BY query_id, rnk"
    )


sql_query(
    "rag_hybrid_rrf",
    _hybrid_sql("spark"),
    oracle=_hybrid_sql("duck"),
    tables=("documents", "embeddings"),
    tags=("rag", "similarity", "hybrid", "topk"),
    doc="hybrid retrieval: lexical (distinct-token overlap) top-20 + "
    "vector (cosine) top-20 fused by integer reciprocal-rank fusion "
    "(1000000 DIV (60+rank)), top-5 per query — rank-only fusion needs "
    "no cross-modality score calibration and is hash-exact",
)


# ---- MMR diversity re-ranking ----------------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein '98): re-rank a
# relevance shortlist so the k results are relevant AND mutually
# diverse — the answer to near-duplicate result lists in RAG retrieval.
# Greedy selection is inherently sequential, so the k=3 rounds are
# expressed as chained CTEs exactly like the BPE merge rounds: each
# round is a windowed argmax over (lambda*rel - (1-lambda)*max_sim_to_
# selected), everything in floored-integer micro-cosine units so both
# engines pick identical winners. Costs are shortlist-bounded:
# pairwise sims only among the top-SHORT of each query (O(q*SHORT^2)),
# never corpus-wide.

_MMR_Q = 5       # query vectors
_MMR_SHORT = 8   # relevance shortlist per query
_MMR_K = 3       # diverse picks
_MMR_LAMBDA = 700  # relevance weight, permille


def _mmr_cte_body(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"
        vcast = "transform(embedding, x -> CAST(x AS DOUBLE))"

        def dot(a: str, b: str) -> str:
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
    else:
        idiv = "//"
        vcast = "embedding::DOUBLE[]"

        def dot(a: str, b: str) -> str:
            return f"list_inner_product({a}, {b})"

    lam, ilam = _MMR_LAMBDA, 1000 - _MMR_LAMBDA
    # selection rounds: sel1 = argmax rel; each later round maximizes
    # lambda*rel - (1-lambda)*max_sim over the selected set so far
    rounds = []
    prev_sel = "sel1"
    rounds.append(
        "sel1 AS (SELECT qid, did AS s1 FROM ("
        "  SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid "
        "  ORDER BY rel DESC, did) AS rn FROM shortlist) t WHERE rn = 1)"
    )
    for r in range(2, _MMR_K + 1):
        sel_cols = ", ".join(f"s{j}" for j in range(1, r))
        not_in = " AND ".join(f"sl.did <> p.s{j}" for j in range(1, r))
        max_pen = (
            f"GREATEST({', '.join(f'pen{j}.sim' for j in range(1, r))})"
            if r > 2
            else "pen1.sim"
        )
        pens = " ".join(
            f"JOIN sims pen{j} ON pen{j}.qid = sl.qid "
            f"AND pen{j}.da = LEAST(sl.did, p.s{j}) "
            f"AND pen{j}.db = GREATEST(sl.did, p.s{j}) "
            for j in range(1, r)
        )
        rounds.append(
            f"sel{r} AS (SELECT qid, {sel_cols}, did AS s{r} FROM ("
            f"  SELECT sl.qid, {', '.join('p.s%d' % j for j in range(1, r))}, "
            "  sl.did, ROW_NUMBER() OVER (PARTITION BY sl.qid ORDER BY "
            f"  {lam} * sl.rel {idiv} 1000 - {ilam} * {max_pen} {idiv} 1000 "
            "  DESC, sl.did) AS rn "
            f"  FROM shortlist sl JOIN {prev_sel} p ON sl.qid = p.qid "
            f"  {pens} WHERE {not_in}) t WHERE rn = 1)"
        )
        prev_sel = f"sel{r}"
    sel_union = " UNION ALL ".join(
        f"SELECT qid, s{j} AS did, {j} AS mmr_rank FROM sel{_MMR_K}"
        for j in range(1, _MMR_K + 1)
    )
    return (
        f"WITH ev AS (SELECT vec_id, {vcast} AS v FROM embeddings), "
        f"en AS (SELECT vec_id, v, sqrt({dot('v', 'v')}) AS nrm FROM ev), "
        f"q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM en "
        f"      WHERE vec_id < {_MMR_Q}), "
        "scored AS (SELECT q.qid, c.vec_id AS did, c.v, c.nrm, "
        f"  CAST(FLOOR({dot('q.qv', 'c.v')} / (q.qn * c.nrm) * 1000000) "
        "  AS BIGINT) AS rel "
        "  FROM en c, q WHERE c.vec_id <> q.qid), "
        "shortlist AS (SELECT qid, did, v, nrm, rel FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
        "  ORDER BY rel DESC, did) AS rn FROM scored) t "
        f"  WHERE rn <= {_MMR_SHORT}), "
        "sims AS (SELECT a.qid, a.did AS da, b.did AS db, "
        f"  CAST(FLOOR({dot('a.v', 'b.v')} / (a.nrm * b.nrm) * 1000000) "
        "  AS BIGINT) AS sim "
        "  FROM shortlist a JOIN shortlist b "
        "  ON a.qid = b.qid AND a.did < b.did), "
        + ", ".join(rounds)
        + f", picks AS ({sel_union})"
    )


def _mmr_sql(dialect: str) -> str:
    return (
        _mmr_cte_body(dialect)
        + " SELECT qid AS query_id, did AS doc_id, "
        "CAST(mmr_rank AS INT) AS mmr_rank FROM picks "
        "ORDER BY query_id, mmr_rank"
    )


sql_query(
    "rag_mmr_rerank",
    _mmr_sql("spark"),
    oracle=_mmr_sql("duck"),
    tables=("embeddings",),
    tags=("rag", "similarity", "diversity"),
    doc=f"MMR diversity re-rank (lambda={_MMR_LAMBDA} permille): greedy "
    f"k={_MMR_K} selection over the top-{_MMR_SHORT} shortlist as "
    "chained argmax CTEs, floored micro-cosine integers — duplicate-free "
    "retrieval lists with shortlist-bounded O(q*short^2) cost",
)


def _mmr_gauge_sql(dialect: str) -> str:
    # measured diversity benefit (the layout_skipping_ab pattern): mean
    # pairwise micro-cosine within the MMR top-3 vs within the plain
    # relevance top-3, per query + the equal-relevance baseline check
    idiv = "DIV" if dialect == "spark" else "//"
    return (
        _mmr_cte_body(dialect)
        + ", p3 AS (SELECT qid, did FROM ("
        "  SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid "
        "  ORDER BY rel DESC, did) AS rn FROM shortlist) t WHERE rn <= 3), "
        "mmr_sim AS (SELECT a.qid, "
        f"  CAST(SUM(s.sim) {idiv} COUNT(*) AS BIGINT) AS mean_sim "
        "  FROM picks a JOIN picks b ON a.qid = b.qid AND a.did < b.did "
        "  JOIN sims s ON s.qid = a.qid AND s.da = a.did AND s.db = b.did "
        "  GROUP BY a.qid), "
        "plain_sim AS (SELECT a.qid, "
        f"  CAST(SUM(s.sim) {idiv} COUNT(*) AS BIGINT) AS mean_sim "
        "  FROM p3 a JOIN p3 b ON a.qid = b.qid AND a.did < b.did "
        "  JOIN sims s ON s.qid = a.qid AND s.da = a.did AND s.db = b.did "
        "  GROUP BY a.qid) "
        "SELECT m.qid AS query_id, "
        "m.mean_sim AS mmr_mean_sim_micro, "
        "p.mean_sim AS plain_mean_sim_micro, "
        "CAST(p.mean_sim - m.mean_sim AS BIGINT) AS diversity_gain_micro "
        "FROM mmr_sim m JOIN plain_sim p ON m.qid = p.qid "
        "ORDER BY query_id"
    )


sql_query(
    "rag_mmr_gauge",
    _mmr_gauge_sql("spark"),
    oracle=_mmr_gauge_sql("duck"),
    tables=("embeddings",),
    tags=("rag", "diversity", "telemetry"),
    doc="measured MMR benefit: mean pairwise micro-cosine within the "
    "MMR top-3 vs the plain relevance top-3 per query — the diversity "
    "gain the re-ranker buys, integer-exact",
)
