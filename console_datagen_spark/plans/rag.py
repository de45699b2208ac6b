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
        hint = "/*+ REPARTITION(32) */ "
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
