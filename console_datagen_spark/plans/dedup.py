"""Declared dedup queries — DataFrame operators + exact DuckDB oracles.

The Spark side runs operators/dedup.py; the oracle replays the identical
pipeline in DuckDB SQL (portable md5-derived hashes, integer permille
arithmetic — see functions/hashing.py), so MinHash/SimHash/LSH are fully
hash-checked rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from ..functions.hashing import HASH_PRIME, minhash_coeffs
from ..operators import dedup as D
from .registry import CacheSlot, df_query

DOCS = ("documents",)
_K = 8  # minhash permutations
_ROWS_PER_BAND = 2
_JACCARD_PERMILLE = 350
_BITS = 30

# ---- shared DuckDB CTE fragments -----------------------------------------

_DUCK_SHINGLES = (
    "toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents "
    "         WHERE len(string_split(text, ' ')) >= 3), "
    "sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l)-2), "
    "       i -> array_to_string(l[i:i+2], ' '))) AS s FROM toks), "
    "d AS (SELECT DISTINCT doc_id, s FROM sh)"
)

_DUCK_IDS = (
    f"{_DUCK_SHINGLES}, "
    # DISTINCT post-hash, matching the engine (which dedups on hashed ids)
    "ids AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT "
    f"        % {HASH_PRIME} AS tid FROM d)"
)

_DUCK_PERM = " UNION ALL ".join(
    f"SELECT {i} AS perm, {a} AS a, {b} AS b"
    for i, (a, b) in enumerate(minhash_coeffs(_K))
)

_DUCK_SIG = (
    f"{_DUCK_IDS}, perm AS ({_DUCK_PERM}), "
    "sig AS (SELECT doc_id, perm, "
    f"        MIN((a * tid + b) % {HASH_PRIME}) AS minhash "
    "        FROM ids CROSS JOIN perm GROUP BY doc_id, perm)"
)

# ---- exact dedup ----------------------------------------------------------


def _exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return D.exact_dedup_groups(docs).orderBy("h")


df_query(
    "dedup_exact",
    _exact,
    oracle=(
        "SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n "
        "FROM documents GROUP BY md5(text) ORDER BY h"
    ),
    tables=DOCS,
    tags=("dedup",),
    doc="exact dedup: content-hash groupBy (HashSet analog, DataGenerator.java:297)",
)


def _exact_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return (
        docs.groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
        .orderBy("lang", "source")
    )


df_query(
    "dedup_exact_subset",
    _exact_subset,
    oracle=(
        "SELECT lang, source, MIN(doc_id) AS keeper, COUNT(*) AS n "
        "FROM documents GROUP BY lang, source ORDER BY lang, source"
    ),
    tables=DOCS,
    tags=("dedup",),
    doc="subset-key dedup (dropDuplicates([...]) analog)",
)

# ---- minhash --------------------------------------------------------------


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return D.minhash_signatures(docs, k=_K).orderBy("doc_id", "perm")


df_query(
    "dedup_minhash_sigs",
    _minhash_sigs,
    oracle=(
        f"WITH {_DUCK_SIG} "
        "SELECT doc_id, perm, minhash FROM sig ORDER BY doc_id, perm"
    ),
    tables=DOCS,
    tags=("dedup", "minhash"),
    doc="MinHash signatures: k=8 universal hashes over 3-token shingles",
)


def _minhash_pairs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH→verify pair pipeline WITHOUT the presentation sort — what
    every aggregating consumer (components, keepers, pagerank, triangles,
    split leakage) composes over. r14 opt: those consumers eagerly
    checkpoint/hold the pair frame, which used to materialize the
    registered query's global ORDER BY (an Exchange+Sort none of them
    needs — the checkpoint boundary stops EliminateSorts from pruning it).
    Pair VALUES are identical; only the row order of this internal frame
    differs, and every consumer is order-insensitive (joins/aggregates)."""
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # r14: ids back to UNHELD. The r12 eager hold paid off when the fan
    # verify scanned the id frame four ways (fan a-side, b-side, sizes,
    # bands); the packed-array verify leaves only two consumers (bands +
    # collect_list) and the interleaved A/B (scripts/ab_holds.py, same
    # session) measured no-hold 2.39 s vs hold 4.75 s — the blocking
    # count plus InMemoryRelation scan now cost more than one recompute.
    ids = D.doc_shingle_ids(docs)
    cand = D.lsh_candidate_pairs(
        docs, k=_K, rows_per_band=_ROWS_PER_BAND, ids_df=ids
    )
    return D.ngram_jaccard_pairs(
        docs,
        threshold_permille=_JACCARD_PERMILLE,
        candidates=cand,
        ids_df=ids,
    )


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs_raw(spark, sf_dir).orderBy("doc_a", "doc_b")


# the full LSH→verify pipeline as a CTE chain ending in ``pairs`` — the
# pairs query selects from it directly; the components query recurses on it
_DUCK_PAIRS = (
    f"{_DUCK_SIG}, "
    f"bands AS (SELECT doc_id, perm // {_ROWS_PER_BAND} AS band, "
    f"          SUM((perm % {_ROWS_PER_BAND} + 1) * minhash) % {HASH_PRIME} AS bh "
    f"          FROM sig GROUP BY doc_id, perm // {_ROWS_PER_BAND}), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "         FROM bands a JOIN bands b "
    "         ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id), "
    "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter "
    "          FROM ids a JOIN ids b ON a.tid = b.tid AND a.doc_id < b.doc_id "
    "          GROUP BY 1, 2), "
    "pairs AS (SELECT i.doc_a, i.doc_b, "
    "          CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT) "
    "          AS jaccard_permille "
    "          FROM inter i "
    "          JOIN sizes sa ON i.doc_a = sa.doc_id "
    "          JOIN sizes sb ON i.doc_b = sb.doc_id "
    "          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b "
    f"         WHERE i.inter * 1000 // (sa.sz + sb.sz - i.inter) "
    f"               >= {_JACCARD_PERMILLE})"
)

df_query(
    "dedup_minhash_pairs",
    _minhash_pairs,
    oracle=(
        f"WITH {_DUCK_PAIRS} "
        "SELECT doc_a, doc_b, jaccard_permille FROM pairs "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "minhash", "lsh"),
    doc="MinHash+LSH near-dup pairs: band → bucket-join → exact-Jaccard verify",
)


# ---- prefix-filter (PPJoin/AllPairs) exact-threshold join (r14) -------------


_prefix_cache = CacheSlot()


def _prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prefix_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # r14: ids UNHELD (the array verify leaves it 3 consumers — freq,
    # window join, packed arrays — and the interleaved A/B measured
    # ids+prefix held == prefix-only held, so the ids hold buys nothing);
    # the PREFIX projection is the load-bearing hold: it feeds BOTH sides
    # of the candidate self-join, and held once the window shuffle+sort
    # runs once instead of twice (A/B: no-holds 8.6 s vs prefix-held
    # 5.7 s, same session, scripts/ab_holds.py).
    ids = D.doc_shingle_ids(docs)
    prefix = _prefix_cache.hold(
        D.prefix_tokens(docs, threshold_permille=_JACCARD_PERMILLE, ids_df=ids)
    )
    cand = D.prefix_filter_candidates(
        docs, threshold_permille=_JACCARD_PERMILLE, ids_df=ids, prefix_df=prefix
    )
    return D.ngram_jaccard_pairs(
        docs,
        threshold_permille=_JACCARD_PERMILLE,
        candidates=cand,
        ids_df=ids,
    ).orderBy("doc_a", "doc_b")


df_query(
    "dedup_prefix_filter_pairs",
    _prefix_filter_pairs,
    oracle=(
        # COMPLETENESS is what this oracle certifies: the Spark side
        # verifies only prefix-filtered candidates, while the oracle
        # computes the ground truth with NO candidate filter at all
        # (plain shared-shingle join at the same threshold). If prefix
        # filtering dropped any true pair, the hash gate fails — the
        # prefix-filter theorem, checked per fixture rather than taken
        # on faith (banded LSH can never make this claim; its recall is
        # probabilistic by design).
        f"WITH {_DUCK_IDS}, "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "          COUNT(*) AS inter "
        "          FROM ids a JOIN ids b ON a.tid = b.tid "
        "          AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT i.doc_a, i.doc_b, "
        "CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT) "
        "  AS jaccard_permille "
        "FROM inter i "
        "JOIN sizes sa ON i.doc_a = sa.doc_id "
        "JOIN sizes sb ON i.doc_b = sb.doc_id "
        f"WHERE i.inter * 1000 // (sa.sz + sb.sz - i.inter) "
        f"      >= {_JACCARD_PERMILLE} "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "prefix-filter", "ppjoin", "exact"),
    doc="prefix-filter (PPJoin/AllPairs) exact Jaccard-threshold join: "
    "each doc's rarest sz-ceil(t*sz)+1 shingles form the prefix, "
    "candidates share a prefix shingle, then exact verify - the oracle "
    "computes ground truth with NO filter, so the hash gate proves the "
    "prefix-filter completeness theorem on the fixture (banded LSH's "
    "recall is probabilistic; this join is exact and deterministic)",
)


_BUCKET_CAP = 2  # bites at sf0.01 (max observed bucket = 3) so the oracle
# certifies the cap logic itself, not just the uncapped path


def _minhash_pairs_capped_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsorted capped-pair pipeline — see _minhash_pairs_raw for why the
    aggregating consumers skip the registered query's presentation sort.

    ids stays UNHELD here: the r14 interleaved A/B (scripts/ab_keepers.py,
    1.45 s shuffle sentinel) measured hold 10.3 s vs no-hold 4.7 s for the
    composed keepers pipeline — with the packed-array verify the id frame
    has only two consumers and the eager count + InMemoryRelation scan
    cost more than the recompute."""
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    cand = D.lsh_candidate_pairs_capped(
        docs,
        k=_K,
        rows_per_band=_ROWS_PER_BAND,
        bucket_cap=_BUCKET_CAP,
        ids_df=ids,
    )
    return D.ngram_jaccard_pairs(
        docs,
        threshold_permille=_JACCARD_PERMILLE,
        candidates=cand,
        ids_df=ids,
    )


def _minhash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs_capped_raw(spark, sf_dir).orderBy("doc_a", "doc_b")


# same CTE chain as _DUCK_PAIRS but candidates come only from buckets with
# 2..cap members — the oracle replays the hot-bucket drop exactly
_DUCK_PAIRS_CAPPED = (
    f"{_DUCK_SIG}, "
    f"bands AS (SELECT doc_id, perm // {_ROWS_PER_BAND} AS band, "
    f"          SUM((perm % {_ROWS_PER_BAND} + 1) * minhash) % {HASH_PRIME} AS bh "
    f"          FROM sig GROUP BY doc_id, perm // {_ROWS_PER_BAND}), "
    "keep AS (SELECT band, bh FROM bands GROUP BY band, bh "
    f"         HAVING COUNT(*) BETWEEN 2 AND {_BUCKET_CAP}), "
    "kept AS (SELECT b.* FROM bands b JOIN keep k "
    "         ON b.band = k.band AND b.bh = k.bh), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "         FROM kept a JOIN kept b "
    "         ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id), "
    "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter "
    "          FROM ids a JOIN ids b ON a.tid = b.tid AND a.doc_id < b.doc_id "
    "          GROUP BY 1, 2), "
    "pairs AS (SELECT i.doc_a, i.doc_b, "
    "          CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT) "
    "          AS jaccard_permille "
    "          FROM inter i "
    "          JOIN sizes sa ON i.doc_a = sa.doc_id "
    "          JOIN sizes sb ON i.doc_b = sb.doc_id "
    "          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b "
    f"         WHERE i.inter * 1000 // (sa.sz + sb.sz - i.inter) "
    f"               >= {_JACCARD_PERMILLE})"
)

df_query(
    "dedup_lsh_capped",
    _minhash_pairs_capped,
    oracle=(
        f"WITH {_DUCK_PAIRS_CAPPED} "
        "SELECT doc_a, doc_b, jaccard_permille FROM pairs "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "minhash", "lsh", "scale"),
    doc="MinHash+LSH near-dup pairs with a hot-bucket cap: buckets with "
    f"> {_BUCKET_CAP} members are dropped before pairing (quadratic-in-"
    "bucket-size guard for crawl-scale template families; dropped buckets "
    "surface via operators.dedup.lsh_oversized_buckets telemetry)",
)


def _components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _minhash_pairs_raw(spark, sf_dir)
    return D.dup_components(pairs).orderBy("doc_id")


df_query(
    "dedup_components",
    _components,
    oracle=(
        # min reachable id per node = the component's keeper doc
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) "
        "SELECT id AS doc_id, MIN(r) AS component FROM reach "
        "GROUP BY id ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("dedup", "components", "iterative"),
    doc="near-dup clusters: min-label propagation to a fixpoint; the label "
    "IS the keeper (min doc_id), non-label members are the drop list",
)


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return D.ngram_jaccard_pairs(docs, threshold_permille=200).orderBy(
        "doc_a", "doc_b"
    )


df_query(
    "dedup_ngram_jaccard",
    _jaccard_pairs,
    oracle=(
        f"WITH {_DUCK_IDS}, "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter "
        "          FROM ids a JOIN ids b ON a.tid = b.tid AND a.doc_id < b.doc_id "
        "          GROUP BY 1, 2) "
        "SELECT i.doc_a, i.doc_b, "
        "CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT) "
        "AS jaccard_permille "
        "FROM inter i "
        "JOIN sizes sa ON i.doc_a = sa.doc_id "
        "JOIN sizes sb ON i.doc_b = sb.doc_id "
        "WHERE i.inter * 1000 // (sa.sz + sb.sz - i.inter) >= 200 "
        "ORDER BY i.doc_a, i.doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "jaccard"),
    doc="n-gram Jaccard near-dup pairs (shared-shingle equi-join, exact verify)",
)

# ---- simhash --------------------------------------------------------------


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return D.simhash_fingerprints(spark, docs, bits=_BITS).orderBy("doc_id")


df_query(
    "dedup_simhash",
    _simhash,
    oracle=(
        f"WITH {_DUCK_IDS}, "
        f"bitsrc AS (SELECT unnest(generate_series(0, {_BITS - 1})) AS b), "
        "contrib AS (SELECT doc_id, b, "
        "            SUM(CASE WHEN ((tid >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s "
        "            FROM ids CROSS JOIN bitsrc GROUP BY doc_id, b) "
        "SELECT doc_id, "
        "CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) "
        "     AS BIGINT) AS simhash "
        "FROM contrib GROUP BY doc_id ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("dedup", "simhash"),
    doc="SimHash 30-bit fingerprints (sign-aggregated shingle hashes)",
)

_MAX_HAMMING = 6
# the pairs query uses a 48-bit fingerprint: the pigeonhole chunks widen
# from ~4 to ~7 bits, which cuts random chunk collisions (and therefore
# candidate volume) ~10x while hamming<=6 stays the same selectivity class
_PAIR_BITS = 48


def _duck_simhash_cte(bits: int) -> str:
    """fps CTE: same one-row-per-doc fingerprint the engine computes."""
    return (
        f"{_DUCK_IDS}, "
        f"bitsrc AS (SELECT unnest(generate_series(0, {bits - 1})) AS b), "
        "contrib AS (SELECT doc_id, b, "
        "            SUM(CASE WHEN ((tid >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s "
        "            FROM ids CROSS JOIN bitsrc GROUP BY doc_id, b), "
        "fps AS (SELECT doc_id, "
        "        CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) "
        "        AS BIGINT) AS simhash FROM contrib GROUP BY doc_id)"
    )


_DUCK_CHUNKS = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {i} AS ci, "
    f"(simhash >> {lo}) & {(1 << width) - 1} AS cv FROM fps"
    for i, (lo, width) in enumerate(
        D.simhash_chunk_bounds(_PAIR_BITS, _MAX_HAMMING)
    )
)


_simhash_cache = CacheSlot()


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _simhash_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # one row per doc; the chunk self-join would otherwise rebuild the
    # fingerprint aggregation once per join branch (both branches live in
    # the same job, so a lazy persist fills on first use — no count job)
    fp = _simhash_cache.hold(
        D.simhash_fingerprints(spark, docs, bits=_PAIR_BITS), materialize=False
    )
    return D.simhash_pairs_banded(
        spark, docs, max_hamming=_MAX_HAMMING, bits=_PAIR_BITS, fingerprints=fp
    ).orderBy("doc_a", "doc_b")


df_query(
    "dedup_simhash_pairs",
    _simhash_pairs,
    oracle=(
        f"WITH {_duck_simhash_cte(_PAIR_BITS)}, "
        f"chunks AS ({_DUCK_CHUNKS}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "         a.simhash AS ha, b.simhash AS hb "
        "         FROM chunks a JOIN chunks b "
        "         ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id) "
        "SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming "
        f"FROM cand WHERE bit_count(xor(ha, hb)) <= {_MAX_HAMMING} "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "simhash", "lsh"),
    doc="SimHash near-dup pairs: pigeonhole bit-chunk banding + exact hamming verify",
)


_edit_cache = CacheSlot()


def _edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by exact edit distance (fuzzy-dedup tier).

    Candidate generation is the same banded MinHash equi-join as
    dedup_minhash_pairs — O(colliding pairs), never all-pairs — and the
    quadratic levenshtein kernel runs only on those pairs' texts.
    """
    _edit_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # the signature pipeline consumes the shingle-id set twice (per-band
    # min aggregation); lazily-persisted copy, same as _minhash_pairs
    ids = _edit_cache.hold(D.doc_shingle_ids(docs), materialize=False)
    cand = D.lsh_candidate_pairs(
        docs, k=_K, rows_per_band=_ROWS_PER_BAND, ids_df=ids
    )
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").alias("edit_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


df_query(
    "dedup_edit_distance",
    _edit_distance,
    oracle=(
        f"WITH {_DUCK_SIG}, "
        f"bands AS (SELECT doc_id, perm // {_ROWS_PER_BAND} AS band, "
        f"          SUM((perm % {_ROWS_PER_BAND} + 1) * minhash) % {HASH_PRIME} AS bh "
        f"          FROM sig GROUP BY doc_id, perm // {_ROWS_PER_BAND}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "         FROM bands a JOIN bands b "
        "         ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id) "
        "SELECT c.doc_a, c.doc_b, "
        "CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist "
        "FROM cand c "
        "JOIN documents da ON c.doc_a = da.doc_id "
        "JOIN documents db ON c.doc_b = db.doc_id "
        "ORDER BY c.doc_a, c.doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "fuzzy", "lsh"),
    doc="fuzzy dedup: LSH candidates verified by exact levenshtein distance",
)


def _components_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _minhash_pairs_raw(spark, sf_dir)
    return D.dup_component_stats(pairs).orderBy("csize")


df_query(
    "dedup_components_stats",
    _components_stats,
    oracle=(
        # same min-reachable-id components as dedup_components, rolled up
        # into the cluster-size histogram an operator actually watches
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id), "
        "csizes AS (SELECT component, COUNT(*) AS csize FROM comp "
        "           GROUP BY component) "
        "SELECT csize, COUNT(*) AS n_components FROM csizes "
        "GROUP BY csize ORDER BY csize"
    ),
    tables=DOCS,
    tags=("dedup", "components", "iterative", "telemetry"),
    doc="near-dup cluster size histogram: dup_components labels rolled up "
    "to (csize, n_components) — the convergence/threshold health gauge; "
    "driver round count exposed via operators.dedup.last_component_rounds",
)


def _keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    pairs = _minhash_pairs_raw(spark, sf_dir)
    labels = D.dup_components(pairs)
    # the drop list: every clustered doc that is not its cluster's keeper
    drops = labels.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return (
        docs.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


df_query(
    "dedup_keepers",
    _keepers,
    oracle=(
        # end-to-end dedup: apply dup_components' drop list to the corpus
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id), "
        "drops AS (SELECT id FROM comp WHERE id <> component) "
        "SELECT lang, COUNT(*) AS n_kept FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.id = d.doc_id) "
        "GROUP BY lang ORDER BY lang"
    ),
    tables=DOCS,
    tags=("dedup", "components", "pipeline"),
    doc="end-to-end near-dup removal: corpus anti-joined against the "
    "dup_components drop list (cluster members that are not the min-id "
    "keeper), rolled up per lang — the dedup tier's actual output shape",
)


def _minhash_pairs_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    cand = D.lsh_candidate_pairs_sampled(
        docs,
        k=_K,
        rows_per_band=_ROWS_PER_BAND,
        bucket_cap=_BUCKET_CAP,
        ids_df=ids,
    )
    return D.ngram_jaccard_pairs(
        docs,
        threshold_permille=_JACCARD_PERMILLE,
        candidates=cand,
        ids_df=ids,
    ).orderBy("doc_a", "doc_b")


_DUCK_PAIRS_SAMPLED = (
    f"{_DUCK_SIG}, "
    f"bands AS (SELECT doc_id, perm // {_ROWS_PER_BAND} AS band, "
    f"          SUM((perm % {_ROWS_PER_BAND} + 1) * minhash) % {HASH_PRIME} AS bh "
    f"          FROM sig GROUP BY doc_id, perm // {_ROWS_PER_BAND}), "
    # deterministic per-bucket sample: keep the cap lowest salted-md5
    # members of every bucket (same rank expression as the Spark window)
    "ranked AS (SELECT doc_id, band, bh, ROW_NUMBER() OVER ("
    "  PARTITION BY band, bh ORDER BY "
    "  ('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT, "
    "  doc_id) AS rn FROM bands), "
    f"kept AS (SELECT doc_id, band, bh FROM ranked WHERE rn <= {_BUCKET_CAP}), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "         FROM kept a JOIN kept b "
    "         ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id), "
    "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter "
    "          FROM ids a JOIN ids b ON a.tid = b.tid AND a.doc_id < b.doc_id "
    "          GROUP BY 1, 2), "
    "pairs AS (SELECT i.doc_a, i.doc_b, "
    "          CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT) "
    "          AS jaccard_permille "
    "          FROM inter i "
    "          JOIN sizes sa ON i.doc_a = sa.doc_id "
    "          JOIN sizes sb ON i.doc_b = sb.doc_id "
    "          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b "
    f"         WHERE i.inter * 1000 // (sa.sz + sb.sz - i.inter) "
    f"               >= {_JACCARD_PERMILLE})"
)

df_query(
    "dedup_lsh_sampled",
    _minhash_pairs_sampled,
    oracle=(
        f"WITH {_DUCK_PAIRS_SAMPLED} "
        "SELECT doc_a, doc_b, jaccard_permille FROM pairs "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "minhash", "lsh", "scale"),
    doc="MinHash+LSH pairs with per-bucket SAMPLING: over-full buckets "
    f"keep their {_BUCKET_CAP} lowest-salted-md5 members instead of being "
    "dropped wholesale — a representative core of a template family still "
    "enters the pair graph while candidate volume stays O(cap²)/bucket",
)


def _keepers_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # UNHELD ids on purpose: see _minhash_pairs_capped_raw (A/B: hold
    # 10.3 s vs no-hold 4.7 s for this exact pipeline)
    ids = D.doc_shingle_ids(docs)
    cand = D.lsh_candidate_pairs_capped(
        docs,
        k=_K,
        rows_per_band=_ROWS_PER_BAND,
        bucket_cap=_BUCKET_CAP,
        ids_df=ids,
    )
    pairs = D.ngram_jaccard_pairs(
        docs,
        threshold_permille=_JACCARD_PERMILLE,
        candidates=cand,
        ids_df=ids,
    )
    labels = D.dup_components(pairs)
    drops = labels.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return (
        docs.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


df_query(
    "dedup_keepers_capped",
    _keepers_capped,
    oracle=(
        f"WITH RECURSIVE {_DUCK_PAIRS_CAPPED}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id), "
        "drops AS (SELECT id FROM comp WHERE id <> component) "
        "SELECT lang, COUNT(*) AS n_kept FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.id = d.doc_id) "
        "GROUP BY lang ORDER BY lang"
    ),
    tables=DOCS,
    tags=("dedup", "components", "pipeline", "scale"),
    doc="end-to-end near-dup removal composed over the HOT-BUCKET-CAPPED "
    "candidate path (the form that survives a crawl-scale template "
    "family): capped LSH -> verify -> components -> anti-join, per-lang "
    "keeper counts",
)


# ---- incremental ingest dedup ---------------------------------------------

# the crawl-ingest split: docs with doc_id % 10 >= 8 are "today's batch",
# the rest are the already-indexed corpus
_INC_PRED = "doc_id % 10 >= 8"


def _incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    corpus = docs.where(f"NOT ({_INC_PRED})")
    incoming = docs.where(_INC_PRED)
    return D.incremental_dedup(
        corpus,
        incoming,
        k=_K,
        rows_per_band=_ROWS_PER_BAND,
        threshold_permille=_JACCARD_PERMILLE,
    ).orderBy("doc_id")


df_query(
    "dedup_incremental",
    _incremental,
    oracle=(
        # bands over the full corpus, split by the ingest predicate — the
        # per-doc pipelines are identical, so filtering after banding
        # equals banding each side separately
        f"WITH {_DUCK_SIG}, "
        f"bands AS (SELECT doc_id, perm // {_ROWS_PER_BAND} AS band, "
        f"          SUM((perm % {_ROWS_PER_BAND} + 1) * minhash) % {HASH_PRIME} AS bh "
        f"          FROM sig GROUP BY doc_id, perm // {_ROWS_PER_BAND}), "
        f"cand AS (SELECT DISTINCT i.doc_id AS doc_new, c.doc_id AS doc_old "
        f"         FROM bands i JOIN bands c ON i.band = c.band AND i.bh = c.bh "
        f"         WHERE i.{_INC_PRED} AND NOT (c.{_INC_PRED})), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
        "inter AS (SELECT cd.doc_new, cd.doc_old, COUNT(*) AS inter "
        "          FROM cand cd "
        "          JOIN ids a ON a.doc_id = cd.doc_new "
        "          JOIN ids b ON b.doc_id = cd.doc_old AND b.tid = a.tid "
        "          GROUP BY 1, 2), "
        "matched AS (SELECT i.doc_new, i.doc_old, "
        "            CAST(i.inter * 1000 // (sn.sz + so.sz - i.inter) AS BIGINT) AS jp "
        "            FROM inter i "
        "            JOIN sizes sn ON i.doc_new = sn.doc_id "
        "            JOIN sizes so ON i.doc_old = so.doc_id "
        f"           WHERE i.inter * 1000 // (sn.sz + so.sz - i.inter) "
        f"                 >= {_JACCARD_PERMILLE}), "
        "best AS (SELECT doc_new AS doc_id, doc_old AS match_id, jp AS match_permille "
        "         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_new "
        "               ORDER BY jp DESC, doc_old) AS rn FROM matched) t "
        "         WHERE rn = 1) "
        f"SELECT d.doc_id, "
        "CAST(CASE WHEN b.match_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup, "
        "b.match_id, b.match_permille "
        f"FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id "
        f"WHERE d.{_INC_PRED} ORDER BY d.doc_id"
    ),
    tables=DOCS,
    tags=("dedup", "minhash", "lsh", "incremental"),
    doc="incremental ingest dedup: today's batch probes the corpus's "
    "persistable MinHash band index (equi-join on (band, bh)), exact-"
    "Jaccard verify on collisions only — the corpus is never rescanned; "
    "per batch doc: is_dup flag + best corpus match",
)


# ---- leakage-guarded train/test split -------------------------------------

_BUCKET_DUCK_SPLIT = (
    "(('0x' || substr(md5(concat('v1:', CAST({c} AS VARCHAR))),1,15))::BIGINT "
    "% 1000)"
)


def _split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split leakage audit: near-dup pairs that cross split lines.

    A train/test split is only sound if no near-duplicate of a test doc
    sits in train (otherwise eval is contaminated). Composition: the
    hash-bucket split (operators/sampling.deterministic_split) x the
    LSH-verified near-dup pairs — one row summarizing split sizes and
    the count of cross-split dup pairs. At 100 TB both inputs already
    exist (split labels are an expression; pairs come from the dedup
    pass), so the audit is two tiny joins over the pair list.
    """
    from ..operators.sampling import deterministic_split

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    labeled = deterministic_split(
        docs.select("doc_id"), "doc_id",
        {"train": 800, "val": 100, "test": 100},
    )
    pairs = _minhash_pairs_raw(spark, sf_dir)
    sa = labeled.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = labeled.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    crossed = pairs.join(sa, "doc_a").join(sb, "doc_b")
    return labeled.groupBy().agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long").alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long").alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long").alias("n_test"),
    ).crossJoin(
        crossed.groupBy().agg(
            F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0))
            .cast("long").alias("n_leaky_pairs")
        )
    )


_b = _BUCKET_DUCK_SPLIT.format(c="doc_id")
_ba = _BUCKET_DUCK_SPLIT.format(c="doc_a")
_bb = _BUCKET_DUCK_SPLIT.format(c="doc_b")

df_query(
    "sample_split_leakage",
    _split_leakage,
    oracle=(
        f"WITH {_DUCK_PAIRS}, "
        "sizes2 AS (SELECT "
        f"  CAST(SUM(CASE WHEN {_b} < 800 THEN 1 ELSE 0 END) AS BIGINT) AS n_train, "
        f"  CAST(SUM(CASE WHEN {_b} >= 800 AND {_b} < 900 THEN 1 ELSE 0 END) "
        "       AS BIGINT) AS n_val, "
        f"  CAST(SUM(CASE WHEN {_b} >= 900 THEN 1 ELSE 0 END) AS BIGINT) AS n_test "
        "  FROM documents), "
        "leaks AS (SELECT CAST(SUM(CASE WHEN "
        f"  (CASE WHEN {_ba} < 800 THEN 'train' WHEN {_ba} < 900 THEN 'val' "
        "        ELSE 'test' END) <> "
        f"  (CASE WHEN {_bb} < 800 THEN 'train' WHEN {_bb} < 900 THEN 'val' "
        "        ELSE 'test' END) THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_pairs "
        "  FROM pairs) "
        "SELECT n_train, n_val, n_test, n_leaky_pairs FROM sizes2, leaks "
        "ORDER BY n_train"
    ),
    tables=DOCS,
    tags=("sampling", "split", "dedup", "pipeline"),
    doc="eval-split leakage audit: hash-bucket train/val/test sizes + the "
    "count of LSH-verified near-dup pairs crossing split lines — the "
    "decontamination guarantee a benchmark split needs",
)


# ---- integer PageRank over the near-dup graph ------------------------------

_PR_ROUNDS = 3

_pr_cache = CacheSlot()


def _pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-permille PageRank on the near-dup pair graph.

    Centrality over the duplication graph ranks the docs that anchor the
    most duplication mass — dedup triage at corpus scale. Damping 0.85
    restated in integers (pr' = 150 + 850·Σ(pr_u DIV deg_u) DIV 1000,
    floor division everywhere) so three fixed rounds are hash-exact on
    both engines. Each round is one equi-join on the edge list + one hash
    agg — the standard distributed PR kernel; rounds here are fixed and
    few, so no checkpointing is needed (cf. dup_components for the
    fixpoint-loop shape with checkpoints).
    """
    _pr_cache.release()
    pairs = _minhash_pairs_raw(spark, sf_dir)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    # every PR round references the edge list; without the eager hold the
    # whole upstream LSH pair pipeline re-executes per round (measured
    # 34 s -> ~4 s at sf0.1 for 3 rounds)
    edges = _pr_cache.hold(fwd.union(rev))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # r14 opt (guide §2.4/§3): deg is a per-source constant — attach it to
    # the held edge list ONCE instead of re-joining it every round. Each
    # round is then a single equi-join + hash agg (was two joins); the
    # held frame carries one extra BIGINT per edge. Built off the cached
    # edges, so the upstream pair pipeline still runs exactly once.
    edeg = _pr_cache.hold(edges.join(deg, "src"))
    from ..tools import plan_probe

    plan_probe("pagerank_edeg", edeg)
    pr = deg.select(F.col("src").alias("id"), F.lit(1000).cast("long").alias("pr"))
    for rnd in range(_PR_ROUNDS):
        contrib = (
            edeg.join(pr, edeg["src"] == pr["id"])
            .select("dst", F.expr("pr DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = contrib.select(
            F.col("dst").alias("id"),
            (F.lit(150) + F.expr("850 * s DIV 1000")).cast("long").alias("pr"),
        )
        plan_probe(f"pagerank_round{rnd}", pr)
        pr = pr.localCheckpoint(eager=False)  # truncate the per-round lineage chain
    return pr.select(F.col("id").alias("doc_id"), "pr").orderBy("doc_id")


def _duck_pagerank(rounds: int = _PR_ROUNDS) -> str:
    ctes = [
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "pr0 AS (SELECT src AS id, CAST(1000 AS BIGINT) AS pr FROM deg)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"pr{k} AS (SELECT e.dst AS id, "
            f"CAST(150 + 850 * SUM(p.pr // d.deg) // 1000 AS BIGINT) AS pr "
            f"FROM edges e JOIN pr{k - 1} p ON e.src = p.id "
            "JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
    return (
        f"WITH {_DUCK_PAIRS}, " + ", ".join(ctes)
        + f" SELECT id AS doc_id, pr FROM pr{rounds} ORDER BY doc_id"
    )


df_query(
    "graph_pagerank_dups",
    _pagerank,
    oracle=_duck_pagerank(),
    tables=DOCS,
    tags=("dedup", "graph", "iterative"),
    doc="integer-permille PageRank (3 damped rounds, floor arithmetic) "
    "over the near-dup pair graph — duplication-mass centrality for "
    "dedup triage; per round one edge-list equi-join + one hash agg",
)


# ---- MinHash sketch-accuracy certification ---------------------------------
# The dedup tier's quality contract, in the same spirit as sim_pq_recall /
# agg_sketch_check: how close is the k=8 MinHash ESTIMATE of Jaccard to
# the exact shingle-set Jaccard on the LSH candidate pairs it gates?
# est = (#agreeing permutations * 1000) // k, exact = integer permille —
# both deterministic, so the error distribution itself is hash-checked.

_acc_cache = CacheSlot()


def _minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _acc_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    ids = _acc_cache.hold(D.doc_shingle_ids(docs))
    cand = D.lsh_candidate_pairs(
        docs, k=_K, rows_per_band=_ROWS_PER_BAND, ids_df=ids
    )
    # wide mins frame: ONE row per doc, so the estimate join moves k
    # integers per candidate side instead of k rows (minhash_mins doc)
    mins = D.minhash_mins(docs, k=_K, ids_df=ids)
    ma = mins.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_K)],
    )
    mb = mins.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_K)],
    )
    agree = " + ".join(
        f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(_K)
    )
    est = (
        cand.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST(({agree}) * 1000 DIV {_K} AS BIGINT)").alias("est"),
        )
    )
    # exact Jaccard on the SAME candidates; pairs with zero shared
    # shingles drop out of the intersection join, so re-attach as 0
    exact = D.ngram_jaccard_pairs(
        docs, threshold_permille=0, candidates=cand, ids_df=ids
    )
    joined = est.join(exact, ["doc_a", "doc_b"], "left").select(
        "est",
        F.coalesce(F.col("jaccard_permille"), F.lit(0)).alias("jac"),
    )
    return joined.groupBy().agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.expr("CAST(SUM(ABS(est - jac)) DIV COUNT(*) AS BIGINT)").alias(
            "mean_abs_err_permille"
        ),
        F.max(F.expr("ABS(est - jac)")).cast("bigint").alias(
            "max_abs_err_permille"
        ),
        F.expr(
            "CAST(SUM(CASE WHEN ABS(est - jac) <= 125 THEN 1 ELSE 0 END) "
            "AS BIGINT)"
        ).alias("n_within_one_perm"),
    )


df_query(
    "dedup_minhash_accuracy",
    _minhash_accuracy,
    oracle=(
        f"WITH {_DUCK_PAIRS}, "
        "est AS (SELECT c.doc_a, c.doc_b, "
        f"  CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) "
        f"       * 1000 // {_K} AS BIGINT) AS est "
        "  FROM cand c "
        "  JOIN sig sa ON sa.doc_id = c.doc_a "
        "  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm = sa.perm "
        "  GROUP BY c.doc_a, c.doc_b), "
        "ex AS (SELECT c.doc_a, c.doc_b, COALESCE("
        "    CAST(i.inter * 1000 // (sa.sz + sb.sz - i.inter) AS BIGINT), 0) "
        "    AS jac "
        "  FROM cand c "
        "  JOIN sizes sa ON c.doc_a = sa.doc_id "
        "  JOIN sizes sb ON c.doc_b = sb.doc_id "
        "  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(ABS(e.est - x.jac)) // COUNT(*) AS BIGINT) "
        "  AS mean_abs_err_permille, "
        "CAST(MAX(ABS(e.est - x.jac)) AS BIGINT) AS max_abs_err_permille, "
        "CAST(SUM(CASE WHEN ABS(e.est - x.jac) <= 125 THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS n_within_one_perm "
        "FROM est e JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b "
        "ORDER BY n_pairs"
    ),
    tables=DOCS,
    tags=("dedup", "minhash", "sketch"),
    doc="MinHash accuracy gauge: estimated-vs-exact Jaccard error "
    "distribution over the LSH candidate pairs (mean/max abs error, "
    "share within one permutation quantum) — the sketch-quality "
    "contract for the dedup tier, hash-checked end-to-end",
)


# ---- triangle census over the near-dup graph -------------------------------

_tri_cache = CacheSlot()


def _triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the near-dup
    pair graph.

    High clustering (duplicate families are near-cliques) is what makes
    the min-label components safe to use as dedup keeper groups; low
    clustering flags chains of borderline pairs that over-merge. Edges
    are canonical (doc_a < doc_b); the census orients them by
    (degree, id) and counts each triangle once at its lowest-order
    vertex — the compact-forward kernel whose wedge volume is bounded
    O(m^1.5) at any degree distribution (see the in-body note)."""
    from ..tools import plan_probe

    _tri_cache.release()
    # plan branches (wedge join both sides + closing edge + both degree
    # unions) read the edge list; without the eager hold each branch
    # re-executes the whole upstream LSH pair pipeline (measured
    # 13.5 s -> ~3 s at sf0.1)
    pairs_raw = _minhash_pairs_raw(spark, sf_dir)
    plan_probe("triangles_pairs_precache", pairs_raw)
    pairs = _tri_cache.hold(pairs_raw)
    e = pairs.select("doc_a", "doc_b")
    deg = (
        e.selectExpr("doc_a AS v")
        .unionAll(e.selectExpr("doc_b AS v"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # r15 opt (guide §2.5 skew / §3, VERDICT r14 #2): DEGREE-ORDERED edge
    # orientation before the wedge join. The id-ordered kernel built wedges
    # at every vertex b as d_lower(b)·d_higher(b) — a hot vertex (a
    # boilerplate doc in thousands of near-dup pairs) contributes O(d²)
    # wedge rows regardless of how many close into triangles. Orienting
    # every edge from its lower-(degree, id) endpoint to the higher one and
    # building wedges only at the SOURCE bounds per-vertex out-degree by
    # O(√m), so total wedge volume drops from Σ d² worst-case to O(m^1.5)
    # (the classic compact-forward / Schank-Wagner bound). Each triangle
    # {x,y,z} with π(x)<π(y)<π(z), π = (degree, id), is counted exactly
    # once: as the wedge y←x→z (ordered by π(y)<π(z)) closed by the
    # oriented edge y→z — same single-count-per-triangle invariant as the
    # a<b<c id-ordered join, so n_triangles is identical. At sf0.1 the
    # census is cache-bound and moves little; the win is the at-scale
    # bound on the hot-vertex explosion.
    da = deg.select(F.col("v").alias("doc_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("v").alias("doc_b"), F.col("d").alias("deg_b"))
    # canonical edges have doc_a < doc_b, so a degree tie keeps doc_a first
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        F.col("deg_a") == F.col("deg_b")
    )
    oriented = (
        e.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.when(a_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("src"),
            F.when(a_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dst"),
            F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dd"),
        )
    )
    plan_probe("triangles_oriented_precache", oriented)
    # three consumers (both wedge sides + the closing-edge join) in one
    # job DAG — lazy persist, the first stage fills it in-flight
    o = _tri_cache.hold(oriented, materialize=False)
    w1 = o.select(
        F.col("src").alias("x"), F.col("dst").alias("y"), F.col("dd").alias("dy")
    )
    w2 = o.select(
        F.col("src").alias("x"), F.col("dst").alias("z"), F.col("dd").alias("dz")
    )
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = (
        w1.join(w2, "x")
        .where(
            (F.col("dy") < F.col("dz"))
            | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
        )
        .join(closing, ["y", "z"])
        .groupBy()
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    shape = deg.groupBy().agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.expr("CAST(SUM(d * (d - 1) DIV 2) AS BIGINT)").alias("n_wedges"),
    )
    edges = e.groupBy().agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        edges.crossJoin(shape)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "n_wedges",
            F.expr(
                "CAST(CASE WHEN n_wedges = 0 THEN 0 "
                "ELSE 3 * n_triangles * 1000 DIV n_wedges END AS BIGINT)"
            ).alias("clustering_permille"),
        )
    )


df_query(
    "graph_triangles",
    _triangles,
    oracle=(
        f"WITH {_DUCK_PAIRS}, "
        "e AS (SELECT doc_a AS a, doc_b AS b FROM pairs), "
        "tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
        "  FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "deg AS (SELECT v, COUNT(*) AS d FROM ("
        "  SELECT a AS v FROM e UNION ALL SELECT b FROM e) u GROUP BY v), "
        "shape AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, "
        "  CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg), "
        "ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e) "
        "SELECT n_edges, n_nodes, n_triangles, n_wedges, "
        "CAST(CASE WHEN n_wedges = 0 THEN 0 "
        "  ELSE 3 * n_triangles * 1000 // n_wedges END AS BIGINT) "
        "  AS clustering_permille "
        "FROM ne, shape, tri ORDER BY n_edges"
    ),
    tables=DOCS,
    tags=("dedup", "graph"),
    doc="triangle census of the near-dup graph: edges/nodes/triangles/"
    "wedges + global clustering coefficient (permille) — cliquishness "
    "telemetry that says whether component-based keeper groups over-merge",
)


# ---- corpus novelty curve --------------------------------------------------


def _novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingestion-decile shingle novelty: of each doc's 3-token
    shingles, what share first appears in THAT doc (by doc_id order)?

    The curve every crawl pipeline watches — novelty decays as the
    corpus grows, and the decay rate tells you when additional ingestion
    stops paying for itself. first-occurrence = min(doc_id) per shingle
    (one hash agg over the shingle-id frame), re-joined on tid; the
    NTILE ranking runs over the O(#docs) per-doc stats frame, never the
    corpus."""
    from pyspark.sql import Window

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    first = ids.groupBy("tid").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        ids.join(first, "tid")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel"),
        )
    )
    w = Window.orderBy("doc_id")
    return (
        per_doc.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr("CAST(SUM(novel) * 1000 DIV SUM(total) AS BIGINT)").alias(
                "novelty_permille"
            ),
        )
        .selectExpr("CAST(decile AS BIGINT) AS decile", "n_docs", "novelty_permille")
        .orderBy("decile")
    )


df_query(
    "text_novelty_curve",
    _novelty,
    oracle=(
        f"WITH {_DUCK_IDS}, "
        "first AS (SELECT tid, MIN(doc_id) AS first_doc FROM ids GROUP BY tid), "
        "per_doc AS (SELECT i.doc_id, COUNT(*) AS total, "
        "  SUM(CASE WHEN f.first_doc = i.doc_id THEN 1 ELSE 0 END) AS novel "
        "  FROM ids i JOIN first f ON i.tid = f.tid GROUP BY i.doc_id), "
        "ranked AS (SELECT total, novel, "
        "  NTILE(10) OVER (ORDER BY doc_id) AS decile FROM per_doc) "
        "SELECT CAST(decile AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(novel) * 1000 // SUM(total) AS BIGINT) AS novelty_permille "
        "FROM ranked GROUP BY decile ORDER BY decile"
    ),
    tables=DOCS,
    tags=("text", "novelty", "dedup"),
    doc="shingle novelty by ingestion decile: share of each doc's "
    "shingles first seen in that doc, aggregated over NTILE(10) of "
    "doc_id — the diminishing-returns curve for continued ingestion",
)


# ---- contrastive negative sampling -----------------------------------------
# Contrastive/embedding training needs NEGATIVES that are (a) plausibly
# comparable (same language), (b) provably NOT near-duplicates of the
# anchor (zero shared 3-shingles — stricter than the LSH threshold), and
# (c) deterministically chosen so the dataset is reproducible. Ranking
# is by a seeded pair hash, so resampling with a new seed string is one
# constant change. Anchor set is broadcastable; the no-overlap check is
# an anti-join on the shared-shingle pair frame — never a text scan.

_NEG_K = 3
_NEG_ANCHORS = 10


def _neg_hash(dialect: str) -> str:
    if dialect == "spark":
        return (
            "CAST(conv(substr(md5(concat('neg1:', CAST(qid AS STRING), ':', "
            "CAST(did AS STRING))),1,15),16,10) AS BIGINT)"
        )
    return (
        "('0x' || substr(md5('neg1:' || CAST(qid AS VARCHAR) || ':' || "
        "CAST(did AS VARCHAR)),1,15))::BIGINT"
    )


def _negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    anchors = docs.where(F.col("doc_id") < _NEG_ANCHORS).select(
        F.col("doc_id").alias("qid"), F.col("lang").alias("qlang")
    )
    cand = docs.select(
        F.col("doc_id").alias("did"), F.col("lang").alias("dlang")
    )
    pool = (
        cand.join(F.broadcast(anchors), F.col("qlang") == F.col("dlang"))
        .where(F.col("did") != F.col("qid"))
        .select("qid", "did")
    )
    # shared-shingle pairs restricted to anchors: fan anchor shingles out,
    # equi-join on (did, tid) — candidate-driven like the LSH verify
    qids = ids.join(
        F.broadcast(anchors.select(F.col("qid").alias("doc_id"))), "doc_id"
    ).select(F.col("doc_id").alias("qid"), "tid")
    overlap = (
        qids.join(ids.select(F.col("doc_id").alias("did"), "tid"), "tid")
        .select("qid", "did")
        .distinct()
    )
    clean = pool.join(overlap, ["qid", "did"], "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.expr(_neg_hash("spark")), "did")
    return (
        clean.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _NEG_K)
        .selectExpr("qid", "did AS neg_doc", "CAST(rnk AS INT) AS rnk")
        .orderBy("qid", "rnk")
    )


df_query(
    "sample_negatives",
    _negatives,
    oracle=(
        f"WITH {_DUCK_IDS}, "
        f"anchors AS (SELECT doc_id AS qid, lang AS qlang FROM documents "
        f"            WHERE doc_id < {_NEG_ANCHORS}), "
        "pool AS (SELECT a.qid, d.doc_id AS did FROM documents d "
        "         JOIN anchors a ON d.lang = a.qlang "
        "         WHERE d.doc_id <> a.qid), "
        "overlap AS (SELECT DISTINCT qi.doc_id AS qid, di.doc_id AS did "
        "  FROM ids qi JOIN ids di ON qi.tid = di.tid "
        f"  WHERE qi.doc_id < {_NEG_ANCHORS}), "
        "clean AS (SELECT p.qid, p.did FROM pool p "
        "  WHERE NOT EXISTS (SELECT 1 FROM overlap o "
        "    WHERE o.qid = p.qid AND o.did = p.did)) "
        "SELECT qid, did AS neg_doc, CAST(rnk AS INT) AS rnk FROM ("
        f"  SELECT qid, did, ROW_NUMBER() OVER (PARTITION BY qid "
        f"    ORDER BY {_neg_hash('duck')}, did) AS rnk FROM clean) t "
        f"WHERE rnk <= {_NEG_K} ORDER BY qid, rnk"
    ),
    tables=DOCS,
    tags=("sampling", "contrastive", "dedup"),
    doc=f"contrastive negative sampling: {_NEG_K} same-language negatives "
    "per anchor with ZERO shared shingles (anti-join on the overlap "
    "frame), seeded-hash ranked for reproducibility",
)


# ---- containment dedup (quote-inclusion detection) -------------------------

# Jaccard-gated dedup misses A ⊂ B when |A| << |B|: a doc that quotes a
# whole paragraph of another has inter/union ~ |A|/|B| (small) but
# inter/min(|A|,|B|) ~ 1000 permille. Containment is the asymmetric
# complement of dedup_minhash_pairs (Broder's resemblance vs containment).
#
# Scale path — rare-shingle blocking, NOT MinHash bands: band-LSH is tuned
# for symmetric Jaccard and systematically misses low-Jaccard containment
# pairs, so candidates instead come from shingles whose GLOBAL document
# frequency is in [2, _CONT_MAX_DF]. Candidate volume is bounded by
# Σ_rare C(df,2) ≤ (_CONT_MAX_DF-1)/2 · |rare postings| — linear in the
# corpus — and a contained span of ≥ shingle length almost surely carries
# at least one rare shingle (the df cap only drops boilerplate shingles,
# which identify nothing). No all-pairs stage; the verify join is
# candidate-driven exactly like the LSH verify fanout.
#
# _CONT_N = 5 (not the Jaccard tier's 3): blocking quality depends on the
# shingle SPACE being large relative to the corpus — the fixtures draw
# from a ~40-word vocab, so 3-grams alias by the birthday effect and
# flood the df 2..8 band with chance collisions (measured at sf0.1:
# 189,567 candidates at n=3 vs 1,489 at n=5 — a 127x reduction for the
# same recall class, since a quoted span of >= 5 tokens still carries
# rare 5-grams). Same finding as the scale probe's CONT_N
# (scripts/scale_probe.py), where the 1x/3x/10x growth exponent is 1.08.

_CONT_N = 5
_CONT_MAX_DF = 8
_CONT_PERMILLE = 500

# 5-gram twin of _DUCK_IDS (final CTE name stays `ids` so the downstream
# oracle text is shingle-width-agnostic)
_DUCK_IDS5 = (
    "toks5 AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents "
    f"         WHERE len(string_split(text, ' ')) >= {_CONT_N}), "
    "sh5 AS (SELECT doc_id, unnest(list_transform("
    f"       generate_series(1, len(l)-{_CONT_N - 1}), "
    f"       i -> array_to_string(l[i:i+{_CONT_N - 1}], ' '))) AS s FROM toks5), "
    "d5 AS (SELECT DISTINCT doc_id, s FROM sh5), "
    "ids AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT "
    f"        % {HASH_PRIME} AS tid FROM d5)"
)


def _containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # sizes, the df filter and the verify join all consume the shingle-id
    # frame — one materialized build instead of three shingle explodes.
    # localCheckpoint, NOT CacheSlot persist (r11 verdict #5, A/B'd at
    # 100x under the probe's 16 GiB heap): the persist spelling held the
    # ~35M-row ids frame in unified STORAGE memory, squeezing the verify
    # fanout's partial aggregation out of execution memory — 5.24 GB
    # shuffle write, 8.1 GB memory spill, 2.42 GB disk spill. The
    # checkpoint spelling truncates lineage with blocks OUTSIDE the
    # execution-memory contest and hands AQE exact sizes: 0.80 GB
    # shuffle (6.5x less), 5 MB disk spill (480x less), and 2x faster
    # at sf0.1 (2.16 -> 1.12 s). The one cost is local-mode wall time
    # at 100x (44.6 -> 78.4 s, order-independent): on local[32] the
    # extra 4.4 GB shuffle is memcpy-cheap while block re-reads are
    # not — on a cluster that shuffle is network and the spill is disk,
    # so the checkpoint side of the trade is the scale-correct one.
    # Numbers in PROGRESS.jsonl r12.
    ids = D.doc_shingle_ids(docs, _CONT_N).localCheckpoint(eager=True)
    return (
        D.containment_pairs(
            docs, _CONT_MAX_DF, _CONT_PERMILLE, n=_CONT_N, ids_df=ids
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("inter_sz").cast("long").alias("inter_sz"),
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
            "cont_permille",
        )
        .orderBy("doc_a", "doc_b")
    )


df_query(
    "dedup_containment",
    _containment,
    oracle=(
        f"WITH {_DUCK_IDS5}, "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ids GROUP BY doc_id), "
        "dfc AS (SELECT tid, COUNT(*) AS dfreq FROM ids GROUP BY tid), "
        f"rare AS (SELECT tid FROM dfc WHERE dfreq BETWEEN 2 AND {_CONT_MAX_DF}), "
        "rids AS (SELECT i.doc_id, i.tid FROM ids i JOIN rare r ON i.tid = r.tid), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "         FROM rids a JOIN rids b "
        "         ON a.tid = b.tid AND a.doc_id < b.doc_id), "
        "inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter_sz "
        "          FROM cand c "
        "          JOIN ids a ON a.doc_id = c.doc_a "
        "          JOIN ids b ON b.doc_id = c.doc_b AND a.tid = b.tid "
        "          GROUP BY 1, 2) "
        "SELECT i.doc_a, i.doc_b, CAST(inter_sz AS BIGINT) AS inter_sz, "
        "       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b, "
        "       CAST(inter_sz * 1000 // least(sa.sz, sb.sz) AS BIGINT) "
        "       AS cont_permille "
        "FROM inter i "
        "JOIN sizes sa ON i.doc_a = sa.doc_id "
        "JOIN sizes sb ON i.doc_b = sb.doc_id "
        f"WHERE inter_sz * 1000 // least(sa.sz, sb.sz) >= {_CONT_PERMILLE} "
        "ORDER BY doc_a, doc_b"
    ),
    tables=DOCS,
    tags=("dedup", "containment", "scale"),
    doc=f"asymmetric containment pairs (quote-inclusion): rare-{_CONT_N}-gram "
    f"blocking (df 2..{_CONT_MAX_DF}) -> exact intersection verify, "
    f"inter*1000 DIV min(|A|,|B|) >= {_CONT_PERMILLE} — catches the "
    "A-subset-of-B dups Jaccard-banded LSH is blind to",
)


# ---- leakage-free group-aware split ----------------------------------------

# sample_split_leakage MEASURES near-dup leakage across a naive per-doc
# split; this is the constructive fix: split by the canonicalized content
# GROUP (dedup_normalized's key), so every trivially-reformatted copy of a
# doc lands in the same fold by construction. The query emits per-split
# doc/group counts plus n_leaky_groups — the count of groups spanning >1
# split, structurally 0 — so the no-leakage invariant itself is
# hash-certified, not just asserted in a test. One groupBy on the group
# key; the text column never shuffles.

_GS_SEED = "gsplit1"


def _group_split_sql(norm: str, bucket: str) -> str:
    return (
        f"WITH g AS (SELECT doc_id, {norm} AS gkey FROM documents), "
        f"s AS (SELECT doc_id, gkey, "
        f"      CASE WHEN {bucket} < 800 THEN 'train' "
        f"           WHEN {bucket} < 900 THEN 'val' "
        f"           ELSE 'test' END AS split FROM g), "
        "leak AS (SELECT COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) "
        "         AS n_leaky FROM (SELECT gkey, COUNT(DISTINCT split) AS ns "
        "                          FROM s GROUP BY gkey) t) "
        "SELECT split, COUNT(*) AS n_docs, "
        "       COUNT(DISTINCT gkey) AS n_groups, "
        "       (SELECT CAST(n_leaky AS BIGINT) FROM leak) AS n_leaky_groups "
        "FROM s GROUP BY split ORDER BY split"
    )


from ..functions.hashing import bucket_sql_duck, bucket_sql_spark  # noqa: E402
from .extras import _NORM_DUCK, _NORM_SPARK  # noqa: E402
from .registry import sql_query  # noqa: E402

sql_query(
    "sample_group_split",
    _group_split_sql(_NORM_SPARK, bucket_sql_spark("gkey", _GS_SEED)),
    oracle=_group_split_sql(_NORM_DUCK, bucket_sql_duck("gkey", _GS_SEED)),
    tables=DOCS,
    tags=("sampling", "split", "dedup"),
    doc="group-aware train/val/test split (800/100/100 permille) keyed on "
    "the canonicalized-content group, with the zero-leakage invariant "
    "emitted as a certified column (constructive counterpart of "
    "sample_split_leakage)",
)


# ---- quality-aware keeper selection -----------------------------------------

# dedup_keepers drops every cluster member that is not the MIN-ID doc —
# cheap, but a real curation pass (RefinedWeb, FineWeb) keeps the
# highest-QUALITY copy of each near-dup cluster instead: boilerplate-laden
# or truncated variants lose to the clean one. This query emits the
# per-cluster decision record: keeper = argmax(distinct-token permille,
# doc_id tiebreak) over the same dup_components clusters, plus the
# cluster size and the quality spread the argmax acted on — so the
# keep-the-best policy itself is hash-certified, not just the label set.
#
# Scale: quality is a per-row projection (array built-ins, codegen); the
# argmax is ONE window over (component) — partition-bounded by cluster
# size, which the capped LSH tier already bounds upstream. No new
# all-pairs anywhere: this composes the certified pair/component stages.

_QK_QUALITY_SPARK = (
    "CAST(size(array_distinct(split(text, ' '))) * 1000 "
    "DIV size(split(text, ' ')) AS BIGINT)"
)
_QK_QUALITY_DUCK = (
    "CAST(len(list_distinct(string_split(text, ' '))) * 1000 "
    "// len(string_split(text, ' ')) AS BIGINT)"
)


def _keepers_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    pairs = _minhash_pairs_raw(spark, sf_dir)
    labels = D.dup_components(pairs)
    member_q = labels.join(
        docs.select("doc_id", F.expr(_QK_QUALITY_SPARK).alias("q")), "doc_id"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("q"), F.asc("doc_id")
    )
    ranked = member_q.select(
        "component", "doc_id", "q", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper"),
            F.count("*").cast("long").alias("n_members"),
            F.max("q").alias("best_q"),
            F.min("q").alias("worst_q"),
        )
        .orderBy("component")
    )


df_query(
    "dedup_keepers_quality",
    _keepers_quality,
    oracle=(
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id), "
        "memberq AS (SELECT c.component, c.id AS doc_id, "
        f"            {_QK_QUALITY_DUCK} AS q "
        "            FROM comp c JOIN documents d ON c.id = d.doc_id), "
        "ranked AS (SELECT component, doc_id, q, "
        "           ROW_NUMBER() OVER (PARTITION BY component "
        "                              ORDER BY q DESC, doc_id) AS rn "
        "           FROM memberq) "
        "SELECT component, "
        "MAX(CASE WHEN rn = 1 THEN doc_id END) AS keeper, "
        "COUNT(*) AS n_members, MAX(q) AS best_q, MIN(q) AS worst_q "
        "FROM ranked GROUP BY component ORDER BY component"
    ),
    tables=DOCS,
    tags=("dedup", "components", "quality", "pipeline"),
    doc="quality-aware keeper per near-dup cluster: argmax distinct-token "
    "permille (doc_id tiebreak) over dup_components clusters, with "
    "cluster size and quality spread - the keep-the-best-copy curation "
    "policy as a certified decision record",
)


# ---- dup-cluster size distribution (dedup telemetry) ------------------------

# The operational question before running a dedup pass at 100 TB: how big
# are the near-dup clusters, how many docs does dedup remove, and is
# there a mega-cluster (template family) that needs the hot-bucket cap?
# One groupBy over the component labels + a power-of-two CASE ladder
# (integer comparisons — no libm log2, whose boundary rounding differs
# across engines); singleton count comes from two 1-row aggregate frames
# cross-joined (the repo's documented 1-row broadcast allowance).
# n_removable per bucket = docs - clusters = exactly the rows a
# keep-min-id policy drops.

_HIST_EDGES = (2, 4, 8, 16, 32)


def _size_bucket_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {e} THEN {e}" for e in _HIST_EDGES
    )
    return f"CASE {whens} ELSE {_HIST_EDGES[-1] * 2} END"


def _cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    comp = D.dup_components(_minhash_pairs_raw(spark, sf_dir))
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    hist = (
        sizes.groupBy(F.expr(_size_bucket_case("sz")).cast("int").alias("size_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            (F.sum("sz") - F.count("*")).cast("long").alias("n_removable"),
        )
    )
    single = (
        docs.agg(F.count("*").alias("nt"))
        .crossJoin(comp.agg(F.count("*").alias("np")))
        .select(
            F.lit(1).cast("int").alias("size_bucket"),
            (F.col("nt") - F.col("np")).cast("long").alias("n_clusters"),
            (F.col("nt") - F.col("np")).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_removable"),
        )
    )
    return hist.unionByName(single).orderBy("size_bucket")


df_query(
    "dedup_cluster_histogram",
    _cluster_histogram,
    oracle=(
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id), "
        "comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach "
        "         GROUP BY id), "
        "csizes AS (SELECT component, COUNT(*) AS sz FROM comp "
        "           GROUP BY component), "
        f"hist AS (SELECT CAST({_size_bucket_case('sz')} AS INT) "
        "          AS size_bucket, "
        "          CAST(COUNT(*) AS BIGINT) AS n_clusters, "
        "          CAST(SUM(sz) AS BIGINT) AS n_docs, "
        "          CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removable "
        "          FROM csizes GROUP BY 1), "
        "single AS (SELECT CAST(1 AS INT) AS size_bucket, "
        "  CAST((SELECT COUNT(*) FROM documents) "
        "       - (SELECT COUNT(*) FROM comp) AS BIGINT) AS n_clusters, "
        "  CAST((SELECT COUNT(*) FROM documents) "
        "       - (SELECT COUNT(*) FROM comp) AS BIGINT) AS n_docs, "
        "  CAST(0 AS BIGINT) AS n_removable) "
        "SELECT * FROM hist UNION ALL SELECT * FROM single "
        "ORDER BY size_bucket"
    ),
    tables=DOCS,
    tags=("dedup", "components", "telemetry"),
    doc="dup-cluster size distribution: power-of-two histogram of "
    "near-dup component sizes (n_clusters / n_docs / n_removable per "
    "bucket, singletons as bucket 1) — the pre-dedup sizing report that "
    "decides whether the hot-bucket cap is needed",
)
