"""Deduplication operators over the ``documents`` table.

Spark-first designs, all shuffle-conscious for the 100 TB target:

- exact dedup: hash-groupBy on md5(text) — one shuffle on a 128-bit key,
  map-side partial agg; never compares full texts across the wire.
- MinHash: shingle → 60-bit portable hash → k universal-hash mins per doc.
  The doc×perm expansion is a broadcast cross join (k tiny); the min is a
  partial+final hash agg, so the shuffle carries k rows per doc, not the
  shingle set.
- LSH banding: band-hash groupBy turns the quadratic candidate search into
  an equi-join on (band, band_hash) — only colliding docs meet. This is
  the scale path: candidate volume is O(near-dup pairs), not O(n^2).
- n-gram Jaccard verify: equi-join on shared shingles (again: only docs
  sharing a shingle meet), then exact set arithmetic. Used standalone for
  small corpora and as the verify stage after LSH.
- SimHash: 30-bit sign-aggregated fingerprint; hamming-ball pairing.

All hashes are md5-derived (functions/hashing.py) so the DuckDB oracle can
replay them exactly — no rows-only checks needed.

Reference parity: the reference has only exact-set dedup of topic names
(DataGenerator.java:297 HashSet); everything here is the beyond-reference
LLM-pipeline surface required by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import HASH_PRIME, minhash_coeffs, token_id
from ..functions.spread import spread
from ..functions.text import shingles, tokens


def doc_tokens(documents: DataFrame, min_tokens: int = 3) -> DataFrame:
    # spread: a small-file corpus scan is ONE task; the shingle/hash
    # explode behind this projection is the expensive stage and must run
    # at full parallelism (no-op when the scan already has enough splits)
    return spread(documents).select(
        "doc_id", tokens("text").alias("toks")
    ).where(F.size("toks") >= min_tokens)


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs."""
    return (
        doc_tokens(documents, min_tokens=n)
        .select("doc_id", F.explode(shingles(F.col("toks"), n)).alias("s"))
        .distinct()
    )


def doc_shingle_ids(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, tid) with tid = portable 60-bit hash mod P.

    Hashing happens INSIDE the shingle transform, before the explode, so
    the explode emits BIGINTs and the distinct shuffles fixed-width ints
    instead of multi-token strings — ~2x faster than hashing after a
    string-level distinct, and identical output (the dedup then happens
    on hashed ids; both engines dedup post-hash).
    """
    tk = doc_tokens(documents, min_tokens=n)
    hashed = F.transform(
        shingles(F.col("toks"), n),
        lambda s: token_id(s) % F.lit(HASH_PRIME),
    )
    return tk.select("doc_id", F.explode(hashed).alias("tid")).distinct()


# Hard bound on the packed-array verify's per-doc row width (r15,
# VERDICT r14 #3/#10): collect_list packs one row per doc, so a
# pathological corpus (a single unchunked 100 MB document -> tens of
# millions of shingles) would make that row tens-of-MB wide — past AQE's
# ability to split it (skew handling splits partitions, never one row).
# Upstream chunking bounds honest corpora far below this; the packed
# verify now REJECTS LOUDLY instead of degrading silently. 2^20 distinct
# shingles means a ~1M-token document — two orders of magnitude past any
# chunked ingest row, and an ~8 MB packed row, the documented ceiling.
PACKED_VERIFY_MAX_IDS = 1 << 20


def packed_doc_ids(
    ids: DataFrame, id_col: str = "doc_id", out_col: str = "_ts"
) -> DataFrame:
    """(doc_id, array<tid>) — the packed frame the r14 verify joins on.

    Enforces PACKED_VERIFY_MAX_IDS in the row path: the guard is one
    size() comparison per doc (never a separate action), evaluates to the
    array itself on every honest row, and raises mid-job on a giant doc —
    turning the r14 skew caveat into a guarantee.
    """
    packed = ids.groupBy(id_col).agg(F.collect_list("tid").alias(out_col))
    return packed.select(
        id_col,
        F.when(F.size(out_col) <= PACKED_VERIFY_MAX_IDS, F.col(out_col))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("packed verify: doc "),
                    F.col(id_col).cast("string"),
                    F.lit(
                        f" has > {PACKED_VERIFY_MAX_IDS} shingle ids; "
                        "chunk the corpus upstream"
                    ),
                )
            )
        )
        .alias(out_col),
    )


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact-duplicate groups keyed by content hash.

    Returns (h, keeper, n): keeper = min doc_id per identical text.
    """
    return (
        documents.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
    )


def minhash_mins(
    documents: DataFrame,
    k: int = 8,
    n: int = 3,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """Wide (doc_id, mh0..mh{k-1}) frame — all k permutation-mins in ONE
    aggregation pass over the shingle-id frame. Compared to the textbook
    docs×k cross join + groupBy, the shuffle carries one row per doc
    instead of k — the difference between O(corpus) and O(k·corpus)
    network at 100 TB. Signatures (row form) and band hashes both derive
    from this frame with no further shuffle."""
    if ids_df is not None:
        ids = ids_df
    else:
        base = shingles_df if shingles_df is not None else doc_shingles(documents, n)
        ids = base.select(
            "doc_id", (token_id(F.col("s")) % F.lit(HASH_PRIME)).alias("tid")
        )
    return ids.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("tid") + F.lit(b)) % F.lit(HASH_PRIME)).alias(
                f"mh{i}"
            )
            for i, (a, b) in enumerate(minhash_coeffs(k))
        ]
    )


def minhash_signatures(
    documents: DataFrame,
    k: int = 8,
    n: int = 3,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, perm, minhash) — k-permutation MinHash over n-token
    shingles; the wide min frame unpivoted to rows (stack is a narrow
    projection, no shuffle)."""
    mins = minhash_mins(documents, k, n, shingles_df, ids_df)
    stack = ", ".join(f"{i}, mh{i}" for i in range(k))
    return mins.selectExpr(
        "doc_id", f"stack({k}, {stack}) AS (perm, minhash)"
    ).selectExpr("doc_id", "CAST(perm AS INT) AS perm", "minhash")


def minhash_bands(
    documents: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, bh) — banded MinHash signature hashes.

    Band hash is an order-free weighted sum mod P so it needs no
    ordered string-agg. It is computed DIRECTLY from the wide min frame
    as a column expression per band (bh_j = Σ_r (r+1)·mh_{j·rpb+r} mod P),
    then stack-unpivoted — identical values to re-aggregating the row-form
    signatures, but with zero additional shuffle: the only shuffle in the
    band path is the one k-min agg. This frame IS the persistable LSH
    index shape (codes only, no text) that incremental ingest probes.
    """
    mins = minhash_mins(documents, k, n, shingles_df, ids_df)
    # ceil-divide so a k not divisible by rows_per_band forms a partial
    # last band from the trailing permutations (same banding as grouping
    # rows by floor(perm / rows_per_band) would produce)
    n_bands = -(-k // rows_per_band)

    def band_hash(j: int):
        acc = F.lit(0).cast("long")
        for r in range(rows_per_band):
            perm = j * rows_per_band + r
            if perm >= k:
                break
            acc = acc + (F.lit(r + 1) * F.col(f"mh{perm}"))
        return F.pmod(acc, F.lit(HASH_PRIME))

    wide = mins.select(
        "doc_id", *[band_hash(j).alias(f"_bh{j}") for j in range(n_bands)]
    )
    stack_args = ", ".join(f"{j}, _bh{j}" for j in range(n_bands))
    return wide.selectExpr(
        "doc_id", f"stack({n_bands}, {stack_args}) AS (band, bh)"
    )


def _pairs_from_bands(bands: DataFrame) -> DataFrame:
    """Distinct ordered (doc_a, doc_b) pairs colliding in some band —
    the shared tail of the plain / capped / sampled candidate paths."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash signatures: an
    equi-join on (band, bh) — only docs colliding in some band meet."""
    return _pairs_from_bands(
        minhash_bands(documents, k, rows_per_band, n, shingles_df, ids_df)
    )


def prefix_tokens(
    documents: DataFrame,
    threshold_permille: int = 350,
    n: int = 3,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, tid, rn, sz) prefix projection under the global (df, tid)
    order — each doc's rarest ``sz - ceil(t*sz) + 1`` shingle ids with
    their 1-based full-list position ``rn`` and full set size ``sz``.

    Split out of ``prefix_filter_candidates`` (r14 opt) so the caller can
    persist it ONCE: the candidate self-join consumes this frame on BOTH
    sides, and without a held copy the window sort ran twice (visible as
    two full Window subtrees in the r14 before-plan). ``sz`` is computed
    as a second window over the SAME doc_id partitioning instead of a
    groupBy+join (guide §2.4: two operations keyed the same way share one
    exchange) — one shuffle of the id frame total, no sizes join.
    """
    t = threshold_permille
    d = ids_df if ids_df is not None else doc_shingle_ids(documents, n)
    freq = d.groupBy("tid").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tid")
    wsz = Window.partitionBy("doc_id")
    # rn is the 1-based position in the doc's FULL token list under the
    # global (df, tid) order — the positional filter needs the full-list
    # position, so the window runs before the prefix cut
    return (
        d.join(freq, "tid")
        .select(
            "doc_id",
            "tid",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wsz).alias("sz"),
        )
        .where(
            F.col("rn")
            <= F.col("sz")
            - F.expr(f"CAST(({t} * sz + 999) DIV 1000 AS INT)")
            + F.lit(1)
        )
    )


def prefix_filter_candidates(
    documents: DataFrame,
    threshold_permille: int = 350,
    n: int = 3,
    ids_df: DataFrame | None = None,
    prefix_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs by PREFIX FILTERING (the PPJoin/AllPairs family):
    order each doc's shingle ids by ascending global document frequency
    (rarest first, tid tie-break), keep the first
    ``sz - ceil(threshold*sz) + 1`` as the prefix, and join prefixes on
    shared tid. The prefix-filter theorem guarantees COMPLETENESS: any
    pair with Jaccard >= threshold shares at least one prefix token
    under a common global order — so unlike banded LSH (probabilistic
    recall), verify(prefix candidates) EQUALS the full exact-threshold
    join. Scale shape: the prefix drops each doc's most COMMON tokens,
    so the candidate equi-join fans out only on rare tokens — the hot
    template shingle every doc shares never generates pairs; pruning
    power grows with the threshold (short prefixes at theta >= 0.8)."""
    t = threshold_permille
    prefix = (
        prefix_df
        if prefix_df is not None
        else prefix_tokens(documents, threshold_permille, n, ids_df)
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # PPJoin's two additional complete filters (Xiao et al. 2011) — both
    # certified by the no-filter oracle, which fails the hash gate if
    # either ever drops a true pair:
    # - size filter IN the join condition: J >= t forces
    #   t*max(sz) <= 1000*min(sz), pruning mismatched sizes before the
    #   match rows ever shuffle;
    # - positional filter AFTER the group: with the first shared prefix
    #   token at positions (pa, pb), overlap <= 1 + min(sza-pa, szb-pb),
    #   while J >= t needs overlap >= ceil(t*(sza+szb)/(1000+t)) — the
    #   same inequality the verify's floor-division compare reduces to,
    #   so the bound is exact, not heuristic. Together they cut the
    #   candidate volume the fan-out verify pays for (measured 2.2x at
    #   theta=0.35 on the sf0.1 fixture, 582k -> 259k, and the pruning
    #   strengthens with the threshold as prefixes shorten).
    matches = a.join(
        b,
        (F.col("a.tid") == F.col("b.tid"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.sz") * t <= F.col("b.sz") * 1000)
        & (F.col("b.sz") * t <= F.col("a.sz") * 1000),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.rn").alias("pa"),
        F.col("b.rn").alias("pb"),
        F.col("a.sz").alias("sza"),
        F.col("b.sz").alias("szb"),
    )
    return (
        matches.groupBy("doc_a", "doc_b")
        .agg(
            F.min("pa").alias("pa"),
            F.min("pb").alias("pb"),
            F.first("sza").alias("sza"),
            F.first("szb").alias("szb"),
        )
        .where(
            F.lit(1)
            + F.least(
                F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")
            )
            >= F.expr(
                f"CAST(({t} * (sza + szb) + {1000 + t} - 1) "
                f"DIV {1000 + t} AS INT)"
            )
        )
        .select("doc_a", "doc_b")
    )


def lsh_oversized_buckets(bands: DataFrame, bucket_cap: int) -> DataFrame:
    """(band, bh, bsz) for buckets whose membership exceeds ``bucket_cap``.

    The dropped-bucket telemetry twin of ``lsh_candidate_pairs_capped``:
    at web-crawl scale an operator watches this frame (count + max bsz)
    to see how much candidate mass the cap removed and whether a template
    family needs a dedicated per-bucket sampling pass. One hash agg on
    (band, bh) — the same shuffle the capped pair join performs anyway.
    """
    return (
        bands.groupBy("band", "bh")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
    )


def lsh_candidate_pairs_capped(
    documents: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    bucket_cap: int = 64,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """``lsh_candidate_pairs`` with a hot-bucket cap — the web-crawl shape.

    Band candidates are quadratic in *bucket* size: one boilerplate
    bucket with 10⁶ members yields 5·10¹¹ pairs before any verify can
    run. Members of an over-full bucket are either exact duplicates
    (removed upstream by ``exact_dedup_groups`` in the composed
    pipelines) or a template family better handled by a per-bucket
    sample, so buckets with more than ``bucket_cap`` members are dropped
    wholesale and surfaced via ``lsh_oversized_buckets``. Candidate
    volume is then ≤ Σ min(bsz, cap)² — O(cap²) per bucket, bounded.

    Plan shape: one extra hash agg on (band, bh) for the sizes, then the
    size frame joins back on the same (band, bh) key the pair equi-join
    shuffles on anyway — co-partitioned, no new shuffle axis. Buckets
    with a single member are pruned in the same filter (they cannot form
    a pair), which also shrinks the self-join input.
    """
    bands = (
        bands_df
        if bands_df is not None
        else minhash_bands(documents, k, rows_per_band, n, shingles_df, ids_df)
    )
    keep = (
        bands.groupBy("band", "bh")
        .agg(F.count("*").alias("bsz"))
        .where((F.col("bsz") >= 2) & (F.col("bsz") <= bucket_cap))
        .select("band", "bh")
    )
    return _pairs_from_bands(bands.join(keep, ["band", "bh"]))


def lsh_candidate_pairs_sampled(
    documents: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    bucket_cap: int = 64,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
    bands_df: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket SAMPLED variant of the hot-bucket cap: instead of
    dropping an over-full bucket wholesale (``lsh_candidate_pairs_capped``),
    keep its ``bucket_cap`` lowest-hash members (md5 of a salted doc_id —
    deterministic, replayable by the oracle) and pair only those.

    The middle ground for template families: a representative sample of
    the family still enters the pair graph (so connected components still
    collapse a core of it) while candidate volume stays O(cap²) per
    bucket. Plan shape: one window rank partitioned by (band, bh) — the
    SAME key the pair equi-join shuffles on, so the rank and the join
    share a shuffle axis; no new exchange for the small-bucket majority.
    """
    bands = (
        bands_df
        if bands_df is not None
        else minhash_bands(documents, k, rows_per_band, n, shingles_df, ids_df)
    )
    rank_w = Window.partitionBy("band", "bh").orderBy(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("s"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        "doc_id",
    )
    kept = (
        bands.withColumn("rn", F.row_number().over(rank_w))
        .where(F.col("rn") <= bucket_cap)
        .select("doc_id", "band", "bh")
    )
    return _pairs_from_bands(kept)


def containment_candidates(
    documents: DataFrame,
    max_df: int = 8,
    n: int = 3,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """Rare-shingle-blocked candidate pairs for CONTAINMENT dedup.

    Band-LSH is tuned for symmetric Jaccard and systematically misses
    A-subset-of-B pairs (resemblance ~ |A|/|B| is tiny even when
    containment is 1000 permille), so candidates come instead from
    shingles whose GLOBAL document frequency lies in [2, max_df]: a
    contained span of >= n tokens almost surely carries a rare shingle,
    while the df cap excludes exactly the boilerplate shingles that
    identify nothing. Candidate volume is bounded by
    sum_rare C(df, 2) <= (max_df - 1) / 2 * |rare postings| — linear in
    the corpus, never all-pairs.
    """
    ids = ids_df if ids_df is not None else doc_shingle_ids(documents, n)
    rare = (
        ids.groupBy("tid")
        .agg(F.count("*").alias("dfreq"))
        .where((F.col("dfreq") >= 2) & (F.col("dfreq") <= max_df))
        .select("tid")
    )
    rids = ids.join(rare, "tid")
    return (
        rids.alias("a")
        .join(rids.alias("b"), "tid")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def containment_pairs(
    documents: DataFrame,
    max_df: int = 8,
    threshold_permille: int = 500,
    n: int = 3,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment pairs: inter * 1000 DIV min(|A|, |B|) >=
    threshold. Candidates from ``containment_candidates`` (rare-shingle
    blocking); the verify stage joins candidates back to the shingle-id
    frame — candidate-driven exactly like the LSH verify fanout, no
    all-pairs stage.
    """
    ids = ids_df if ids_df is not None else doc_shingle_ids(documents, n)
    cand = containment_candidates(documents, max_df, n, ids_df=ids)
    # r14 opt: packed-array verify, same kernel as ngram_jaccard_pairs —
    # one collect_list per doc, one join per candidate side, intersection
    # and both sizes evaluated from the arrays in the JVM (two rows move
    # per pair instead of a per-shingle fanout; the inter >= 1 guard
    # reproduces the fan join's implicit zero-overlap drop). r15: the
    # packed build goes through packed_doc_ids, which enforces the
    # giant-doc row-width bound.
    packed = packed_doc_ids(ids)
    return (
        cand.join(
            packed.select(F.col("doc_id").alias("doc_a"), F.col("_ts").alias("_ta")),
            "doc_a",
        )
        .join(
            packed.select(F.col("doc_id").alias("doc_b"), F.col("_ts").alias("_tb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_ta", "_tb")).alias("inter_sz"),
            F.size("_ta").alias("sz_a"),
            F.size("_tb").alias("sz_b"),
        )
        .where(F.col("inter_sz") >= 1)
        .withColumn(
            "cont_permille",
            F.expr("inter_sz * 1000 DIV least(sz_a, sz_b)").cast("long"),
        )
        .where(F.col("cont_permille") >= threshold_permille)
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold_permille: int = 200,
    candidates: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
    ids_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard_permille) for pairs ≥ threshold.

    Jaccard is computed in exact integer arithmetic (permille, floor
    division) so Spark and the DuckDB oracle agree bit-for-bit.
    When ``candidates`` is given (e.g. from LSH), only those pairs are
    verified — the scale path. Without it, the shared-shingle equi-join
    bounds the pair space to docs that overlap at all.

    Set operations run over the 60-bit integer shingle ids, not the
    shingle strings: the shared-element self-join shuffles and compares
    fixed-width BIGINTs instead of multi-token strings (the oracle hashes
    identically, so intersection/size counts match bit-for-bit; a within-
    pair hash collision would need ~2^60 shingles).
    """
    if ids_df is not None:
        d = ids_df
    elif shingles_df is not None:
        d = shingles_df.select(
            "doc_id", (token_id(F.col("s")) % F.lit(HASH_PRIME)).alias("tid")
        )
    else:
        d = doc_shingle_ids(documents, n)
    if candidates is not None:
        # candidate-driven verify over PACKED per-doc id arrays (r14 opt,
        # guide §2.3 "shuffle fewer bytes"/"aggregate before you shuffle"):
        # one collect_list packs each doc's distinct ids into a single
        # array row, the candidate pair joins once per side, and the
        # intersection is size(array_intersect(...)) evaluated in the JVM.
        # Per candidate pair this moves TWO array rows (~8·sz bytes)
        # instead of fanning doc_a's whole shingle list through a second
        # equi-join and a pair-keyed hash agg (~24·sz bytes and sz rows a
        # pair) — the row volume entering the verify drops from
        # Σ|shingles(doc_a)| to 2·|candidates|, and the sizes come free as
        # size(array) instead of two more joins. Results are bit-identical:
        # ids are distinct per doc, array_intersect is set intersection,
        # and the inter >= 1 guard reproduces the fan join's implicit
        # drop of zero-overlap candidates (load-bearing at threshold 0,
        # e.g. the minhash-accuracy gauge). A/B at sf0.1 + the oracle's
        # no-filter ground truth certify the rewrite. No broadcast hint:
        # candidate volume is unbounded, let AQE pick from measured sizes.
        # r15: the giant-doc row-width caveat is now ENFORCED by
        # packed_doc_ids (PACKED_VERIFY_MAX_IDS, loud reject) instead of
        # documented-and-hoped (VERDICT r14 #3/#10).
        packed = packed_doc_ids(d)
        return (
            candidates.select("doc_a", "doc_b")
            .join(
                packed.select(
                    F.col("doc_id").alias("doc_a"), F.col("_ts").alias("_ta")
                ),
                "doc_a",
            )
            .join(
                packed.select(
                    F.col("doc_id").alias("doc_b"), F.col("_ts").alias("_tb")
                ),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("_ta", "_tb")).alias("inter"),
                F.size("_ta").alias("sza"),
                F.size("_tb").alias("szb"),
            )
            .where(F.col("inter") >= 1)
            .select(
                "doc_a",
                "doc_b",
                F.expr(
                    "CAST(inter * 1000 DIV (sza + szb - inter) AS BIGINT)"
                ).alias("jaccard_permille"),
            )
            .where(F.col("jaccard_permille") >= threshold_permille)
        )
    else:
        # no candidate set: the shared-shingle equi-join bounds the pair
        # space to docs that overlap at all
        a, b = d.alias("a"), d.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.tid") == F.col("b.tid"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count("*").alias("inter"))
        )
    # sizes is one row per document — unbounded at corpus scale, so no
    # broadcast hint here either; AQE broadcasts it when it measures small
    sizes = d.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(inter * 1000 DIV (sza + szb - inter) AS BIGINT)").alias(
                "jaccard_permille"
            ),
        )
        .where(F.col("jaccard_permille") >= threshold_permille)
    )


def dup_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, component) for every id in ``pairs`` — near-dup clusters.

    Min-label propagation to a fixpoint: every node starts labelled with
    its own id; each round takes the min of its label and its neighbors'
    labels. Converges in ≤ diameter rounds to the exact minimum reachable
    id, so the label IS the cluster keeper (min doc_id) and every
    non-label member is the drop list. Deterministic → replayable by the
    oracle's recursive CTE.

    Scale shape: each round is one equi-join + one min-agg on the edge
    list (the standard distributed connected-components kernel, à la
    GraphX/Pregel). Labels are eagerly checkpointed per round — persist
    alone does NOT truncate the logical plan, and a self-referencing loop
    otherwise doubles the plan every round until analysis itself OOMs
    (observed at ~12 rounds). By default the checkpoint is executor-local
    (fast, lost with an executor); pass ``checkpoint_dir`` on a real
    cluster with flaky executors to get reliable fault-tolerant
    checkpoints instead. The only driver action per round is the O(1)
    convergence count.

    Raises ``RuntimeError`` if the loop hits ``max_iter`` without
    converging (a component with diameter > max_iter): returning the
    partial labels would silently disagree with the exact oracle, so
    non-convergence must surface at the source. Remedy: raise
    ``max_iter`` (rounds needed = max component diameter).
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    probe_seq = [0]  # pre-checkpoint plan evidence (tools.plan_probe doc)

    def _checkpoint(df: DataFrame) -> DataFrame:
        from ..tools import plan_probe

        plan_probe(f"components_ckpt{probe_seq[0]}", df)
        probe_seq[0] += 1
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = _checkpoint(fwd.union(rev))
    labels = _checkpoint(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    changed = -1
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nb_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nb_min"))
        )
        # carry the did-this-label-shrink flag in the frame itself: the
        # convergence check is then a count over the just-checkpointed
        # partitions instead of an extra new-vs-old join per round
        new_labels = _checkpoint(
            labels.join(nb_min, labels["id"] == nb_min["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["component"],
                    F.coalesce(F.col("nb_min"), labels["component"]),
                ).alias("component"),
                (F.coalesce(F.col("nb_min"), labels["component"])
                 < labels["component"]).cast("int").alias("chg"),
            )
        )
        changed = new_labels.where(F.col("chg") == 1).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter to at "
            "least the largest component's diameter"
        )
    global _last_component_rounds
    _last_component_rounds = rounds
    return labels.select(F.col("id").alias("doc_id"), "component")


# Telemetry for the most recent dup_components run: rounds executed until
# the fixpoint (including the final no-change confirmation round). The
# round count is a driver-side loop property, not a dataset property, so
# it is exposed here (and asserted in tests) rather than as an
# oracle-checkable column.
_last_component_rounds: int | None = None


def last_component_rounds() -> int | None:
    """Rounds the most recent ``dup_components`` call took to converge."""
    return _last_component_rounds


def dup_component_stats(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """(csize, n_components): the near-dup cluster size histogram.

    The scale-facing telemetry view of ``dup_components``: how many
    clusters of each size the pair graph induces. At 100 TB this is the
    number an operator actually watches (a single giant component means
    the LSH threshold is too loose; millions of size-2 components mean
    near-exact dupes dominate). Two hash aggregations over the label
    table — both shuffle one row per component / per size.
    """
    labels = dup_components(pairs, id_a=id_a, id_b=id_b)
    sizes = labels.groupBy("component").agg(F.count("*").alias("csize"))
    return sizes.groupBy("csize").agg(
        F.count("*").cast("long").alias("n_components")
    )


def simhash_fingerprints(
    spark: SparkSession, documents: DataFrame, bits: int = 30, n: int = 3
) -> DataFrame:
    """(doc_id, simhash) — sign-aggregated bit fingerprint over shingles.

    ONE aggregation pass: per doc, ``bits`` conditional sums (ones count
    per bit position) plus the shingle count; bit b of the fingerprint is
    set iff 2·ones_b > count — identical to the textbook Σ(±1) > 0 rule
    (Σ(±1) = 2·ones − count), but without materializing the doc×bits row
    explosion the two-level form shuffles. The shuffle carries one row
    per doc with ``bits`` small columns.
    """
    ids = doc_shingle_ids(documents, n)
    ones = ids.groupBy("doc_id").agg(
        F.count("*").alias("_cnt"),
        *[
            F.sum(F.expr(f"shiftright(tid, {b}) & 1")).alias(f"_o{b}")
            for b in range(bits)
        ],
    )
    fingerprint = None
    for b in range(bits):
        term = F.when(
            2 * F.col(f"_o{b}") > F.col("_cnt"),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return ones.select("doc_id", fingerprint.alias("simhash"))


def simhash_pairs(
    spark: SparkSession,
    documents: DataFrame,
    max_hamming: int = 6,
    bits: int = 30,
    n: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within a hamming ball.

    Local-scale impl is a self-join; the scale path would band the
    fingerprint into bit-chunks (pigeonhole: distance ≤ d ⇒ some chunk
    equal) and equi-join on chunks — same pattern as LSH banding.
    """
    fp = simhash_fingerprints(spark, documents, bits, n)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", F.expr("CAST(bit_count(ha ^ hb) AS INT)").alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_chunk_bounds(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(lo_bit, width) per pigeonhole chunk: (max_hamming+1) chunks cover the
    fingerprint, so hamming ≤ max_hamming forces at least one chunk equal."""
    n_chunks = max_hamming + 1
    return [
        (i * bits // n_chunks, (i + 1) * bits // n_chunks - i * bits // n_chunks)
        for i in range(n_chunks)
    ]


def simhash_pairs_banded(
    spark: SparkSession,
    documents: DataFrame,
    max_hamming: int = 6,
    bits: int = 30,
    n: int = 3,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) within the hamming ball — the scale path.

    Pigeonhole banding: split the fingerprint into (max_hamming+1) bit
    chunks; any pair within distance d ≤ max_hamming agrees on ≥1 chunk,
    so candidates come from an equi-join on (chunk_idx, chunk_value) —
    O(colliding docs), never the all-pairs theta join of
    ``simhash_pairs``. Exact recall (pigeonhole guarantees no misses),
    exact verify (bit_count on the carried fingerprints).

    Pass a persisted ``fingerprints`` frame to keep the chunk self-join
    from rebuilding the fingerprint aggregation once per branch.
    """
    fp = (
        fingerprints
        if fingerprints is not None
        else simhash_fingerprints(spark, documents, bits, n)
    )
    chunk_structs = [
        F.struct(
            F.lit(i).alias("ci"),
            F.expr(f"shiftright(simhash, {lo}) & {(1 << width) - 1}").alias("cv"),
        )
        for i, (lo, width) in enumerate(simhash_chunk_bounds(bits, max_hamming))
    ]
    chunks = fp.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("doc_id", "simhash", "c.ci", "c.cv")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "ci", "cv"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "ci", "cv"
    )
    return (
        a.join(b, ["ci", "cv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(ha ^ hb) AS INT)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def incremental_dedup(
    corpus: DataFrame,
    incoming: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold_permille: int = 350,
    corpus_bands: DataFrame | None = None,
    corpus_ids: DataFrame | None = None,
) -> DataFrame:
    """Flag each incoming doc as dup-of-corpus or new — the ingest shape.

    The daily-crawl scenario: an existing corpus has a precomputed MinHash
    band index (``minhash_bands`` — codes only, no text); a new batch
    probes it. Per incoming doc the result row is
    (doc_id, is_dup, match_id, match_permille): is_dup = 1 iff some corpus
    doc clears the exact-Jaccard threshold, match_* identify the best such
    match (highest permille, ties to the lowest corpus doc_id).

    Scale shape: candidates come from the incoming-vs-index equi-join on
    (band, bh) — the corpus is NEVER rescanned or self-joined; index and
    verify cost are both O(batch + collisions), so a 100 TB corpus costs
    only its (tiny, persistable) band index and the shingle-id lookup of
    the colliding docs. Pass ``corpus_bands``/``corpus_ids`` to reuse a
    persisted index instead of rebuilding it from text.
    """
    ids_c = corpus_ids if corpus_ids is not None else doc_shingle_ids(corpus, n)
    ids_i = doc_shingle_ids(incoming, n)
    bands_c = (
        corpus_bands
        if corpus_bands is not None
        else minhash_bands(corpus, k, rows_per_band, n, ids_df=ids_c)
    )
    bands_i = minhash_bands(incoming, k, rows_per_band, n, ids_df=ids_i)
    cand = (
        bands_i.select(F.col("doc_id").alias("doc_new"), "band", "bh")
        .join(bands_c.select(F.col("doc_id").alias("doc_old"), "band", "bh"),
              ["band", "bh"])
        .select("doc_new", "doc_old")
        .distinct()
    )
    return flag_incoming_candidates(
        cand, ids_c, ids_i, incoming, threshold_permille
    )


def flag_incoming_candidates(
    cand: DataFrame,
    ids_c: DataFrame,
    ids_i: DataFrame,
    incoming: DataFrame,
    threshold_permille: int = 350,
) -> DataFrame:
    """Exact-Jaccard verify + per-doc flag roll-up over a candidate set.

    The shared back half of the ingest-dedup path (in-memory and
    persisted-index variants): candidate-driven verify over packed per-doc
    id arrays (same r14 kernel as ngram_jaccard_pairs — one collect_list
    per side, one join per side, intersection as
    size(array_intersect(...)) in the JVM; sizes come free as
    size(array), and the inter >= 1 guard reproduces the earlier fan
    join's implicit drop of zero-overlap candidates), then best-match
    selection and the (doc_id, is_dup, match_id, match_permille) roll-up
    over the full incoming batch.
    """
    pk_i = packed_doc_ids(ids_i, out_col="_ti")
    pk_c = packed_doc_ids(ids_c, out_col="_tc")
    matched = (
        cand.join(pk_i.select(F.col("doc_id").alias("doc_new"), "_ti"), "doc_new")
        .join(pk_c.select(F.col("doc_id").alias("doc_old"), "_tc"), "doc_old")
        .select(
            "doc_new",
            "doc_old",
            F.size(F.array_intersect("_ti", "_tc")).alias("inter"),
            F.size("_ti").alias("sz_new"),
            F.size("_tc").alias("sz_old"),
        )
        .where(F.col("inter") >= 1)
        .select(
            "doc_new",
            "doc_old",
            F.expr(
                "CAST(inter * 1000 DIV (sz_new + sz_old - inter) AS BIGINT)"
            ).alias("jp"),
        )
        .where(F.col("jp") >= threshold_permille)
    )
    w = Window.partitionBy("doc_new").orderBy(F.col("jp").desc(), F.col("doc_old"))
    best = (
        matched.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc_new").alias("doc_id"),
            F.col("doc_old").alias("match_id"),
            F.col("jp").alias("match_permille"),
        )
    )
    return incoming.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.col("match_id").isNotNull().cast("int").alias("is_dup"),
        "match_id",
        "match_permille",
    )
