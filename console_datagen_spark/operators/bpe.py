"""BPE merge-rule training — distributed tokenizer vocab induction.

Classic byte-pair encoding training (Sennrich et al. 2016): represent each
distinct word as a character-symbol sequence; each round counts adjacent
symbol pairs weighted by word frequency, picks the most frequent pair
(deterministic tie-break: count desc, then left/right lexicographic), and
merges its leftmost non-overlapping occurrences in every word. The merge
table IS the tokenizer.

Scale shape: the state is the DISTINCT-word table (vocab-bound, not
corpus-bound — the one groupBy over the corpus happens once, up front);
each round is one explode + one hash agg over that table plus an O(1)
driver collect of the single argmax row (same class as the k-means loop's
convergence count). The merge itself is a map-side left-fold expression —
no shuffle.

The fold is expressed identically on both engines (string-accumulator
left fold seeded with the first symbol), so the DuckDB oracle replays the
rounds bit-for-bit: symbols never contain spaces (they come from
space-split tokens), which makes the space-delimited accumulator a
faithful list encoding, and a just-merged symbol can never re-merge in
the same round (l+r == l would need r = '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def word_freqs(documents: DataFrame) -> DataFrame:
    """(word, freq) — the distinct-word table BPE iterates over."""
    return (
        documents.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    return words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )


def _adjacent_pairs(state: DataFrame) -> DataFrame:
    """(left, right, cnt) — freq-weighted adjacent symbol pair counts."""
    pairs = state.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS left, syms[i] AS right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("freq").alias("cnt"))


def _merge_expr(left: str, right: str) -> str:
    """Left-fold merge of adjacent (left, right) into one symbol.

    String accumulator = symbols joined by spaces; seed = first symbol.
    Step: if the accumulator's last symbol is `left` and the next symbol
    is `right`, replace that last symbol with the merged token, else
    append. SQL-literal quoting: symbols come from fixture tokens (no
    quotes), but escape single quotes anyway.
    """
    l = left.replace("'", "''")
    r = right.replace("'", "''")
    lr = (left + right).replace("'", "''")
    return (
        "CASE WHEN size(syms) = 0 THEN syms ELSE split("
        "aggregate(slice(syms, 2, size(syms) - 1), syms[0], (acc, x) -> "
        f"CASE WHEN x = '{r}' AND (acc = '{l}' OR substring(acc, -{len(left) + 1}) = ' {l}') "
        f"THEN concat(substring(acc, 1, length(acc) - {len(left)}), '{lr}') "
        "ELSE concat(acc, ' ', x) END"
        "), ' ') END"
    )


def bpe_train(documents: DataFrame, rounds: int = 3) -> list[tuple]:
    """Train ``rounds`` BPE merges; returns [(round, left, right, cnt)].

    Driver-side loop: one 1-row collect per round (the argmax pair) — the
    merge rule must be known to build the next round's fold expression,
    exactly like k-means centroids feed the next assignment. The word
    state stays distributed throughout.
    """
    state = _init_symbols(word_freqs(documents))
    merges: list[tuple] = []
    for rnd in range(1, rounds + 1):
        best = (
            _adjacent_pairs(state)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rnd, b["left"], b["right"], b["cnt"]))
        state = state.select(
            "word", "freq", F.expr(_merge_expr(b["left"], b["right"])).alias("syms")
        )
        # truncate the growing fold-expression lineage: each round's plan
        # otherwise nests the previous rounds' aggregates
        state = state.localCheckpoint(eager=False)
    return merges


def bpe_merge_table(documents: DataFrame, rounds: int = 3) -> DataFrame:
    """The merge rules as a DataFrame (round, left, right, pair_count)."""
    spark = documents.sparkSession
    rows = bpe_train(documents, rounds)
    return spark.createDataFrame(
        rows, "round INT, left STRING, right STRING, pair_count LONG"
    )


_FOLD_MERGE = (
    # left-fold with a dynamic (left, right) rule carried as columns: the
    # accumulator's last symbol is `left` iff acc equals it or ends with
    # ' ' || left (symbols never contain spaces, so the delimiter test is
    # exact); merging replaces that suffix with left || right
    "split(aggregate(slice(syms, 2, size(syms) - 1), syms[0], (acc, x) -> "
    "CASE WHEN x = right AND (acc = left "
    "          OR substring(acc, -(length(left) + 1)) = concat(' ', left)) "
    "THEN concat(substring(acc, 1, length(acc) - length(left)), left, right) "
    "ELSE concat(acc, ' ', x) END), ' ')"
)


def _bpe_rounds(
    documents: DataFrame, rounds: int
) -> tuple[list[DataFrame], DataFrame]:
    """(per-round 1-row merge frames, final symbol state) — shared by the
    merge-table and tokenize/compression plans."""
    state = _init_symbols(word_freqs(documents))
    outs = []
    for rnd in range(1, rounds + 1):
        best = (
            _adjacent_pairs(state)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
        )
        outs.append(
            best.select(
                F.lit(rnd).alias("round"),
                "left",
                "right",
                F.col("cnt").alias("pair_count"),
            )
        )
        state = (
            state.crossJoin(F.broadcast(best))
            .select("word", "freq", F.expr(_FOLD_MERGE).alias("syms"))
        )
    return outs, state


def bpe_merges_plan(documents: DataFrame, rounds: int = 3) -> DataFrame:
    """(round, left, right, pair_count) — the merge table as ONE plan.

    Declarative variant of ``bpe_train``: each round's argmax pair is a
    1-row sorted-limit frame that is broadcast back into the next round's
    fold expression as columns, so NO driver action happens at all — the
    whole ``rounds``-deep recurrence is a single Catalyst plan the oracle
    replays CTE-for-CTE. Each round re-derives the previous state (the
    plan is a tree, not a DAG), so cost grows 2^rounds — right for the
    small fixed merge counts the registered query certifies; production
    vocab induction uses ``bpe_train`` (checkpointed loop, linear cost).
    """
    outs, _ = _bpe_rounds(documents, rounds)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def bpe_compression_by_lang(documents: DataFrame, rounds: int = 3) -> DataFrame:
    """(lang, total_chars, total_syms, compression_permille) — the trained
    merges APPLIED: every doc's tokens re-counted under the final symbol
    state. The gauge a tokenizer team actually watches: how much of the
    corpus the first ``rounds`` merges compress, per language (merges
    trained on one dominant language compress others less).

    Plan shape: corpus tokens equi-join the (vocab-bound) final state on
    word — the per-doc explode is map-side, the join key is the word
    string, and AQE broadcasts the vocab side when it measures small.
    """
    _, state = _bpe_rounds(documents, rounds)
    vocab = state.select("word", F.size("syms").alias("n_syms"))
    occ = documents.select(
        "lang", F.explode(tokens("text")).alias("word")
    ).where(F.col("word") != "")
    return (
        occ.join(vocab, "word")
        .groupBy("lang")
        .agg(
            F.sum(F.length("word")).alias("total_chars"),
            F.sum("n_syms").alias("total_syms"),
            F.expr(
                "CAST(SUM(n_syms) * 1000 DIV SUM(length(word)) AS BIGINT)"
            ).alias("compression_permille"),
        )
        .orderBy("lang")
    )
