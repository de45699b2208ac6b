"""Independent-math pins for the privacy-release and KN-perplexity tier.

The oracle gate proves Spark == DuckDB; these tests prove the shared
spelling equals the MATH it claims: the dq_dp_noisy_release inverse CDF
is checked against a fractions.Fraction replay of the two-sided
geometric(1/2) distribution over exhaustive boundary neighborhoods, its
empirical pmf over the real md5 seed stream against the exact pmf, and
text_perplexity_kn's fixed-point cross-entropy against an independent
float computation from raw DuckDB counts.
"""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

import duckdb
import pytest

from console_datagen_spark.plans import get_query

TWO60 = 1 << 60


def _z_sql_formula(u: int) -> int:
    """Python replay of the query's noise expression: bit-length spelled
    like LENGTH(bin(x)) (bin(0) = '0', length 1)."""

    def blen(x: int) -> int:
        return len(bin(x)[2:]) if x > 0 else 1

    neg = min(60, max(0, 61 - blen(3 * u)))
    pos = min(60, max(0, 61 - blen(3 * (TWO60 - 1 - u))))
    return pos - neg


def _z_reference(u: int) -> int:
    """The query's DISTRIBUTION spec in exact rationals, independent of
    the bit-length trick: negative tail depth = max k in 1..60 with
    u/2^60 < (1/3)(1/2)^(k-1) (the two-sided geometric tail CDF
    P(Z <= -k)), positive side by the reflection u -> 2^60-1-u. The
    reflection makes the lattice pmf EXACTLY symmetric — each tail
    boundary holds ceil(2^(61-k)/3) lattice points, within 2^-60 of the
    real-valued CDF per boundary (the real CDF convention would shave
    one u value off each positive boundary; symmetry is the better
    property to pin, and is what the SQL implements)."""

    def tail_depth(x: int) -> int:
        d = 0
        for k in range(1, 61):
            if Fraction(x, TWO60) < Fraction(1, 3) * Fraction(1, 2) ** (k - 1):
                d = k
            else:
                break
        return d

    return tail_depth(TWO60 - 1 - u) - tail_depth(u)


def test_dp_inverse_cdf_matches_rational_reference():
    """Exhaustive agreement on every CDF boundary neighborhood: for each
    k the boundary U* = 2^60/(3*2^(k-1)) (and its positive-side mirror),
    check U* - 2 .. U* + 2. Plus the degenerate edges and a coarse
    sweep. Any off-by-one in the 3U < 2^(61-k) comparison flips one of
    these."""
    probes = {0, 1, 2, TWO60 - 1, TWO60 - 2, TWO60 // 2, TWO60 // 3}
    for k in range(1, 62):
        b = (1 << (61 - k)) // 3 if k <= 61 else 0
        for d in (-2, -1, 0, 1, 2):
            if 0 <= b + d < TWO60:
                probes.add(b + d)
                probes.add(TWO60 - 1 - (b + d))
    probes.update(range(0, TWO60, TWO60 // 997))
    for u in sorted(probes):
        assert _z_sql_formula(u) == _z_reference(u), u


def test_dp_noise_empirical_pmf_matches_exact():
    """Over 30k md5-seeded uniforms (the query's actual seed stream
    shape), the empirical pmf is within 4 sigma of the exact two-sided
    geometric(1/2): P(0)=1/3, P(+-k)=(1/3)(1/2)^k."""
    n = 30_000
    counts: dict[int, int] = {}
    for i in range(n):
        h = hashlib.md5(f"dp1:{i}:BUILDING".encode()).hexdigest()
        u = int(h[:15], 16)
        z = _z_sql_formula(u)
        counts[z] = counts.get(z, 0) + 1
    for k in range(-3, 4):
        p = Fraction(1, 3) * Fraction(1, 2) ** abs(k)
        exp = float(p) * n
        sd = math.sqrt(exp * (1 - float(p)))
        assert abs(counts.get(k, 0) - exp) < 4 * sd, (k, counts.get(k))


def test_dp_release_clamps_and_totals(duck):
    """The released histogram never goes negative, noise == released -
    true except at the clamp, and both engines produce the identical
    release (DuckDB side vs the Python replay of the formula)."""
    spec = get_query("dq_dp_noisy_release")
    rows = duck.execute(spec.oracle).fetchall()
    assert rows, "empty release"
    for nat, seg, n_true, noise, n_released, abs_err in rows:
        assert n_released >= 0
        assert abs_err == abs(noise)
        assert n_released == max(n_true + noise, 0)
        h = hashlib.md5(f"dp1:{nat}:{seg}".encode()).hexdigest()
        assert noise == _z_sql_formula(int(h[:15], 16))


def _kn_counts(con: duckdb.DuckDBPyConnection):
    rows = con.execute(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l, "
        "CASE WHEN (('0x' || substr(md5('v1:' || "
        "CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 1000) < 800 "
        "THEN 'train' ELSE 'val' END AS split "
        "FROM documents WHERE len(string_split(text, ' ')) >= 2) "
        "SELECT doc_id, split, l FROM toks"
    ).fetchall()
    c2: dict[tuple[str, str], int] = {}
    val_docs: dict[int, list[tuple[str, str]]] = {}
    for doc_id, split, words in rows:
        pairs = list(zip(words[:-1], words[1:]))
        if split == "train":
            for p in pairs:
                c2[p] = c2.get(p, 0) + 1
        else:
            val_docs[doc_id] = pairs
    return c2, val_docs


def test_kn_perplexity_matches_float_reference(duck):
    """text_perplexity_kn's fixed-point milli-bits agree with an
    independent float cross-entropy computed from raw counts under the
    query's pinned backoff conventions, within the documented intlog
    error (< 3 units of 2^-10 bits per term -> < 4 mbits per doc after
    averaging, plus 1 for the floor)."""
    c2, val_docs = _kn_counts(duck)
    cv: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in c2.items():
        cv[v] = cv.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    nt = len(c2)
    want: dict[int, float] = {}
    for doc_id, pairs in val_docs.items():
        bits = 0.0
        for v, w in pairs:
            if v not in cv:
                num, den = 1, 4 * nt
            else:
                num = max(
                    max(4 * c2.get((v, w), 0) - 3, 0) * nt
                    + 3 * n1v[v] * n1w.get(w, 0),
                    1,
                )
                den = 4 * cv[v] * nt
            bits += math.log2(den / num)
        want[doc_id] = bits * 1000 / len(pairs)
    spec = get_query("text_perplexity_kn")
    got = duck.execute(spec.oracle).fetchall()
    assert len(got) == len(val_docs)
    for doc_id, n_bigrams, ce_mbits, bucket in got:
        assert n_bigrams == len(val_docs[doc_id])
        assert abs(ce_mbits - want[doc_id]) <= 5, (
            doc_id,
            ce_mbits,
            want[doc_id],
        )
    # terciles are monotone in the score: every head score <= every
    # middle score <= every tail score
    by_bucket: dict[str, list[int]] = {"head": [], "middle": [], "tail": []}
    for _, _, ce, bucket in got:
        by_bucket[bucket].append(ce)
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


@pytest.mark.parametrize("name", ["dq_dp_noisy_release", "text_perplexity_kn"])
def test_new_queries_run_on_spark(spark, sf_dir, name):
    spec = get_query(name)
    assert spec.spark(spark, sf_dir).count() > 0
