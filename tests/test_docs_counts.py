"""Registry-count drift guard (VERDICT r9 'What's wrong' #2 / Next #5).

Every registry count the docs carry must equal ``len(all_queries())`` —
a new query registered without rerunning ``scripts/gen_queries_doc.py``
fails here instead of shipping four disagreeing numbers.
"""

import os
import re

from console_datagen_spark.plans import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(fname: str) -> str:
    with open(os.path.join(REPO, fname)) as f:
        return f.read()


def test_docs_counts_match_registry():
    qs = all_queries()
    n = len(qs)
    n_hash = sum(1 for s in qs.values() if s.oracle)

    readme = _read("README.md")
    assert f"{n} declared queries" in readme
    assert f"({n_hash} hash-checked" in readme
    assert f"`queries()` ({n} callables)" in readme
    assert f"`oracle_sql()` ({n_hash} DuckDB oracles)" in readme

    survey = _read("SURVEY.md")
    assert f"Registry at {n} queries / {n_hash} hash-certified" in survey

    queries_md = _read("QUERIES.md")
    assert f"Totals: **{n} queries**, {n_hash} hash-certified" in queries_md
    # one table row per registered query
    assert len(re.findall(r"^\| \d+ \| `", queries_md, re.M)) == n


def _parse_bench_phrase(survey_text: str):
    """Parse (total_sec, n_queries, shuffle_sentinel_sec|None) from the
    SURVEY.md bench phrase written by scripts/gen_queries_doc.sync_counts."""
    m = re.search(
        r"headline bench ~(\d+(?:\.\d+)?) s total for\s*\n?(\d+) queries"
        r"(?: under a (\d+(?:\.\d+)?) s shuffle sentinel)?",
        survey_text,
    )
    assert m, "SURVEY.md bench phrase missing"
    return (
        float(m.group(1)),
        int(m.group(2)),
        float(m.group(3)) if m.group(3) else None,
    )


def _bench_doc_consistent(doc_total, doc_n, doc_sent, bench) -> bool:
    """The structural drift-guard compare (VERDICT r13 'Next round' #1).

    Raw wall-clock totals swing 30-50% with box ambient (measured across
    r12/r13 builder-vs-driver refreshes of IDENTICAL code), so no fixed
    raw tolerance can both catch real drift and survive a third-party
    bench refresh. Instead compare SENTINEL-NORMALIZED totals
    (total / shuffle-sentinel): ambient load moves numerator and
    denominator together, so a driver refresh under different ambient
    stays green while a genuinely changed registry (query count) or a
    normalized-regime shift (>35%) still fails.
    """
    if doc_n != len(bench["queries"]):
        return False
    art_sent = bench.get("sentinel_shuffle_sec")
    if doc_sent and art_sent:
        doc_norm = doc_total / doc_sent
        art_norm = bench["value"] / art_sent
        return abs(doc_norm - art_norm) <= 0.35 * art_norm
    # pre-sentinel artifacts: fall back to the old raw-relative compare
    return abs(doc_total - bench["value"]) <= 0.15 * bench["value"]


def test_bench_headline_resolves_and_doc_matches_artifact():
    """SURVEY's bench figure derives from the committed BENCH_full.json
    (the '82 queries for an 80-entry artifact' drift class), compared
    sentinel-normalized so ambient swings cannot redden the suite."""
    import json

    bench_path = os.path.join(REPO, "BENCH_full.json")
    if not os.path.exists(bench_path):
        return
    with open(bench_path) as f:
        bench = json.load(f)
    doc_total, doc_n, doc_sent = _parse_bench_phrase(_read("SURVEY.md"))
    assert doc_sent is not None, (
        "SURVEY bench phrase lacks the shuffle-sentinel pin; re-run "
        "scripts/gen_queries_doc.py"
    )
    assert _bench_doc_consistent(doc_total, doc_n, doc_sent, bench)


def test_bench_guard_survives_simulated_driver_refresh():
    """VERDICT r13 #1 'done' criterion: the guard must stay green after a
    driver re-runs bench.py under DIFFERENT ambient and drops the artifact
    in without re-syncing docs. Simulate refreshes at 0.6x-1.7x ambient
    (the measured r12/r13 swing range was ~0.47x-1.6x on identical code):
    every query time AND the sentinel scale together, docs stay stale."""
    import json

    bench_path = os.path.join(REPO, "BENCH_full.json")
    if not os.path.exists(bench_path):
        return
    with open(bench_path) as f:
        bench = json.load(f)
    if not bench.get("sentinel_shuffle_sec"):
        return
    doc_total, doc_n, doc_sent = _parse_bench_phrase(_read("SURVEY.md"))
    for ambient in (0.6, 0.8, 1.3, 1.7):
        refreshed = dict(bench)
        refreshed["value"] = round(bench["value"] * ambient, 3)
        refreshed["sentinel_shuffle_sec"] = round(
            bench["sentinel_shuffle_sec"] * ambient, 3
        )
        assert _bench_doc_consistent(doc_total, doc_n, doc_sent, refreshed), (
            f"guard reddened by a pure-ambient {ambient}x refresh"
        )
    # ...while a REAL change still fails: a registry that grew a query
    grown = dict(bench)
    grown["queries"] = dict(bench["queries"], __new_query__=[1.0])
    assert not _bench_doc_consistent(doc_total, doc_n, doc_sent, grown)
    # ...and a normalized-regime shift (2x slower at the SAME sentinel)
    slower = dict(bench)
    slower["value"] = bench["value"] * 2.0
    assert not _bench_doc_consistent(doc_total, doc_n, doc_sent, slower)
