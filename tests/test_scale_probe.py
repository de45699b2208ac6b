"""The scale-probe/soak scripts' core paths, pinned in CI.

The full runs are manual per-round artifacts (BENCH_scale.json, SOAK.json,
SAWTOOTH.json); these tests keep the scripts from rotting between runs:
the synthetic generators must stay deterministic and fixture-shaped, and
the probe's candidate-measurement path must keep matching the operator
APIs it calls (a signature change fails here, not mid-probe)."""

from __future__ import annotations

import importlib.util
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _import(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scripts_import_cleanly():
    for name in ("scale_probe", "streaming_soak", "sawtooth_run"):
        mod = _import(name)
        assert callable(mod.main)


def test_gen_documents_deterministic_and_fixture_shaped(spark):
    sp = _import("scale_probe")
    a = sp.gen_documents(spark, 300)
    assert [f.name for f in a.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    rows = {r.doc_id: r for r in a.collect()}
    again = {r.doc_id: r for r in sp.gen_documents(spark, 300).collect()}
    assert rows == again  # hash-seeded: identical at every invocation
    # prefix-stability: the first 300 docs of a larger corpus are the
    # SAME docs (scale points measure growth, not different corpora)
    bigger = {
        r.doc_id: r
        for r in sp.gen_documents(spark, 600).where("doc_id < 300").collect()
    }
    assert rows == bigger
    # the boilerplate family exists and is near-identical: every 20th doc
    boiler = [rows[i].text.split() for i in range(0, 300, 20)]
    t0 = boiler[0]
    for t in boiler[1:]:
        same = sum(1 for x, y in zip(t0, t) if x == y)
        assert same >= 50  # <= ~3% drift per doc from the shared template


def test_gen_embeddings_shape_and_clusters(spark):
    sp = _import("scale_probe")
    df = sp.gen_embeddings(spark, 200)
    assert dict(df.dtypes) == {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    }
    r = df.agg(
        F.min(F.size("embedding")), F.max(F.size("embedding")),
        F.countDistinct("label"),
    ).collect()[0]
    assert r[0] == 64 and r[1] == 64 and r[2] == 25


def test_probe_candidate_path_matches_operator_api(spark):
    """The exact call chain probe_scale uses, at tiny n: bands built once,
    raw vs capped candidates from the SAME bands, verify + components."""
    from console_datagen_spark.operators import dedup as D
    from console_datagen_spark.operators.components_lss import (
        dup_components_lss,
        last_lss_rounds,
    )

    sp = _import("scale_probe")
    docs = sp.gen_documents(spark, 200).localCheckpoint(eager=True)
    ids = D.doc_shingle_ids(docs)
    bands = D.minhash_bands(docs, 8, 2, ids_df=ids).localCheckpoint(eager=True)
    raw = D._pairs_from_bands(bands).count()
    capped = D.lsh_candidate_pairs_capped(docs, bucket_cap=8, bands_df=bands)
    n_capped = capped.count()
    assert 0 < n_capped <= raw  # the cap can only remove candidates
    pairs = D.ngram_jaccard_pairs(
        docs, threshold_permille=350, candidates=capped, ids_df=ids
    )
    if pairs.limit(1).count():
        dup_components_lss(pairs).count()
        assert 1 <= last_lss_rounds() <= 16


def test_growth_exponent_math():
    sp = _import("scale_probe")
    assert sp._growth_exp(100, 1000, 1, 10) == 1.0
    assert sp._growth_exp(100, 10_000, 1, 10) == 2.0
    assert sp._growth_exp(0, 10, 1, 10) is None


def test_leg_exponents_catch_accelerating_curve():
    """The r8 lesson in miniature: an endpoint fit can read sub-linear
    while the last leg accelerates — per-leg exponents must expose it."""
    sp = _import("scale_probe")
    # endpoint 1x->10x looks like 0.93 while the 3->10 leg runs ~1.26
    vals = {1: 5.9, 3: 11.0, 10: 50.3}
    e = sp._leg_exps(vals)
    assert e["endpoint"] < 1.0
    assert e["legs"]["3->10"] > 1.2
    worst = sp._worst_material_leg(vals, e, floor_sec=2.0)
    assert worst is not None and worst > 1.2


def test_worst_material_leg_ignores_noise_floor():
    sp = _import("scale_probe")
    # both legs double per step but everything is sub-2s: noise, no gate
    vals = {1: 0.1, 3: 0.4, 10: 1.9}
    e = sp._leg_exps(vals)
    assert sp._worst_material_leg(vals, e, floor_sec=2.0) is None


def test_leg_exponents_tolerate_missing_scales():
    """The uncapped control is skipped past CONTROL_MAX_SCALE: its series
    has None at the top scale and the exponent math must not blow up."""
    sp = _import("scale_probe")
    vals = {1: 5.0, 3: 11.0, 10: 50.0, 30: None}
    e = sp._leg_exps(vals)
    assert set(e["legs"]) == {"1->3", "3->10"}
    assert e["endpoint"] is not None
    single = sp._leg_exps({1: 5.0, 3: None, 10: None, 30: None})
    assert single == {"endpoint": None, "legs": {}}


def test_write_sentinel_measures_and_cleans_up(spark):
    """The r13 disk-write sentinel (bench._run_sentinel_write, reused by
    the probe's per-leg gauge): returns a positive wall time and leaves
    no store behind — a stranded sentinel dir would feed the NEXT run's
    overwrite cost into the measurement."""
    import os

    from bench import SENTINEL_WRITE_PATH, _run_sentinel_write

    dt = _run_sentinel_write(spark)
    assert dt > 0
    assert not os.path.exists(SENTINEL_WRITE_PATH)


def test_probe_layout_records_write_sentinel(monkeypatch):
    """probe_layout / probe_layout_direct must carry the per-leg write
    ambient (VERDICT r12 #1: 'one sentinel per resource axis you
    blame') — pin the artifact key so a refactor can't silently drop
    the attribution field."""
    import inspect

    import scripts.scale_probe as sp

    for fn in (sp.probe_layout, sp.probe_layout_direct):
        src = inspect.getsource(fn)
        assert "sentinel_write_sec" in src, fn.__name__
