"""Pipeline-tier pins that the fixture corpus can't exercise.

VERDICT r13 #6: the r13 COALESCE pin in `pipeline_chat_template`
protects a NULL-text divergence (Spark's concat nulls the whole turn,
DuckDB's concat skips NULL args), but its regression surface rode on
fixture luck — the sf tables carry no NULL text. These tests plant NULL
text rows in BOTH engines and assert the dialects render identically,
including the exact '<|role|><|end|>' empty-turn bytes.
"""

from __future__ import annotations

import duckdb
import pytest

from console_datagen_spark.plans.pipeline import _chat_sql


@pytest.fixture()
def null_text_docs(spark):
    """A synthetic documents table where doc 3 (an assistant turn of
    conversation 0) and doc 12 (a user turn of conversation 1) have
    NULL text; registered as `documents` in a fresh DuckDB too."""
    rows = []
    for doc_id in range(24):
        text = f"hello world {doc_id}"
        if doc_id in (3, 12):
            text = None
        rows.append((doc_id, text, "en", "synthetic", len(text or "")))
    sdf = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    )
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    try:
        yield con
    finally:
        con.close()
        spark.catalog.dropTempView("documents")


def test_chat_template_null_text_renders_identically(spark, null_text_docs):
    got_spark = [
        tuple(r) for r in spark.sql(_chat_sql("spark")).collect()
    ]
    got_duck = [
        tuple(r) for r in null_text_docs.execute(_chat_sql("duck")).fetchall()
    ]
    assert got_spark == got_duck
    assert len(got_spark) == 3  # 24 docs / 8 turns


def test_chat_template_null_turn_renders_empty_marker(spark, null_text_docs):
    """The NULL turn must render as '<|role|><|end|>' (empty payload),
    NOT vanish from the conversation: rebuild conversation 0's rendering
    by hand and compare md5s on both engines."""
    import hashlib

    parts = []
    for doc_id in range(8):
        role = "user" if doc_id % 2 == 0 else "assistant"
        text = "" if doc_id == 3 else f"hello world {doc_id}"
        parts.append(f"<|{role}|>{text}<|end|>")
    want = hashlib.md5("".join(parts).encode()).hexdigest()

    got = {
        r["conv_id"]: r["template_md5"]
        for r in spark.sql(_chat_sql("spark")).collect()
    }
    assert got[0] == want
    duck_got = dict(
        null_text_docs.execute(
            "SELECT conv_id, template_md5 FROM (" + _chat_sql("duck") + ")"
        ).fetchall()
    )
    assert duck_got[0] == want
    # a control conversation without NULLs also matches across engines
    assert got[2] == duck_got[2]
