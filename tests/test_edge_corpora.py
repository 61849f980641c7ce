"""Degenerate-corpus edge cases for the retrieval/LM scoring queries.

Round-6 advice: x_bigram_lm_score crashed on any document whose text
tokenizes to an empty array (Spark's slice() rejects negative lengths
where DuckDB's list slicing tolerates them), and x_bm25_topk raised
TypeError at plan-construction time on an empty documents table instead
of degrading to the contract-schema empty result.  Both are latent on the
shipped fixtures (no zero-token docs), so they get their own corpora here.
"""

from __future__ import annotations

from query_skyline_qos_flink_spark.plans import corpus
from query_skyline_qos_flink_spark.plans import pipeline, relational  # noqa: F401  (registers)

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bigram_lm_score_tolerates_zero_token_docs(spark, tmp_path):
    sf_dir = _write_documents(
        spark,
        tmp_path,
        [
            (1, "", "en", "web", 0),                   # empty text
            (2, "!!! ... ???", "en", "web", 11),       # punctuation-only
            (3, "one", "en", "web", 3),                # single token, no bigram
            (4, "spark merges query plans quickly", "en", "web", 32),
            (5, "spark merges query plans quickly", "en", "web", 32),
        ],
    )
    out = corpus.REGISTRY["x_bigram_lm_score"].fn(spark, sf_dir).collect()
    got = {r.doc_id: r for r in out}
    # zero-bigram docs contribute no scored rows but must not fail the job
    assert set(got) == {4, 5}
    assert got[4].n_bigrams == 4 and got[4].avg_logp == got[5].avg_logp


def test_bm25_topk_empty_corpus_returns_contract_schema(spark, tmp_path):
    sf_dir = _write_documents(spark, tmp_path, [])
    df = corpus.REGISTRY["x_bm25_topk"].fn(spark, sf_dir)
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == ["doc_id", "n_terms", "score_r", "rnk"]


def test_bm25_topk_no_term_hits_returns_empty_lazily(spark, tmp_path):
    sf_dir = _write_documents(
        spark, tmp_path, [(1, "nothing matching here", "en", "web", 21)]
    )
    assert corpus.REGISTRY["x_bm25_topk"].fn(spark, sf_dir).collect() == []


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_event_funnel_stalling_users_emit_minus_one(spark, tmp_path):
    """Regression for the funnel's stall path (zero coverage on shipped
    fixtures, where every user converts): a view-only user and a
    view+click user must surface with -1 later steps, a click-before-view
    user must not count the early click, and a user with no view at all
    must not appear."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), 1, "view", 0.0, "{}"), (2, t(1), 1, "click", 0.0, "{}"),
        (3, t(2), 1, "purchase", 0.0, "{}"),          # full funnel
        (4, t(0), 2, "view", 0.0, "{}"),              # stalls after view
        (5, t(0), 3, "view", 0.0, "{}"), (6, t(1), 3, "click", 0.0, "{}"),
        (7, t(5), 4, "click", 0.0, "{}"), (8, t(6), 4, "view", 0.0, "{}"),
        (9, t(7), 4, "click", 0.0, "{}"),             # early click ignored
        (10, t(0), 5, "purchase", 0.0, "{}"),         # never views
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us)
        for r in corpus.REGISTRY["r24_event_funnel"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1][2] > out[1][1] > out[1][0] > 0
    assert out[2][1] == -1 and out[2][2] == -1
    assert out[3][2] == -1 and out[3][1] > out[3][0]
    # user 4: first view at t(6); only the t(7) click counts
    assert out[4][1] > out[4][0] and out[4][2] == -1


def test_char_entropy_single_char_doc_is_positive_zero(spark, tmp_path):
    """Signed-zero parity: a single-distinct-char doc has entropy exactly
    0; the emitted value must be +0.0 (DuckDB's round keeps -0.0 without
    the abs() pin, and the comparator's repr-hash distinguishes them)."""
    import math

    sf_dir = _write_documents(
        spark, tmp_path, [(1, "xxxxxx", "en", "web", 6)]
    )
    row = corpus.REGISTRY["x_char_entropy"].fn(spark, sf_dir).collect()[0]
    assert row.entropy_r == 0.0 and math.copysign(1.0, row.entropy_r) == 1.0
