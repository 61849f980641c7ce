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
from query_skyline_qos_flink_spark.plans import pipeline  # noqa: F401  (registers)

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
