"""Degenerate-fixture sweep: every registered query must RUN (not crash)
on hostile-but-legal data — empty/punctuation-only/NULL text, single-char
docs, zero and empty embedding vectors, NULL metadata.

Round-6/7 postmortems found two latent job-killers of exactly this class
(x_bigram_lm_score's negative slice length on zero-token docs,
x_bm25_topk's TypeError on an empty corpus); this sweep makes the whole
class a standing regression.  It asserts execution, not oracle parity —
the oracle gates run on the shipped fixtures.
"""

from __future__ import annotations

import os

import pytest
from conftest import SF_SMOKE

from query_skyline_qos_flink_spark.plans import corpus
from query_skyline_qos_flink_spark.plans import (  # noqa: F401  (register)
    pipeline,
    relational,
    streaming_replay,
)

_DEGEN_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "web", 0),                      # empty text
    (2, "!!! ... ???", "en", "web", 11),          # punctuation-only (0 tokens)
    (3, "   \t  \n ", "en", "web", 8),            # whitespace-only
    (4, "x", "en", "web", 1),                     # single char (< any window)
    (5, None, "en", "web", 0),                    # NULL text
    (6, "one", None, None, 3),                    # NULL lang/source
    (7, "the quick brown fox visits https://ex.com and a@b.co today "
        "with plenty of ordinary words to keep shingles alive", "en",
        "web", 113),
    (8, "the quick brown fox visits https://ex.com and a@b.co today "
        "with plenty of ordinary words to keep shingles alive", "en",
        "news", 113),                             # exact dup of 7
]

_DIM = 64


def _degen_embeddings():
    normal = [0.1] * _DIM
    return [
        (1, [0.0] * _DIM, 0),       # zero vector (zero norm)
        (2, normal, 1),
        (3, [-v for v in normal], 1),
        (4, None, 2),               # NULL vector
        (5, [], 2),                 # empty array
        (6, [float(i) / _DIM for i in range(_DIM)], 3),
        (7, [float("nan")] + [0.2] * (_DIM - 1), 3),   # NaN component
        (8, [0.1] * (_DIM + 16), 4),    # ragged: longer than the corpus dim
        (9, [0.1] * (_DIM // 2), 4),    # ragged: shorter (prefix of normal)
    ]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("degen"))
    for name in os.listdir(SF_SMOKE):
        if name not in ("documents.parquet", "embeddings.parquet"):
            os.symlink(os.path.join(SF_SMOKE, name), os.path.join(base, name))
    spark.createDataFrame(
        _DEGEN_DOCS,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(os.path.join(base, "documents.parquet"))
    spark.createDataFrame(
        _degen_embeddings(), "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(os.path.join(base, "embeddings.parquet"))
    return base


# documents/embeddings consumers are the class under test; the relational/
# skyline families read the untouched (symlinked) tables and already run
# at this sf in test_corpus, so skip them to keep the sweep fast.
def _targets():
    keep_prefixes = ("x_", "e1", "e2", "e3", "s21", "s32")
    return sorted(n for n in corpus.REGISTRY if n.startswith(keep_prefixes))


@pytest.mark.parametrize("name", _targets())
def test_query_survives_degenerate_fixtures(spark, degen_dir, name):
    df = corpus.REGISTRY[name].fn(spark, degen_dir)
    rows = df.collect()
    assert rows is not None  # executed without a job failure


_VECTOR_PARITY = [
    "e2_knn_bruteforce", "x_knn_int8", "x_knn_int8_rerank",
    "x_ann_bucketed", "x_ann_multiprobe", "x_ann_ivf", "x_ann_blocked",
    "x_cosine_neardup", "x_semantic_dedup", "x_embed_quantize8",
]


@pytest.mark.parametrize("name", _VECTOR_PARITY)
def test_vector_query_ragged_parity_with_duckdb(spark, degen_dir, name):
    """The ragged-vector drop rule must hold CROSS-ENGINE, not just not
    crash: every pairwise vector query produces the same row set as its
    DuckDB oracle on the degenerate fixture (which now carries longer-
    and shorter-than-corpus vectors).  Without the len-equality
    predicates this diverges silently — Spark's zip_with NULL-pads while
    DuckDB's zip-unnest sums over the overlap."""
    import duckdb

    sdf = corpus.REGISTRY[name].fn(spark, degen_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem"):
        p = os.path.join(degen_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table: a directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    orows = sorted(tuple(r) for r in con.execute(corpus.REGISTRY[name].oracle).fetchall())
    assert srows == orows
