"""Int8 embedding quantization — the memory/bandwidth scale path for
similarity search.

Production vector pipelines quantize float32 embeddings to int8 before
indexing (4x smaller vectors on the wire and in cache, integer SIMD
distance kernels); recall loss is recovered by an exact float rerank of
the short candidate list.  This module implements the symmetric GLOBAL
variant — one corpus-wide scale, so code-space distances are comparable
across vectors — with arithmetic chosen to be bit-exact reproducible in
the DuckDB oracle:

* ``maxabs`` = max over all vectors of max(|x_i|) as double — a pure max
  (no summation), exact;
* code_i = clamp(floor(double(x_i) * 127.0 / maxabs), -127, 127) — two
  IEEE double ops in a fixed order, then an exact floor; the clamp only
  fires on the 1-ulp-under -127 edge;
* every downstream statistic and distance on codes is 64-bit integer
  math — exact in any engine.

All plan shapes are scan-side expressions plus one broadcast of a 1-row
aggregate (the scale): no Python in the hot path, no shuffle beyond the
final per-query top-k.  At 100 TB the codes column is the thing you
persist; ``with_int8_codes`` is the writer-side pass.

No reference counterpart (the Flink reference has no vector surface —
LLM-pipeline extension per the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_D = "double"

# fixed int8 symmetric range; -128 is deliberately unused (symmetric
# quantizers drop it so negation is closed, matching faiss/SQ8 practice)
INT8_MAX = 127


def corpus_maxabs(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """1-row DataFrame with the corpus-wide max |component| (``__maxabs``).

    A pure max-of-max — exact, order-insensitive, map-side combinable."""
    return df.where(F.col(vec_col).isNotNull()).agg(
        F.max(
            F.expr(
                f"array_max(transform(`{vec_col}`, x -> abs(CAST(x AS DOUBLE))))"
            )
        ).alias("__maxabs")
    )


def with_int8_codes(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q8"
) -> DataFrame:
    """Attach symmetric-int8 codes (``array<bigint>`` in [-127, 127]) under
    the corpus-global scale.  The scale rides in as a broadcast 1-row cross
    join, so the whole pass stays declarative (Catalyst sees one scan +
    one tiny build side; no driver action, no collect).

    Validity domain (engine policy, mirrored in the oracles' predicate):
    NULL/empty/NaN-bearing vectors are EXCLUDED — from the scale AND from
    the output.  Quantization is undefined for them, and they are not
    merely self-harming: one NaN anywhere poisons ``max(abs(...))`` into
    NaN, which silently zeroed every vector's codes before this filter
    (found by the ragged/NaN cross-engine parity sweep)."""
    from .similarity import valid_vectors

    df = valid_vectors(df, vec_col)
    scale = corpus_maxabs(df, vec_col)
    code = F.expr(
        f"transform(`{vec_col}`, x -> greatest(CAST({-INT8_MAX} AS BIGINT), "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {float(INT8_MAX)!r}D / __maxabs) "
        "AS BIGINT)))"
    )
    zeros = F.expr(f"transform(`{vec_col}`, x -> CAST(0 AS BIGINT))")
    return (
        df.crossJoin(F.broadcast(scale))
        .withColumn(out_col, F.when(F.col("__maxabs") > 0, code).otherwise(zeros))
        .drop("__maxabs")
    )


def int8_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector quantization accounting: dims, saturated components
    (|code| == 127, i.e. the corpus-max carriers), code sum, and integer
    squared norm.  Everything after the two-op quantization is 64-bit
    integer math — oracle-exact."""
    coded = with_int8_codes(df, vec_col)
    q8 = F.col("q8")
    return coded.select(
        F.col(id_col),
        F.size(q8).cast("bigint").alias("n_dims"),
        F.expr(f"CAST(size(filter(q8, c -> abs(c) = {INT8_MAX})) AS BIGINT)").alias(
            "n_sat"
        ),
        F.expr("aggregate(q8, CAST(0 AS BIGINT), (a, c) -> a + c)").alias("sum_code"),
        F.expr("aggregate(q8, CAST(0 AS BIGINT), (a, c) -> a + c * c)").alias(
            "l2sq_code"
        ),
    )


def knn_int8(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query by exact integer squared L2 over the int8
    codes (self excluded; ties -> smallest neighbor id).  Output: q_id,
    n_id, rnk, dist (the integer code-space distance).

    This is the coarse stage of a quantized retrieval stack — at scale the
    codes are 4x smaller than float32 on the wire and the distance kernel
    is integer-only; chain ``knn_exact_fold`` over the survivors for the
    float rerank stage.  Both sides are quantized under the SAME corpus
    scale (taken from ``df``), so code distances are comparable."""
    coded = with_int8_codes(df, vec_col)
    q_ids = query_df.select(F.col(id_col).alias("q_id"))
    q = (
        coded.join(F.broadcast(q_ids), coded[id_col] == q_ids["q_id"])
        .select("q_id", F.col("q8").alias("__qq8"))
    )
    pairs = (
        coded.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("n_id"),
            F.expr(
                "aggregate(zip_with(__qq8, q8, (a, b) -> (a - b) * (a - b)), "
                "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dist"),
        )
        # ragged code pair -> zip_with NULL-pads -> NULL dist, which
        # Spark's ASC window puts FIRST (DuckDB: last): drop explicitly
        .where(F.col("dist").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rnk"), "dist")
    )


def knn_int8_rerank(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    coarse_k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full two-stage quantized retrieval chain: int8 code-space top-
    ``coarse_k`` per query (:func:`knn_int8` — 4x smaller vectors, integer
    kernel), then an EXACT float squared-L2 rerank of only those
    candidates, emitting the final top-``k`` (ties -> smallest neighbor
    id).  This is the production ANN recipe: the float vectors are touched
    for coarse_k rows per query, never for the corpus.

    Float distances use the same sequential fold as ``knn_exact_fold``
    (bit-exact against the SQL oracle's ordered sum).  The candidate list
    is broadcast into the vector lookup, so the rerank adds no O(corpus)
    shuffle."""
    from .similarity import _sq_l2_fold

    coarse = knn_int8(df, query_df, k=coarse_k, id_col=id_col, vec_col=vec_col)
    qe = query_df.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qe"))
    ne = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("__ne"))
    cand = coarse.select("q_id", "n_id")
    scored = (
        ne.join(F.broadcast(cand), "n_id")
        .join(F.broadcast(qe), "q_id")
        .select(
            "q_id", "n_id", _sq_l2_fold("__qe", "__ne").alias("dist")
        )
        # NULL dist = ragged pair; drop, never rank (see knn_int8)
        .where(F.col("dist").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", F.col("rnk").cast("int").alias("rnk"))
    )
