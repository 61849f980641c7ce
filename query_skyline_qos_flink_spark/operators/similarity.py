"""Similarity search over embedding columns (``array<float>``).

Three tiers, by scale:

* :func:`knn_exact_fold` — sequential-fold distance expressions
  (``F.aggregate`` over ``zip_with``): bit-for-bit reproducible in duckdb,
  used for oracle-gated queries.  JVM-side codegen, fine to ~1e7 pairs.
* :func:`knn_blocked` — the scale path: broadcast the query matrix, one
  numpy GEMM per Arrow batch (``||e||^2 + ||q||^2 - 2 e.q``), map-side
  top-k, tiny shuffle on query id for the final top-k.  This is how you
  brute-force 100 TB: compute is embarrassingly parallel, shuffle volume is
  ``O(n_queries * k * n_partitions)``.
* :func:`ann_bucketed` — IVF/LSH-style: deterministic sign-bit bucket code
  over the first ``n_bits`` dimensions; candidates limited to the query's
  bucket.  Recall < 1 by design; the bucket rule is a pure column expr so
  the duckdb oracle replicates it exactly.

:func:`cosine_pairs` is the embedding-cosine near-dup operator (dedup
family); fold-based for oracle parity, with the blocked matrix path noted
for scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_D = "double"

# Expression builders emit ONE SQL string parsed by a single F.expr call.
# The former python-lambda forms (F.aggregate over F.zip_with etc.) cost
# dozens of py4j round trips per expression — profiled round 16 at ~1.0 s
# of the 2.6 s warm x_ann_ivf call (1,452 py4j round trips, almost all
# expression construction).  The parsed trees are the same Catalyst
# functions, so results are bit-identical.


def _sq_l2_sql(a: str, b: str) -> str:
    diff = "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> {diff} * {diff}), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _sq_l2_fold(a: str, b: str):
    return F.expr(_sq_l2_sql(a, b))


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)))"
    )


def valid_vectors(df: DataFrame, vec_col: str, nonzero: bool = False) -> DataFrame:
    """Engine policy for vector operators (the analog of the skyline
    family's NULL/NaN-dim exclusion): rows with NULL or empty vectors are
    excluded, as are vectors containing a NaN component (a NaN poisons
    any fold and ANSI floor/cast on the NaN result kills the job); with
    ``nonzero=True`` (cosine-based ops, where a zero-norm vector makes
    the similarity undefined and ANSI division-by-zero would kill the
    job), all-zero vectors are excluded too.  Pure column predicates —
    rides the scan.

    NULL components are excluded with the same rationale as NaN: a NULL
    poisons the distance fold to NULL, which Spark's ASC window ranks
    FIRST while DuckDB's unnest-sum skips the term and ranks by a
    fabricated real distance — the one cross-engine divergence the NaN
    clause alone does not close."""
    v = f"`{vec_col}`"
    cond = (
        f"{v} IS NOT NULL AND size({v}) > 0"
        f" AND NOT exists({v}, x -> isnan(CAST(x AS DOUBLE)))"
        f" AND NOT exists({v}, x -> x IS NULL)"
    )
    if nonzero:
        cond += f" AND exists({v}, x -> x != 0)"
    return df.where(F.expr(cond))


def knn_exact_fold(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by squared L2 for each query row (self excluded, ties by
    neighbor id).  Output: q_id, n_id, rnk.  NULL/empty vectors excluded
    on both sides (:func:`valid_vectors`)."""
    df = valid_vectors(df, vec_col)
    query_df = valid_vectors(query_df, vec_col)
    q = query_df.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__q"))
    pairs = (
        df.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("n_id"),
            _sq_l2_fold("__q", f"`{vec_col}`").alias("dist"),
        )
        # ragged pair -> zip_with NULL-pads -> NULL dist, which Spark's
        # ASC window puts FIRST (DuckDB puts NULLs last): drop the pair
        # explicitly so unequal-length vectors never rank (engine policy,
        # mirrored in the oracle's len-equality predicate)
        .where(F.col("dist").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk")
    )


def knn_blocked(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Blocked-GEMM brute-force top-k (the 100 TB path).  Same contract as
    :func:`knn_exact_fold`; float summation order differs (pairwise GEMM vs
    sequential fold), so ranks can differ on near-exact ties — hence no SQL
    oracle, property-tested against the fold path instead.  NULL/empty
    vectors excluded on both sides; an empty query set returns the empty
    contract frame instead of tripping numpy's stack."""
    df = valid_vectors(df, vec_col)
    query_df = valid_vectors(query_df, vec_col)
    qpdf = query_df.select(id_col, vec_col).toPandas()
    if qpdf.empty:
        return df.sparkSession.createDataFrame([], "q_id bigint, n_id bigint, rnk int")
    # ragged policy (the fold paths' rule, stated pairwise): a pair only
    # ranks when both vectors share a length.  The GEMM needs rectangular
    # matrices, so queries are GROUPED by length — one broadcast matrix
    # per distinct query length (one group on any sane corpus) — and each
    # batch row scores only against its matching-length group; np.stack
    # would otherwise raise on hostile-but-legal input
    groups = [
        (g[id_col].to_numpy(), np.stack(g[vec_col].to_numpy()).astype(np.float64))
        for _, g in qpdf.groupby(qpdf[vec_col].map(len))
    ]
    bc = df.sparkSession.sparkContext.broadcast(
        [(ids_, Q_, (Q_ * Q_).sum(axis=1)) for ids_, Q_ in groups]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf[vec_col].map(len)
            rows = []
            for q_ids, Q, qsq in bc.value:
                sub = pdf[lens == Q.shape[1]]
                if sub.empty:
                    continue
                E = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
                ids = sub[id_col].to_numpy()
                d2 = (E * E).sum(axis=1)[:, None] + qsq[None, :] - 2.0 * (E @ Q.T)
                for qi in range(len(q_ids)):
                    mask = ids != q_ids[qi]
                    cand_ids = ids[mask]
                    cand_d = d2[mask, qi]
                    if cand_ids.size == 0:
                        continue
                    # lexsort keeps the (dist, n_id) contract at the
                    # map-side cut: exact distance ties at the k boundary
                    # must keep smallest id
                    top = np.lexsort((cand_ids, cand_d))[:k]
                    rows.append(
                        pd.DataFrame(
                            {"q_id": q_ids[qi], "n_id": cand_ids[top], "dist": cand_d[top]}
                        )
                    )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    partial = df.mapInPandas(fn, schema="q_id long, n_id long, dist double")
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        partial.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk")
    )


def bucket_code(vec_col: str, n_bits: int = 8):
    """Deterministic sign-bit bucket: bit i set iff vec[i] >= 0.
    ``vec_col`` is a column NAME; the whole code is one parsed expr."""
    return F.expr(_bucket_code_sql(f"`{vec_col}`", n_bits))


def _bucket_code_sql(vec_sql: str, n_bits: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN CAST(element_at({vec_sql}, {i + 1}) AS DOUBLE) >= 0.0D "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    # n_bits=0 (degenerate single-bucket config): the old Column loop
    # returned lit(0); "0 + " would be a ParseException
    return f"0 + {terms}" if terms else "0"


def ann_bucketed(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket (equi-join on the bucket code -> shuffle only within buckets).
    Output: q_id, n_id, rnk.

    ``n_probes`` > 1 enables multi-probe (the same one-bit probe-explode as
    :func:`cosine_pairs_bucketed`): the query side additionally probes the
    buckets reached by flipping each of its first ``n_probes - 1`` sign
    bits, so near-boundary vectors recover neighbors from adjacent sign
    cells.  ``n_probes = n_bits + 1`` probes the full Hamming-1 ball.  Each
    (query, neighbor) candidate still meets exactly once (Hamming-0 via the
    un-flipped probe, Hamming-1 via its single flip) — no distinct pass —
    and the probe set is a pure function of the code, so a SQL oracle can
    replicate the rule as ``xor == 0 OR (single bit AND bit < n_probes-1)``.
    Only the broadcast query side fans out (×``n_probes``); the base table
    is scanned once.  NULL/empty vectors excluded on both sides."""
    df = valid_vectors(df, vec_col)
    query_df = valid_vectors(query_df, vec_col)
    base = df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__e"),
        bucket_code(vec_col, n_bits).alias("__bkt"),
    )
    qcode = bucket_code(vec_col, n_bits)
    if n_probes > 1:
        flips = [
            qcode.bitwiseXOR(F.lit(1 << i))
            for i in range(min(n_probes - 1, n_bits))
        ]
        probe = F.explode(F.array(qcode, *flips))
    else:
        probe = qcode
    q = query_df.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__q"),
        probe.alias("__bkt"),
    )
    pairs = (
        base.join(F.broadcast(q), "__bkt")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", _sq_l2_fold("__q", "__e").alias("dist"))
        # NULL dist = ragged pair; drop, never rank (see knn_exact_fold)
        .where(F.col("dist").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk")
    )


def _cos_micro_select(pairs: DataFrame, threshold: float) -> DataFrame:
    cos = F.expr(
        f"{_dot_sql('__va', '__vb')} / ({_norm_sql('__va')} * {_norm_sql('__vb')})"
    )
    return (
        pairs.withColumn("__cos", cos)
        .where(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.floor(F.col("__cos") * 1e6).cast("bigint").alias("cos_micro"))
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all pairs (id_a < id_b) with cosine similarity >= threshold.

    Output: id_a, id_b, cos_micro (floor(cos * 1e6) — integerized so the
    oracle hash is immune to any downstream float formatting).

    This is the O(n^2) cross-join reference twin, kept for property-testing
    :func:`cosine_pairs_bucketed` (the registered scale path) — do not use
    it on large tables.  NULL/empty/zero-norm vectors are excluded
    (:func:`valid_vectors` — cosine is undefined at zero norm and ANSI
    division-by-zero would kill the job)."""
    df = valid_vectors(df, vec_col, nonzero=True)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return _cos_micro_select(pairs, threshold)


def cosine_pairs_bucketed(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Cosine near-dup pairs via sign-bit LSH candidate generation + exact
    verify — the 100 TB shape (same LSH-then-verify pattern as MinHash).

    Candidates are pairs whose sign-bit bucket codes (first ``n_bits`` dims)
    differ in at most one bit: the probe side explodes each vector to its
    own code plus every one-bit flip (``n_bits + 1`` probes), and an
    equi-join on the probe code meets the other side's base code.  A
    Hamming-0 pair meets only via the un-flipped probe and a Hamming-1 pair
    via exactly one flip, so each unordered pair surfaces exactly once — no
    distinct pass, no cartesian anywhere in the plan.  The verify stage
    recomputes exact fold-cosine on candidates only.

    Deterministic (hence oracle-checkable: the duckdb twin replicates the
    bucket rule as ``bit_count(xor(bkt_a, bkt_b)) <= 1``); recall < 1 by
    design for pairs whose sign patterns differ in >= 2 of the probed dims —
    property-tested against :func:`cosine_pairs`.  Bucket skew at scale is
    bounded by raising ``n_bits`` (2^n_bits buckets) and is AQE-splittable
    since the join is a plain equi shuffle."""
    code = bucket_code(vec_col, n_bits)
    df = valid_vectors(df, vec_col, nonzero=True)
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), code.alias("__cb")
    )
    probes = F.array(code, *[code.bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)])
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.explode(probes).alias("__cb"),
    )
    cand = a.join(b, "__cb").where(F.col("id_a") < F.col("id_b"))
    return _cos_micro_select(cand, threshold)


def _int_sq_l2_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _int_sq_l2_fold(a: str, b: str):
    return F.expr(_int_sq_l2_sql(a, b))


def ann_ivf(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_bits: int = 4,
    n_probes: int = 2,
    scale: int = 1024,
) -> DataFrame:
    """IVF ANN with integer-exact, data-derived centroids.

    The classic IVF shape (coarse quantizer -> nearest-centroid assignment
    -> probe the query's closest cells), made deterministic and
    oracle-checkable without float k-means:

    * vectors are quantized to integers (``floor(x * scale)``);
    * seed cells = sign-bit code over the first ``coarse_bits`` quantized
      components (``2^coarse_bits`` cells);
    * the centroid of each cell is the element-wise FLOORED MEAN of its
      member vectors — an integer vector, computed with exact integer sums
      (the only division is ``floor(sum / n)``, exact in float64 for any
      ``|sum| < 2^53``);
    * every vector is re-assigned to its nearest centroid by exact integer
      squared L2 (ties -> smallest cell id) — assignments can and do move
      across seed cells, like a single Lloyd iteration;
    * queries probe their ``n_probes`` nearest centroids; candidates are
      base vectors assigned to a probed cell (each (q, n) pair meets at
      most once since assignment is unique); exact integer L2 top-k with
      the (dist, n_id) tie contract.

    The centroid table is ``2^coarse_bits`` rows — per-partition integer
    partial sums collected once (one exchange-free job; the driver merges
    <= cells x partitions tiny rows) and inlined as a LITERAL array, so
    nearest-centroid assignment is a pure scan-side expression
    (``sort_array`` over per-centroid integer distances): no crossJoin
    row expansion and no per-id window shuffle, which at n×cells rows
    was the dominant cost of the previous plan.  The candidate join is a
    plain equi-join on the cell id, so the whole plan is
    scan + literal expression + one shuffle for the final per-query
    top-k.  Scale knobs: ``coarse_bits`` (cells) and ``n_probes``
    (recall).  NULL/empty vectors excluded on both sides, as are vectors
    whose length differs from the DECLARED ``dim`` — the centroid sums
    index components 1..dim, so a short vector would raise under ANSI
    (and a long one would be silently truncated); scan-side exclusion is
    the engine's validity policy, mirrored in the oracle's
    ``len(embedding) = dim`` predicate.
    """
    df = valid_vectors(df, vec_col).where(F.size(vec_col) == dim)
    query_df = valid_vectors(query_df, vec_col).where(F.size(vec_col) == dim)
    qv = F.expr(
        f"transform(`{vec_col}`, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {int(scale)}) AS BIGINT))"
    )

    base = df.select(F.col(id_col).alias("__id"), qv.alias("__qv"))

    # per-partition partial centroid sums, merged driver-side: ONE
    # collect job with no exchange.  The previous 2^coarse_bits-group
    # groupBy paid an AQE exchange materialization (a second job + stage
    # round trip per call) to move <= cells x partitions tiny rows — the
    # partials are the same rows, so merging them in numpy is the same
    # integer arithmetic without the shuffle.  Seed-cell assignment
    # happens inside the kernel (sign bits of the first coarse_bits
    # components), so the seed column never materializes JVM-side.
    n_cells = 1 << coarse_bits
    powers = np.asarray([1 << i for i in range(coarse_bits)], dtype=np.int64)

    def partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_acc = np.zeros(n_cells, dtype=np.int64)
        s_acc = np.zeros((n_cells, dim), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack(pdf["__qv"].to_numpy()).astype(np.int64)
            seeds = ((A[:, :coarse_bits] >= 0) @ powers).astype(np.int64)
            np.add.at(n_acc, seeds, 1)
            np.add.at(s_acc, seeds, A)
        hit = np.flatnonzero(n_acc)
        if hit.size:  # an all-empty partition yields nothing: pandas
            # would type the empty list column float64, which Arrow
            # cannot cast to array<long>
            yield pd.DataFrame(
                {
                    "cell": hit,
                    "n": n_acc[hit],
                    "sums": [s_acc[c] for c in hit],
                }
            )

    import math

    cells_n = np.zeros(n_cells, dtype=np.int64)
    cells_s = np.zeros((n_cells, dim), dtype=np.int64)
    for r in base.select("__qv").mapInPandas(
        partial_sums, schema="cell long, n long, sums array<long>"
    ).collect():
        cells_n[r["cell"]] += r["n"]
        cells_s[r["cell"]] += np.asarray(r["sums"], dtype=np.int64)
    # floored mean, identical arithmetic to the previous SQL form
    # CAST(floor(s / n) AS BIGINT): int64 sums are exact under any
    # partial-merge order, and float(s)/float(n) is the same IEEE double
    # division (|sum| < 2^53) the JVM evaluated
    cent_rows = [
        (int(c), [int(math.floor(float(s) / float(cells_n[c]))) for s in cells_s[c]])
        for c in np.flatnonzero(cells_n)
    ]
    if not cent_rows:
        raise ValueError(
            "ann_ivf: no usable centroid cells (empty input or every cell "
            "has a NULL component) — clean NULL embeddings upstream"
        )
    # ONE F.expr over a SQL string: building this literal as nested
    # F.array/F.struct/F.lit calls costs ~cells*dim py4j round trips
    # (~1024 here), which dominated the plan-build time; a single parsed
    # expression is one round trip.  `L` suffixes keep the components
    # BIGINT so the integer-L2 fold never overflows int32.
    cent_sql = "array(" + ",".join(
        "named_struct('c', {c}, 'v', array({v}))".format(
            c=c, v=",".join(f"{int(v)}L" for v in vec)
        )
        for c, vec in cent_rows
    ) + ")"

    dists_sql = (
        f"sort_array(transform({cent_sql}, s -> "
        f"struct({_int_sq_l2_sql('__qv', 's.v')} AS d, s.c AS c)))"
    )

    def ranked_cells(vdf: DataFrame, keep_ranks: int) -> DataFrame:
        # one parsed expression per variant (see the module-top note on
        # py4j round-trip cost of lambda-built trees)
        if keep_ranks == 1:
            return vdf.withColumn(
                "__cell", F.expr(f"element_at({dists_sql}, 1).c")
            )
        return vdf.withColumn(
            "__cell",
            F.explode(
                F.expr(f"transform(slice({dists_sql}, 1, {keep_ranks}), s -> s.c)")
            ),
        )

    base_a = ranked_cells(base, 1)
    q = query_df.select(F.col(id_col).alias("__id"), qv.alias("__qv"))
    probes = ranked_cells(q, n_probes).withColumnsRenamed(
        {"__id": "q_id", "__qv": "__pq"}
    )
    cand = (
        base_a.join(F.broadcast(probes), "__cell")
        .where(F.col("__id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("__id").alias("n_id"),
            _int_sq_l2_fold("__pq", "__qv").alias("dist"),
        )
        # NULL dist = ragged pair; drop, never rank (see knn_exact_fold)
        .where(F.col("dist").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk")
    )


def knn_exact_quantized(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> DataFrame:
    """Exact top-k by integer squared L2 in the SAME quantized space as
    :func:`ann_ivf` (``floor(x * scale)`` per component) — the ground
    truth an index-quality evaluation compares the ANN answer against.
    Working in the quantized space (not raw floats) is what makes the
    comparison apples-to-apples AND the result engine-exact: all
    arithmetic is bigint, no float tie ambiguity.  Same contract as the
    other knn paths: self excluded, ties (dist, n_id), validity =
    :func:`valid_vectors` + declared-``dim`` length on both sides.

    Scale shape: the query side broadcasts (an eval runs on a small
    sampled query set); the base scans once; the only shuffle is the
    final per-query top-k."""
    df = valid_vectors(df, vec_col).where(F.size(vec_col) == dim)
    query_df = valid_vectors(query_df, vec_col).where(F.size(vec_col) == dim)
    qv = F.expr(
        f"transform(`{vec_col}`, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {int(scale)}) AS BIGINT))"
    )
    base = df.select(F.col(id_col).alias("n_id"), qv.alias("__qv"))
    q = query_df.select(F.col(id_col).alias("q_id"), qv.alias("__pq"))
    cand = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id", _int_sq_l2_fold("__pq", "__qv").alias("dist")
        )
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk")
    )


def ann_recall(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_bits: int = 4,
    n_probes: int = 2,
    scale: int = 1024,
) -> DataFrame:
    """Recall@k of :func:`ann_ivf` against :func:`knn_exact_quantized` —
    the index-quality gate a production vector pipeline runs before
    trusting an approximate index (tune ``coarse_bits``/``n_probes``
    until recall clears the bar, THEN deploy).  Returns one row per
    query: ``(q_id, n_exact, n_hits)`` — integer counts, not a float
    ratio, so the oracle hash is float-free (recall = n_hits/n_exact).

    Both sides run in the same quantized space with identical tie rules,
    so n_hits is deterministic even at distance ties.  Plan: the ANN
    branch is ann_ivf's scan + literal-centroid assignment + one top-k
    shuffle; the exact branch is one more base scan + top-k; the
    comparison is a left join on (q_id, n_id) over <= |queries| * k rows."""
    exact = knn_exact_quantized(
        df, query_df, dim, k=k, id_col=id_col, vec_col=vec_col, scale=scale
    )
    ann = ann_ivf(
        df,
        query_df,
        dim,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        coarse_bits=coarse_bits,
        n_probes=n_probes,
        scale=scale,
    ).select("q_id", "n_id", F.lit(1).alias("__hit"))
    return (
        exact.join(ann, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )


def kmeans_iter(
    df: DataFrame,
    dim: int,
    n_iters: int = 4,
    coarse_bits: int = 3,
    scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Iterative Lloyd's k-means over the embedding corpus, integer-exact
    and oracle-checkable — the clustering pass a curation pipeline runs
    for SemDeDup-style pruning, domain balancing, and diversity sampling.
    Generalizes :func:`ann_ivf`'s single Lloyd step to ``n_iters`` full
    iterations with the SAME determinism recipe:

    * vectors quantize to integers (``floor(x * scale)``), validity =
      :func:`valid_vectors` + declared-``dim`` length (mirrored in the
      oracle's predicate);
    * initial assignment = sign-bit seed over the first ``coarse_bits``
      components (``2^coarse_bits`` clusters; labels are stable across
      iterations — a cluster that loses all members simply disappears);
    * each iteration recomputes element-wise FLOORED-MEAN integer
      centroids (exact integer sums; the one division is
      ``floor(sum / n)``, exact in float64 for ``|sum| < 2^53``) and
      re-assigns every point to its nearest centroid by exact integer
      squared L2, ties to the smallest cluster id.

    Returns the post-final-assignment cluster report ``(cid, n_pts,
    inertia)`` with ``inertia`` the exact bigint sum of member distances
    — the convergence curve a pipeline plots per iteration.

    Scale shape: the per-iteration state is the K-row centroid table —
    collected to the driver (iterations are inherently sequential) and
    inlined as ONE parsed literal expression, so every assignment is a
    pure scan-side expression over the persisted quantized base: no
    join, no window, no shuffle in the loop body beyond each iteration's
    K-group partial agg.  ``n_iters + 1`` tiny jobs total; the base is
    scanned once per iteration (unavoidable in Lloyd's) and nothing
    corpus-sized ever moves.  Validity domain is :func:`valid_vectors`
    (which excludes NULL-component vectors — a NULL distance sorts FIRST
    in Spark's ``sort_array`` but LAST under SQL ``ORDER BY``, so leaving
    them in would silently diverge from the oracle) plus the declared
    ``dim`` length, mirrored in the oracle's predicate."""
    from .caching import persist_bounded as _persist

    df = valid_vectors(df, vec_col).where(F.size(vec_col) == dim)
    qv = F.expr(
        f"transform(`{vec_col}`, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {int(scale)}) AS BIGINT))"
    )
    base = _persist(df.select(F.col(id_col).alias("__id"), qv.alias("__qv")))

    seed = F.lit(0)
    for i in range(coarse_bits):
        seed = seed + F.when(
            F.element_at(F.col("__qv"), i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    asg = seed.cast("long")

    sums_sql = (
        "array(" + ",".join(f"sum(element_at(__qv, {i + 1}))" for i in range(dim)) + ")"
    )
    spark = df.sparkSession
    empty = spark.createDataFrame([], "cid bigint, n_pts bigint, inertia bigint")

    def nearest(cent_sql: str) -> F.Column:
        """(dist, cid) struct of the nearest literal centroid — one parsed
        expression (see the module-top note on lambda-tree py4j cost)."""
        return F.expr(
            f"element_at(sort_array(transform({cent_sql}, s -> "
            f"struct({_int_sq_l2_sql('__qv', 's.v')} AS d, s.c AS c))), 1)"
        )

    cent_lit = None
    for _ in range(n_iters):
        cent = (
            base.withColumn("__cid", asg)
            .groupBy("__cid")
            .agg(F.count(F.lit(1)).alias("__n"), F.expr(sums_sql).alias("__sums"))
            .select(
                "__cid",
                F.expr(
                    "transform(__sums, s -> CAST(floor(s / __n) AS BIGINT))"
                ).alias("__c"),
            )
        )
        cent_rows = sorted(
            (r for r in cent.collect() if all(v is not None for v in r["__c"])),
            key=lambda r: r["__cid"],
        )
        if not cent_rows:
            return empty
        cent_sql = "array(" + ",".join(
            "named_struct('c', {c}L, 'v', array({v}))".format(
                c=int(r["__cid"]),
                v=",".join(f"{int(v)}L" for v in r["__c"]),
            )
            for r in cent_rows
        ) + ")"
        cent_lit = cent_sql
        asg = nearest(cent_sql)["c"]
    if cent_lit is None:  # n_iters == 0: report the seed partition, no inertia
        return (
            base.withColumn("__cid", asg)
            .groupBy("__cid")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pts"))
            .select(
                F.col("__cid").cast("bigint").alias("cid"),
                "n_pts",
                F.lit(None).cast("bigint").alias("inertia"),
            )
        )
    # project the struct once, then expand — keeps the 2^coarse_bits-way
    # distance sort a single evaluated expression per row
    return (
        base.select(nearest(cent_lit).alias("__b"))
        .select(F.col("__b.c").alias("cid"), F.col("__b.d").alias("__d"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pts"),
            F.sum("__d").cast("bigint").alias("inertia"),
        )
    )


def label_centroid_cosines(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the corpus-drift / cluster-separation report a training pipeline runs
    on embedded shards (are two sources near-duplicates in embedding
    space? did a label's centroid drift between snapshots?).

    Exactness contract: every cross-row aggregate is INTEGER.  Components
    quantize to 1e-6 fixed point (bigint), centroid sums and the
    norm/dot accumulations run in bigint/decimal(38,0) — order-independent
    by construction, so the final cosine is ONE deterministic double
    expression over exact integers and hashes identically across engines
    (no float-sum-order discipline needed, unlike avg-of-float paths).

    Scale shape: posexplode to (label, pos, q6) partially aggregates
    map-side into |labels| x dim rows; everything downstream (norms, the
    pos-equi self-join for dots) runs on that tiny table, broadcast.  The
    explode never shuffles raw vectors — only the quantized partial sums.
    """
    df = valid_vectors(df, vec_col)  # NULL/empty/NaN vectors excluded
    u = df.select(
        F.col(label_col).cast("bigint").alias("label"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select(
        "label",
        "pos",
        F.round(F.col("v").cast("double") * F.lit(1000000.0)).cast("bigint").alias("q6"),
    )
    c = u.groupBy("label", "pos").agg(
        F.sum("q6").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    nrm = c.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sum(F.col("sq").cast("decimal(38,0)") * F.col("sq")).alias("nq"),
    ).where(F.col("nq") > 0)  # zero-norm centroid: cosine undefined, label excluded
    a = c.select(F.col("label").alias("label_a"), "pos", F.col("sq").alias("sqa"))
    b = c.select(F.col("label").alias("label_b"), "pos", F.col("sq").alias("sqb"))
    pairs = (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sqa").cast("decimal(38,0)") * F.col("sqb")).alias("dq"))
    )
    na = nrm.select(F.col("label").alias("label_a"), F.col("n_vecs").alias("n_a"),
                    F.col("nq").alias("nqa"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("n_vecs").alias("n_b"),
                    F.col("nq").alias("nqb"))
    return (
        pairs.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("dq").cast("double")
                / (F.sqrt(F.col("nqa").cast("double")) * F.sqrt(F.col("nqb").cast("double"))),
                6,
            ).alias("cos_r"),
        )
    )


def gram_matrix(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Distributed exact Gram matrix ``X^T X`` over 1e-6 fixed-point
    embedding components — the covariance/whitening/PCA-prep statistic an
    embedding pipeline computes before decorrelating or compressing a
    corpus.  Returns the upper triangle as ``(i, j, s_q, n_rows)`` with
    1-based dims, ``s_q = sum_rows q_i * q_j`` and ``q = round(v * 1e6)``.

    Exactness: quantization happens JVM-side (Spark ``round`` ==
    half-away-from-zero == DuckDB ``round``; numpy's rint would be
    half-to-even), the per-partition GEMM is int64 and GUARDED — numpy
    wraps silently on overflow, so each task tracks ``rows x max|q|^2``
    and raises before the bound is reachable (raise-don't-degrade, like
    the skyline family's verify guards) — and the global merge sums
    partials in decimal(38,0).  Every aggregate is integer and
    order-independent, so results hash identically across engines.  The
    ``s_q`` OUTPUT is bigint: exact to |s_q| < 2^63, and under ANSI mode
    the final cast raises (never wraps) on a corpus whose true sum
    exceeds it — callers at that scale should lower the fixed-point
    scale or read the decimal column before the cast.

    Scale shape: ONE mapInPandas pass emits a dim*(dim+1)/2-row triangle
    per partition (the classic distributed Gram trick: shuffle volume is
    partitions x dim^2 regardless of row count), then one tiny keyed sum.
    Validity policy: NULL/empty/NaN/NULL-component vectors are excluded
    (:func:`valid_vectors`), and so are rows whose dimensionality differs
    from the corpus's MODAL dimensionality (ties broken toward the
    smaller dim) — mixed dims would otherwise silently merge incompatible
    triangles across partitions, and the modal rule is deterministic and
    order-independent, so the oracle twin can replicate it exactly
    (a "first row" rule depends on scan order).
    """
    import numpy as np

    q6 = F.expr(
        f"transform({vec_col}, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
    )
    d = valid_vectors(df, vec_col).select(q6.alias("__q"))
    mode = (
        d.groupBy(F.size("__q").alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__d").asc())
        .first()
    )
    if mode is None:
        return d.sparkSession.createDataFrame(
            [], "i bigint, j bigint, s_q bigint, n_rows bigint"
        )
    d = d.where(F.size("__q") == mode["__d"])

    def fn(batches):
        G = None
        n = 0
        maxq = 1
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.array(pdf["__q"].to_list(), dtype=np.int64)
            maxq = max(maxq, int(np.abs(q).max()) if q.size else 1)
            n += q.shape[0]
            if n * maxq * maxq > 9_000_000_000_000_000_000:
                raise ValueError(
                    "gram_matrix: partition partial sum could exceed int64 "
                    f"({n} rows x max|q| {maxq}); repartition the input or "
                    "lower the fixed-point scale"
                )
            G = q.T @ q if G is None else G + q.T @ q
        if G is None:
            return
        iu = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {"i": iu[0] + 1, "j": iu[1] + 1, "s": G[iu], "n": n}
        )

    partials = d.mapInPandas(fn, schema="i int, j int, s long, n long")
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("__s"),
        F.sum("n").alias("__n"),
    ).select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.col("__s").cast("bigint").alias("s_q"),
        F.col("__n").cast("bigint").alias("n_rows"),
    )


def semantic_dedup(
    df: DataFrame,
    radius: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    coarse_bits: int = 6,
) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    quantize -> coarse-cell assignment -> within-cell near-dup pairs ->
    connected components -> keep each component's smallest id, reported as
    per-``group_col`` retention ``(group, n_vecs, n_kept)``.

    The chain, each stage its scale-correct shape:

    * symmetric int8 quantization under ONE corpus-global scale
      (:func:`~.quantize.with_int8_codes` — broadcast 1-row agg + scan-side
      exprs), so every downstream distance is 64-bit-integer exact;
    * IVF-style cell = sign bits of the first ``coarse_bits`` code
      components (ann_ivf's seed-cell rule): a pure column expression,
      2^coarse_bits cells;
    * candidate pairs = same-cell pairs with integer squared L2 over the
      codes <= ``radius``; because the pair rule is same-cell-only, every
      connected component lives INSIDE one cell (like SemDeDup, near-dups
      are sought within a cluster only: recall across cell boundaries is
      traded for never comparing across cells);
    * min-label connected components — computed per cell in the SAME pass
      that finds the pairs: one ``applyInPandas`` kernel per cell runs a
      chunked int64 GEMM (``||a||^2 + ||b||^2 - 2ab``, exact: int8-ranged
      codes cannot overflow) and a union-find over the under-radius pairs.
      The cell-locality invariant is what makes this exact — no edge ever
      crosses a kernel group, so local min-label union-find IS the global
      min-label CC;
    * retention rollup: a component's smallest id is kept, everything else
      in it is the semantic-duplicate budget, reported per group.

    At 100 TB: the quadratic term is per-cell (sum of cell_size^2 GEMM
    work) — ``coarse_bits`` is the knob that keeps cells bounded
    (production: 16-20 bits -> 65k-1M cells).  One shuffle total (the
    cell groupBy; the old equi-join + iterative CC paid the same cell
    shuffle TWICE for the join sides plus 2 jobs and a label shuffle per
    CC round).  Kernel memory is bounded: the GEMM runs in row blocks
    (block x cell_size, never cell_size^2 at once) and union-find state
    is O(cell_size).  A pathologically hot cell binds to one task (the
    join path could AQE-split it); that is the same coarse_bits sizing
    contract the pair join already relied on for its per-cell quadratic
    work.  Nothing collects to the driver.
    """
    from .quantize import with_int8_codes

    df = valid_vectors(df, vec_col)
    coded = with_int8_codes(df, vec_col)
    cell = F.lit(0)
    for i in range(coarse_bits):
        # F.get is 0-based and NULL (-> bit 0) past the vector's end, so
        # short vectors still land in a well-defined cell
        cell = cell + F.when(F.get("q8", i) < 0, F.lit(1 << i)).otherwise(F.lit(0))
    cc = coded.select(
        F.col(id_col).cast("long").alias("__vid"),
        F.col(group_col).cast("bigint").alias("__grp"),
        F.col("q8"),
        cell.alias("__cell"),
    )
    radius = int(radius)

    def cell_components(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__vid"].to_numpy(dtype=np.int64)
        n = len(ids)
        parent = np.arange(n)

        def find(i: int) -> int:
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:  # path compression
                parent[i], i = root, parent[i]
            return root

        codes = pdf["q8"].to_numpy()
        # ragged guard (the old explicit size-equality predicate): codes
        # only pair within a length group.  A NULL-bearing code never
        # pairs either (the old fold went NULL -> predicate dropped it).
        lens = np.array(
            [
                len(c) if c is not None and not pd.isna(np.asarray(c, dtype=object)).any() else -1
                for c in codes
            ]
        )
        for length in np.unique(lens):
            if length <= 0:
                continue
            idx = np.flatnonzero(lens == length)
            if idx.size < 2:
                continue
            A = np.stack([np.asarray(codes[i], dtype=np.int64) for i in idx])
            sq = (A * A).sum(axis=1)
            # row-blocked exact int64 GEMM: bounds the distance plane at
            # block x m instead of m^2
            block = max(1, (1 << 22) // max(1, int(A.shape[0])))
            for s in range(0, A.shape[0], block):
                e = min(s + block, A.shape[0])
                d2 = sq[s:e, None] + sq[None, :] - 2 * (A[s:e] @ A.T)
                bi, bj = np.nonzero(d2 <= radius)
                for i, j in zip(bi + s, bj):
                    if i < j:
                        ri, rj = find(idx[i]), find(idx[j])
                        if ri != rj:
                            parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(n)])
        canon = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(canon, roots, ids)
        return pd.DataFrame(
            {
                "__grp": pdf["__grp"].to_numpy(),
                "__vid": ids,
                "canonical_id": canon[roots],
            }
        )

    labeled = cc.groupBy("__cell").applyInPandas(
        cell_components, schema="__grp long, __vid long, canonical_id long"
    )
    return labeled.groupBy(F.col("__grp").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(
            F.when(F.col("__vid") == F.col("canonical_id"), 1).otherwise(0)
        ).cast("bigint").alias("n_kept"),
    )
