"""Deduplication operators for LLM-data pipelines.

Five strategies, all DataFrame-native and shuffle-bounded:

* :func:`exact_dedup` — hash groupBy on the key, keep min id, semi-join
  back.  One shuffle on the dedup key; at 100 TB this is the canonical
  pattern (no window sort over the full table needed).
* :func:`jaccard_pairs` — EXACT n-gram Jaccard via an inverted shingle
  index (explode -> self-join on shingle -> count).  Frequent-shingle
  posting lists are quadratic, so ``max_df`` drops shingles appearing in
  more than that many docs (standard trick; disabled by default so the
  oracle stays exact).
* :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH candidate
  generation + exact-Jaccard verification.  The hash family is
  ``md5(perm_seed || shingle)`` with the *lexicographic min of fixed-width
  hex strings* as the min-hash — portable bit-for-bit to duckdb SQL, which
  is what makes the LSH pipeline oracle-checkable end to end.
* :func:`simhash64` — 64-bit SimHash per doc (pure JVM column expressions:
  md5 byte extraction + 64 bit-vote sums under one partial-aggregated
  groupBy); near-dup = small Hamming distance.
* embedding-cosine near-dup lives in ``operators/similarity.py``
  (:func:`~.similarity.cosine_pairs`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .caching import persist_bounded as _persist
from .caching import release_local_checkpoint as _release_ckpt
from .fanout import fanout_narrow_scan as _fanout
from .joins import null_safe_semi_join
from .text import TOKEN_RE, tokens_sql

MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep, per duplicate group, the row with the smallest ``id_col``.

    NULL keys form a normal dedup group (null-SAFE join equality — a plain
    equi-join would silently drop every NULL-keyed row)."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return null_safe_semi_join(df, keep, eq_cols=[id_col], null_safe_cols=key_cols)


def drop_hot_keys(df: DataFrame, key_cols: list[str], cap: int | None) -> DataFrame:
    """The hot-key valve, ONE copy: drop every row whose key appears in
    more than ``cap`` rows of ``df`` — a pre-aggregated (key, count) plus
    a left-semi join, so the extra shuffle carries only the key
    dictionary, never the payload.  ``None`` keeps everything.

    This is the shared guard for every quadratic-in-group-size self-join
    in the engine: shingle posting lists (``max_df``), winnowing
    fingerprints (``max_df``), LSH band buckets (``max_band_df``), and
    co-occurrence groups (``max_items_per_group`` in operators/graph.py).
    The justification is the same everywhere: a key shared by F rows
    costs F^2/2 join rows, and ubiquitous keys (boilerplate, mega-groups)
    carry no per-pair signal worth that cost."""
    if cap is None:
        return df
    ok = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= cap)
        .select(*key_cols)
    )
    return df.join(ok, key_cols, "left_semi")


def _with_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # project to the two needed columns FIRST (don't cache a wide corpus),
    # then spread across cores: small doc tables often arrive as one input
    # split, and the per-doc tokenize+shingle+md5 expressions are the
    # dominant cost
    df = df.select(id_col, text_col)
    fdf = _fanout(df)
    if fdf is df:
        # fanout_narrow_scan only proves under-splitting for LOCAL parquet
        # scans; when it declined AND the source is not local parquet
        # (in-memory frames, JDBC, CSV/JSON files, object-store URIs —
        # r16 ADVICE widened this from the former no-files-only check),
        # fall back to the partition-count probe so a 1-2-partition
        # source still fans the per-doc tokenize+shingle+md5 cost across
        # cores.  The df.rdd JavaRDD conversion is paid only on this
        # rare path; the common local-parquet path stays probe-free.
        try:
            files = df.inputFiles()
            local_parquet = bool(files) and all(
                f.startswith("file:") and f.endswith(".parquet") for f in files
            )
            target = df.sparkSession.sparkContext.defaultParallelism
            if not local_parquet and df.rdd.getNumPartitions() < target:
                fdf = df.repartition(target)
        except Exception:  # pragma: no cover - Connect session
            pass
    if fdf is not df:
        # persist boundary: without it Catalyst pushes the expensive
        # projection BELOW the round-robin exchange (to shrink shuffle
        # volume) and the shingling runs on the single scan task anyway.
        df = _persist(fdf)
    # stage the token array as a real projected column: inlining the
    # tokenizer into the shingle transform makes Catalyst re-evaluate the
    # split per shingle (no CSE across lambda scopes).  Single parsed
    # expressions per select (see similarity.py's module-top note on the
    # py4j cost of lambda-built trees).  The regex is escaped for SQL
    # string-literal semantics (escapedStringLiterals=false processes
    # backslashes), so a future TOKEN_RE with \\s-class atoms cannot
    # silently change meaning inside the quoted literal.
    tok_re = TOKEN_RE.replace("\\", "\\\\").replace("'", "\\'")
    staged = df.selectExpr(
        f"`{id_col}` AS __id",
        f"filter(split(lower(`{text_col}`), '{tok_re}'), x -> x != '') AS __tok",
    )
    sh_sql = (
        f"CASE WHEN size(__tok) >= {k} THEN array_distinct(transform("
        f"sequence(0, size(__tok) - {k}), i -> concat_ws(' ', "
        f"slice(__tok, i + 1, {k})))) ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return (
        staged.selectExpr("__id", f"{sh_sql} AS __sh")
        .where(F.expr("size(__sh) > 0"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.1,
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with exact k-word-shingle Jaccard >= threshold.

    Output: id_a, id_b, common, n_a, n_b (exact ints) + jac double."""
    sh = _with_shingles(df, id_col, text_col, k)
    return _jaccard_from_shingles(sh, threshold, max_df)


def _jaccard_from_shingles(
    sh: DataFrame, threshold: float, max_df: int | None = None
) -> DataFrame:
    """Exact Jaccard pairs over an already-shingled ``(__id, __sh)`` frame —
    split out so eval compositions (lsh_recall_curve) can shingle ONCE and
    feed both the ground-truth and the candidate branch."""
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    posting = drop_hot_keys(
        sh.select("__id", F.explode("__sh").alias("__s")), ["__s"], max_df
    )
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("n_a"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("n_b"))
    # no broadcast hint: one row per doc is unbounded at scale; AQE promotes
    # small sides to broadcast at runtime
    out = (
        common.join(na, "id_a").join(nb, "id_b")
        .withColumn("jac", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .where(F.col("jac") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "n_a", "n_b", "jac")


def _minhash_signature_sql(sh_sql: str, j: int) -> str:
    """Permutation ``j``'s min-hash: min md5 hex of seed-prefixed shingles
    (fixed-width lowercase hex => lexicographic min == numeric min;
    identical in duckdb)."""
    return f"array_min(transform({sh_sql}, s -> md5(concat('{j}#', s))))"


def minhash_signature_cols(sh_col: str, perms: int = MINHASH_PERMS) -> list:
    """One min-hash column per permutation over the named shingle column —
    each a single parsed expression (the former lambda-built trees cost
    dozens of py4j round trips per permutation)."""
    return [
        F.expr(_minhash_signature_sql(f"`{sh_col}`", j)).alias(f"__sig{j}")
        for j in range(perms)
    ]


def lsh_candidates(
    sh: DataFrame,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    max_band_df: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs over an already-shingled ``(__id, __sh)``
    frame: MinHash signatures, band keys, one equi-join on (band index,
    band key), distinct ``(id_a, id_b)`` with id_a < id_b.  ONE copy of
    the banding rule, shared by the dedup pipeline (minhash_lsh_pairs)
    and its recall evaluation (lsh_recall_curve).

    ``max_band_df`` is the hot-bucket valve (the band-key analog of the
    shingle index's ``max_df``): a band bucket shared by F docs emits
    F^2/2 candidate rows, so boilerplate that collapses thousands of
    documents onto one band key must be dropped BEFORE the pair join —
    one pre-aggregated (band, count) + semi-join, the count shuffle
    carries only band keys.  Buckets above the cap are dropped WHOLE
    (their members can still pair through their other bands).  ``None``
    keeps every bucket."""
    rows = perms // bands
    # ONE selectExpr computes every band key, with each permutation's
    # min-hash inlined into its band's md5 (each signature belongs to
    # exactly one band, so nothing is computed twice); a second selectExpr
    # melts to (band index, band key) rows.  Two parsed round trips where
    # the former Column-tree construction paid hundreds.
    band_exprs = [
        "md5(concat('{b}@', {sigs})) AS __band{b}".format(
            b=b,
            sigs=", ".join(
                _minhash_signature_sql("__sh", b * rows + r) for r in range(rows)
            ),
        )
        for b in range(bands)
    ]
    banded = sh.selectExpr("__id", *band_exprs)
    melt_sql = "explode(array({})) AS e".format(
        ",".join(f"struct({b} AS bi, __band{b} AS bk)" for b in range(bands))
    )
    melted = banded.selectExpr("__id", melt_sql).selectExpr(
        "__id", "e.bi AS __bi", "e.bk AS __bk"
    )
    melted = drop_hot_keys(melted, ["__bi", "__bk"], max_band_df)
    a = melted.alias("a")
    b = melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__bi") == F.col("b.__bi"))
            & (F.col("a.__bk") == F.col("b.__bk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    max_band_df: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard verified.

    LSH generates candidates (any shared band); the verify stage joins the
    two shingle sets and keeps exact Jaccard >= threshold.  Output:
    id_a, id_b, common, n_a, n_b, jac.  ``max_band_df`` passes through to
    :func:`lsh_candidates` (hot-band-bucket valve)."""
    sh = _persist(_with_shingles(df, id_col, text_col, k))
    cand = lsh_candidates(sh, perms, bands, max_band_df)
    sa = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    sb = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sha", "__shb")).cast("bigint").alias("common"),
            F.size("__sha").cast("bigint").alias("n_a"),
            F.size("__shb").cast("bigint").alias("n_b"),
        )
        .withColumn("jac", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .where(F.col("jac") >= threshold)
    )
    return verified


def lsh_recall_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.1,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    max_df: int | None = None,
) -> DataFrame:
    """LSH candidate recall by similarity bucket — the S-curve validation
    that decides a banding configuration before a production dedup run:
    for every exact-Jaccard pair >= ``threshold`` (ground truth), did the
    banded MinHash surface it as a candidate?  Grouped by Jaccard decile
    so the output IS the measured S-curve: high-similarity deciles must
    approach full recall; the low tail quantifies what the banding
    (perms/bands) trades away.  Output ``(jac_decile, n_exact, n_found)``
    — the decile is integer arithmetic ``(common * 10) div (union)``, so
    the whole result is engine-hash-exact with no float bucketing.

    Documents shingle ONCE (both branches read the persisted shingle
    frame); the ground-truth branch is the inverted-index equi-join
    (``max_df`` caps hot-shingle posting-list fan-out, exactly as in
    :func:`jaccard_pairs` — the escape hatch for validating on a slice
    with frequent shingles), the candidate branch is the banding
    equi-join, and the comparison joins two pair sets bounded by the
    true near-dup volume."""
    sh = _persist(_with_shingles(df, id_col, text_col, k))
    truth = _jaccard_from_shingles(sh, threshold, max_df)
    cand = lsh_candidates(sh, perms, bands).withColumn("__f", F.lit(1))
    decile = F.expr("(common * 10) div (n_a + n_b - common)")
    return (
        truth.join(cand, ["id_a", "id_b"], "left")
        .groupBy(decile.cast("bigint").alias("jac_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum(F.coalesce("__f", F.lit(0))).cast("bigint").alias("n_found"),
        )
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash per document — pure JVM column expressions.

    Semantics (bit-for-bit the classic construction): for each token (with
    multiplicity) take the first 8 bytes of ``md5(token)`` as a 64-bit
    little-endian bit vector; each bit votes +1/-1; output bit k is set iff
    the k-th vote count is positive; the 64 bits pack little-endian into a
    signed int64.  Tokenless documents hash to 0.

    Shape for scale: explode tokens -> 8 tiny byte columns from the md5 hex
    -> ``groupBy(id)`` with 64 conditional bit-count sums.  Partial (map-
    side) aggregation reduces each doc to 65 longs before the one shuffle,
    and everything stays inside whole-stage codegen — no Python, unlike the
    prior pandas-UDF version which looped per row and per token.

    Returns ``(id_col, out_col)`` — one row per distinct input row id.
    """
    # explode_outer keeps tokenless docs as a single null-token row, so they
    # surface with n=0 -> all vote conditions false -> simhash 0
    tok = df.selectExpr(
        f"`{id_col}`", f"explode_outer({tokens_sql(f'`{text_col}`')}) AS __t"
    )
    h = F.md5(F.col("__t"))
    tokb = tok.select(
        id_col,
        *[
            F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("int").alias(f"__b{i}")
            for i in range(8)
        ],
    )
    ones = [
        F.coalesce(
            F.sum(F.shiftright(F.col(f"__b{k // 8}"), k % 8).bitwiseAND(F.lit(1))),
            F.lit(0),
        ).alias(f"__o{k}")
        for k in range(64)
    ]
    agg = tokb.groupBy(id_col).agg(F.count(F.col("__b0")).alias("__n"), *ones)
    # votes_k = 2*ones_k - n  >  0  <=>  2*ones_k > n; bit 63 carries the
    # int64 sign, so its weight is -(2^63) (same two's-complement packing as
    # int.from_bytes(..., signed=True))
    sim = F.lit(0).cast("long")
    for k in range(64):
        weight = (1 << k) if k < 63 else -(1 << 63)
        sim = sim + F.when(
            F.col(f"__o{k}") * 2 > F.col("__n"), F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sim.alias(out_col))


def hamming_neardup_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs of any 64-bit signature column by Hamming distance,
    blocked on 16-bit chunks: by pigeonhole a pair with Hamming <= 3
    differing bits cannot touch all 4 chunks, so it must share one -> the
    join is equi on chunk value, not a cross join.  For ``max_hamming`` >
    3 the blocking is a recall<1 filter (guaranteeing k requires k+1
    chunks).  Generic over the signature source — SimHash over text,
    average-hash over images — anything that packs locality into 64 bits.

    Scale shape: explode ×4 tiny (id, chunk) rows, equi-join, distinct,
    exact `bit_count` refine — the shuffle carries signatures, never the
    underlying documents/pixels."""
    # persist: one small row per id, and the a/b self-join below would
    # otherwise recompute the upstream signature (a full aggregation or a
    # mapInPandas decode) twice
    s = _persist(hashed.select(id_col, hash_col))
    chunks = s.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright(hash_col, c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("e"),
    ).select(id_col, hash_col, F.col("e.ci").alias("ci"), F.col("e.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("sh_a"),
            F.col(f"b.{hash_col}").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — the text instantiation
    of :func:`hamming_neardup_pairs` over :func:`simhash64`."""
    return hamming_neardup_pairs(
        simhash64(df.select(id_col, text_col), id_col, text_col),
        id_col=id_col,
        hash_col="simhash",
        max_hamming=max_hamming,
    )


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    max_iterations: int = 50,
) -> DataFrame:
    """Canonical-document assignment over a near-dup pair graph: every
    vertex gets the SMALLEST id reachable through the pairs (its connected
    component's canonical id).  The dedup-cluster step that follows any
    pairwise near-dup stage.

    Spark-first iterative fixpoint (min-label propagation): each round
    joins the current labels across the bidirectional edge list, keeps the
    per-vertex minimum, and stops when a round changes nothing — the
    driver only ever sees one aggregate count per round, all data stays
    distributed.  Rounds needed = graph diameter (near-dup components are
    shallow; ``max_iterations`` is a guard, convergence is checked, not
    assumed).  Each round is one shuffle on vertex id.

    Every round's result is ``localCheckpoint``-ed (eager), NOT merely
    persisted: each round references the previous labels TWICE (the
    neighbor-min join and the convergence diff), so without lineage
    truncation the logical plan doubles per round and Catalyst re-analysis
    goes exponential — an 8-round graph took 30 s/round and OOM'd an 8 GB
    driver at 500 vertices before this (found via x_semantic_dedup, whose
    components are deeper than the shingle graphs').  Same discipline for
    the edge list, which round plans would otherwise re-embed wholesale.
    The iterative-algorithm standard (GraphFrames does the same); the
    truncated partitions live in executor storage with disk spill.

    Returns (id_col, canonical_id).  Deterministic; a recursive-CTE SQL
    twin (transitive closure + group-min) oracles it for bounded
    components."""
    a, b = pair_cols
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = edges.union(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.vid)
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, "vid", "left")
            .select(
                "vid",
                # least() ignores the NULL from vertices with no in-edges
                F.least(F.col("lbl"), F.col("nlbl")).alias("lbl"),
                # the label changes exactly when a strictly smaller
                # neighbor min arrived — computing the flag HERE makes
                # the convergence check a filter-count over the fresh
                # checkpoint instead of a second labels-vs-labels join
                # + shuffle per round (round 16; same semantics as the
                # old new-vs-old diff by definition of least())
                (F.col("nlbl") < F.col("lbl")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).count()
        # the convergence count (not the new checkpoint's
        # materialization) was the old checkpoint's last reader under
        # the former diff-join shape; with the inline flag the new
        # checkpoint no longer reads the old labels after its own
        # materialization, but releasing AFTER the count keeps the
        # ordering obviously safe either way
        _release_ckpt(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return labels.select(
        F.col("vid").alias(id_col), F.col("lbl").alias("canonical_id")
    )


def contamination_counts(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: per training document, how many of
    its distinct k-word shingles also occur anywhere in the benchmark set.

    Output: ``(id_col, n_grams, n_hit)`` — one row per training doc that
    has at least k tokens; ``n_hit == 0`` means clean.

    100 TB shape: the benchmark's distinct shingles and the training
    postings both collapse to an 8-byte ``xxhash64`` before the shuffle
    (joining on raw shingle strings would move ~20 bytes/posting; the
    64-bit space makes a cross-set collision astronomically unlikely and
    any collision only *inflates* a contamination count, never hides one).
    Join strategy is left to AQE: a small benchmark broadcasts, a large
    one degrades to a hash join on the 8-byte key.  No driver-side state.
    """
    tr = _with_shingles(train, id_col, text_col, k)
    bg = (
        _with_shingles(benchmark, id_col, text_col, k)
        .select(F.explode("__sh").alias("__g"))
        .select(F.xxhash64("__g").alias("__h"))
        .distinct()
    )
    posts = tr.select("__id", F.explode("__sh").alias("__g")).select(
        "__id", F.xxhash64("__g").alias("__h")
    )
    hits = (
        posts.join(bg, "__h")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        tr.select("__id", F.size("__sh").cast("bigint").alias("n_grams"))
        .join(hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
        )
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_common: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Partial-overlap candidate pairs via winnowing fingerprints
    (:func:`~.text.winnow_fingerprints`): explode each doc's fingerprint
    set, equi-join on fingerprint, keep pairs sharing ``min_common`` fps.

    ``max_df`` is the hot-fingerprint guard: a fingerprint shared by F
    documents contributes F*(F-1)/2 join rows, so one ubiquitous
    boilerplate paragraph (license header, page template) makes a single
    fp group quadratic at corpus scale.  Fingerprints appearing in more
    than ``max_df`` docs are pruned with a pre-join aggregate + left-semi
    (the same bound :func:`jaccard_pairs` applies to shingles).  Such fps
    carry no dedup signal anyway — boilerplate is not evidence two docs
    duplicate each other.

    Output: id_a, id_b, common (bigint), with id_a < id_b."""
    from .text import winnow_fingerprints

    fp = winnow_fingerprints(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        k=k,
        w=w,
    )
    # fps are distinct per doc, so count(*) per fp == doc frequency
    post = drop_hot_keys(
        fp.select("doc_id", F.explode("fps").alias("fp")), ["fp"], max_df
    )
    a, b = post.alias("a"), post.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )


def fuzzy_match_names(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """Entity-resolution fuzzy match over the DISTINCT value dictionary of
    ``name_col``: pairs (name_a < name_b) within Levenshtein ``max_dist``,
    candidate-blocked on the last whitespace token.

    Matching the dictionary, not the rows, is what scales: duplicate rows
    collapse before any pairing, so the quadratic work is bounded by
    distinct names per block, not row counts.  Blocking on the final token
    (the head noun in '<modifier> <noun>' names) keeps each block small;
    like any LSH-style blocker it trades recall for scale — typos in the
    blocking token cross blocks and are missed, which is the documented
    contract.  ``levenshtein`` is identical in Spark and duckdb, so the
    whole operator is oracle-exact.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    blocked = names.select(
        "name", F.element_at(F.split("name", " "), -1).alias("__blk")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .where(dist <= max_dist)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("bigint").alias("dist"),
        )
    )
