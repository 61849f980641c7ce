"""LLM-data-pipeline query corpus — dedup / similarity / text / multimodal.

Registered into the same REGISTRY as the declared corpus (``corpus.py``).
EVERY registered query carries a duckdb oracle (QUERIES.md records the
generated count): the oracle replicates the FULL pipeline, including
MinHash-LSH candidate generation — possible because the hash family is
md5-based and portable.  Float-summation-order-sensitive scale paths
(blocked-GEMM knn, SimHash pandas UDF) reach oracle parity through
integer-exact formulations (quantized fixed-point accumulation, rounded
rank keys) and are additionally cross-validated against their exact twins
by property tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import bloom, dedup, delta, graph, layout, multimodal, packing, profiling, quantize, sampling, similarity, sketches, text
from ..operators.caching import persist_bounded as _persist
from ..session import load
from .corpus import register, retire

# ---------------------------------------------------------------------------
# Shared duckdb SQL fragments (mirror operators/text.py exactly)
# ---------------------------------------------------------------------------

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SHS = (
    "list_distinct(list_transform(range(1, len(toks)-1), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)
_STOP_IN = ", ".join(f"'{w}'" for w in text.STOPWORDS)

_TOK_CTE = f"WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)"
_SH_CTE = (
    f"{_TOK_CTE}, sh0 AS (SELECT doc_id, {_SHS} AS shs FROM t WHERE len(toks) >= 3)"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "x_token_stats",
    "SELECT doc_id, "
    "CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws, "
    f"CAST(len({_TOKS}) AS BIGINT) AS n_alnum, "
    "CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct "
    "FROM documents",
    doc="Token counting: whitespace tokens, alnum tokens, punctuation chars "
    "(pure column exprs, codegen'd)",
)
def x_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.token_stats(d).drop("text")


@register(
    "x_text_quality",
    f"""
{_TOK_CTE}
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tok,
  CAST(CASE WHEN toks IS NULL THEN NULL
       ELSE COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) END
       AS BIGINT) AS sum_tok_len,
  CAST(len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS BIGINT) AS n_stop,
  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
  CASE WHEN len(toks) > 0
       THEN COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) / CAST(len(toks) AS DOUBLE)
       ELSE 0.0 END AS avg_tok_len,
  CASE WHEN len(toks) > 0
       THEN len(list_filter(toks, x -> x IN ({_STOP_IN}))) / CAST(len(toks) AS DOUBLE)
       ELSE 0.0 END AS stop_ratio,
  CASE WHEN length(text) > 0
       THEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) / CAST(length(text) AS DOUBLE)
       ELSE 0.0 END AS punct_ratio
FROM t
""".strip(),
    doc="Quality features: integer numerators exact, ratios single IEEE divisions",
)
def x_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_features(d).drop("text")


def _langid_oracle() -> str:
    scores = {
        lg: f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in ws)})))"
        for lg, ws in text.LANG_LEXICON.items()
    }
    langs = sorted(text.LANG_LEXICON)
    best = "greatest(" + ", ".join(scores[lg] for lg in langs) + ")"
    cases = " ".join(f"WHEN {scores[lg]} = __best THEN '{lg}'" for lg in langs)
    return f"""
{_TOK_CTE}, s AS (SELECT doc_id, toks, {best} AS __best FROM t)
SELECT doc_id, CASE WHEN __best = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred FROM s
""".strip()


@register(
    "x_langid",
    _langid_oracle(),
    doc="Stopword-lexicon language ID (argmax with lexicographic tie-break)",
)
def x_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.lang_id(d).drop("text")


@register(
    "x_fingerprint",
    f"""
{_TOK_CTE}, s AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 3 THEN {_SHS} ELSE [] END AS shs
  FROM t)
SELECT doc_id,
  CASE WHEN toks IS NULL THEN NULL
       ELSE md5(COALESCE(array_to_string(toks, ' '), '')) END AS fp_md5,
  CASE WHEN len(shs) > 0 THEN list_min(list_transform(shs, x -> md5(x)))
       ELSE NULL END AS fp_minshingle
FROM s
""".strip(),
    doc="Document fingerprints: md5 of normalized token stream + "
    "1-perm MinHash sketch (min shingle md5)",
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.fingerprint(d).drop("text")


retire(
    "x_fingerprint",
    "stage twin: fp_md5 derivation is replayed inside x_dedup_normalized's "
    "oracle; the 1-perm min-shingle sketch is subsumed by the full MinHash "
    "gate x_minhash_lsh_pairs",
)


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@register(
    "x_dedup_normalized",
    f"""
{_TOK_CTE}, fp AS (SELECT doc_id,
  CASE WHEN toks IS NULL THEN NULL
       ELSE md5(COALESCE(array_to_string(toks, ' '), '')) END AS fp_md5 FROM t)
SELECT min(doc_id) AS doc_id, fp_md5 FROM fp GROUP BY fp_md5
""".strip(),
    doc="Normalize-then-dedup: exact dedup on the normalized-content "
    "fingerprint, keeping the lowest doc_id",
)
def x_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    fp = text.fingerprint(d).select("doc_id", "fp_md5")
    return dedup.exact_dedup(fp, ["fp_md5"], "doc_id")


# Exact-Jaccard pair CTEs over sh0 (the _SH_CTE output) — ONE copy, shared
# by x_jaccard_pairs and the LSH recall evaluation's ground-truth branch.
_JACCARD_PAIRS_CTE = """
post AS (SELECT doc_id, unnest(shs) AS s FROM sh0),
sizes AS (SELECT doc_id, len(shs) AS n FROM sh0),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
""".strip()

_JACCARD_ORACLE = f"""
{_SH_CTE},
{_JACCARD_PAIRS_CTE}
SELECT p.id_a, p.id_b, CAST(p.common AS BIGINT) AS common,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       p.common / CAST(na.n + nb.n - p.common AS DOUBLE) AS jac
FROM pairs p JOIN sizes na ON p.id_a = na.doc_id JOIN sizes nb ON p.id_b = nb.doc_id
WHERE p.common / CAST(na.n + nb.n - p.common AS DOUBLE) >= 0.1
""".strip()


@register(
    "x_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="Exact word-3-gram Jaccard near-dup pairs via inverted shingle "
    "index (explode -> equi-join -> count); threshold 0.1",
)
def x_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(d, threshold=0.1)


retire(
    "x_jaccard_pairs",
    "all-pairs ground-truth twin: x_lsh_recall's exact branch derives the "
    "identical _JACCARD_PAIRS_CTE pair set and gates it per Jaccard decile",
)


def _lsh_cand_cte(
    perms: int = dedup.MINHASH_PERMS,
    bands: int = dedup.LSH_BANDS,
    max_band_df: int | None = None,
) -> str:
    """The MinHash banding CTEs (sig -> band -> melt -> cand) over sh0 —
    ONE copy of the banding rule, shared by the x_minhash_lsh_pairs
    oracle, the recall evaluation's candidate branch, and the LSH-fed
    clustering oracle (mirrors the operator-side dedup.lsh_candidates
    split).  ``max_band_df`` is the literal twin of the engine-side
    hot-band-bucket valve: buckets with more members are dropped whole
    before the pair join."""
    rows = perms // bands
    sig_sql = ", ".join(
        f"list_min(list_transform(shs, s -> md5('{j}#' || s))) AS sig{j}" for j in range(perms)
    )
    band_sql = ", ".join(
        "md5('" + f"{b}@' || " + " || ".join(f"sig{b * rows + r}" for r in range(rows)) + f") AS band{b}"
        for b in range(bands)
    )
    melt = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bi, band{b} AS bk FROM band" for b in range(bands)
    )
    src = "melt"
    valve = ""
    if max_band_df is not None:
        valve = (
            "\nbok AS (SELECT bi, bk FROM melt GROUP BY bi, bk"
            f" HAVING count(*) <= {max_band_df}),"
            "\nmeltc AS (SELECT m.* FROM melt m JOIN bok USING (bi, bk)),"
        )
        src = "meltc"
    return f"""
sig AS (SELECT doc_id, shs, {sig_sql} FROM sh0),
band AS (SELECT doc_id, {band_sql} FROM sig),
melt AS ({melt}),{valve}
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM {src} a JOIN {src} b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id)
""".strip()


def _lsh_ver_cte(
    perms: int = dedup.MINHASH_PERMS,
    bands: int = dedup.LSH_BANDS,
    max_band_df: int | None = None,
) -> str:
    """Banding candidates + exact-Jaccard verification stats over sh0 —
    ONE copy of the verify rule, shared by the x_minhash_lsh_pairs
    oracle (threshold filter applied in its final select) and the
    x_dedup_clusters_lsh oracle (threshold filter applied on the edge
    set feeding the transitive closure)."""
    return f"""
{_lsh_cand_cte(perms, bands, max_band_df)},
ver AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS common,
         CAST(len(sa.shs) AS BIGINT) AS n_a, CAST(len(sb.shs) AS BIGINT) AS n_b
  FROM cand c JOIN sh0 sa ON c.id_a = sa.doc_id JOIN sh0 sb ON c.id_b = sb.doc_id)
""".strip()


def _minhash_oracle(perms: int = dedup.MINHASH_PERMS, bands: int = dedup.LSH_BANDS) -> str:
    return f"""
{_SH_CTE},
{_lsh_ver_cte(perms, bands)}
SELECT id_a, id_b, common, n_a, n_b,
       common / CAST(n_a + n_b - common AS DOUBLE) AS jac
FROM ver WHERE common / CAST(n_a + n_b - common AS DOUBLE) >= 0.5
""".strip()


@register(
    "x_minhash_lsh_pairs",
    _minhash_oracle(),
    doc="MinHash (16 md5 perms) + banded LSH (4x4) candidates, exact-Jaccard "
    "verified at 0.5 — the whole LSH pipeline is oracle-replicated in SQL",
)
def x_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.5)


_LSH_RECALL_ORACLE = f"""
{_SH_CTE},
{_JACCARD_PAIRS_CTE},
{_lsh_cand_cte()},
truth AS (
  SELECT p.id_a, p.id_b, p.common, na.n AS n_a, nb.n AS n_b
  FROM pairs p JOIN sizes na ON p.id_a = na.doc_id JOIN sizes nb ON p.id_b = nb.doc_id
  WHERE p.common / CAST(na.n + nb.n - p.common AS DOUBLE) >= 0.02)
SELECT (t.common * 10) // (t.n_a + t.n_b - t.common) AS jac_decile,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found
FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
""".strip()


@register(
    "x_lsh_recall",
    _LSH_RECALL_ORACLE,
    doc="LSH banding-quality evaluation: candidate recall of the 16-perm "
    "4x4-band MinHash against exact word-3-gram Jaccard pairs (>= 0.02), "
    "grouped by Jaccard decile — the measured S-curve that validates a "
    "banding configuration before a production dedup run (high deciles "
    "must approach full recall; the low tail is the designed trade). "
    "Documents shingle once for both branches; the decile is integer "
    "div arithmetic so the gate is hash-exact — "
    "operators/dedup.py::lsh_recall_curve",
)
def x_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.lsh_recall_curve(d, threshold=0.02)


def _simhash_oracle(max_hamming: int = 3) -> str:
    """Full SimHash64 pipeline in duckdb SQL, mirroring
    :func:`~..operators.dedup.simhash64` bit-for-bit: token md5 -> first 8
    bytes as a little-endian 64-bit vector -> per-bit vote sums -> signed
    int64 pack.  The pair stage is all-pairs + bit_count(xor) <= h, which
    equals the Spark side's 16-bit-chunk-blocked join exactly (pigeonhole
    guarantees recall for h <= 3)."""

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    bytes_sql = ", ".join(
        f"({nib(2 * i + 1)} * 16 + {nib(2 * i + 2)}) AS b{i}" for i in range(8)
    )
    ones_sql = ", ".join(
        f"CAST(COALESCE(sum((b{k // 8} >> {k % 8}) & 1), 0) AS BIGINT) AS o{k}"
        for k in range(64)
    )
    terms = " + ".join(
        f"(CASE WHEN 2 * o{k} > n THEN CAST({(1 << k) if k < 63 else '-9223372036854775807 - 1'} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for k in range(64)
    )
    return f"""
{_TOK_CTE},
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
hx AS (SELECT doc_id, md5(tk) AS h FROM tok),
byt AS (SELECT doc_id, {bytes_sql} FROM hx),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n, {ones_sql} FROM byt GROUP BY doc_id),
sim0 AS (SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM agg),
sim AS (SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
        FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sim0 s USING (doc_id)),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM sim a JOIN sim b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
""".strip()


@register(
    "x_simhash_pairs",
    _simhash_oracle(),
    doc="SimHash64 near-dup pairs (Hamming <= 3) with 16-bit chunk blocking "
    "(pigeonhole: guaranteed recall at <= 3, no cross join); hash computed "
    "as JVM column expressions and oracle-replicated end to end in SQL",
)
def x_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, max_hamming=3)


# SQL twins of similarity.valid_vectors — the oracles must replicate the
# engine's vector-validity domain exactly or hostile-but-legal corpora
# (NULL/empty/NaN/zero vectors) silently diverge (or crash DuckDB on a
# NaN/inf reaching an integer cast).
_VEC_VALID = (
    "embedding IS NOT NULL AND len(embedding) > 0 "
    "AND len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) = 0 "
    "AND len(list_filter(embedding, x -> x IS NULL)) = 0"
)
_VEC_NONZERO = _VEC_VALID + " AND len(list_filter(embedding, x -> x <> 0)) > 0"


def _bucket_sql(col: str, n_bits: int = 8) -> str:
    return " + ".join(
        f"(CASE WHEN CAST({col}[{i + 1}] AS DOUBLE) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )


def _cos_oracle(bucketed: bool) -> str:
    """Cosine near-dup oracle; ``bucketed=True`` replicates the sign-bit LSH
    candidate rule (bucket codes over the first 8 dims differing in <= 1
    bit) so the scale-path query is hash-checkable end to end."""
    cand_pred = (
        "AND bit_count(xor(a.bkt, b.bkt)) <= 1" if bucketed else ""
    )
    return f"""
WITH e AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bkt
           FROM embeddings WHERE {_VEC_NONZERO}),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    (SELECT sum(CAST(x.u AS DOUBLE) * CAST(x.v AS DOUBLE))
     FROM (SELECT unnest(a.embedding) AS u, unnest(b.embedding) AS v) x)
    / (sqrt((SELECT sum(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
             FROM (SELECT unnest(a.embedding) AS u) xa))
     * sqrt((SELECT sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))
             FROM (SELECT unnest(b.embedding) AS v) xb))) AS cos
  FROM e a, e b WHERE a.vec_id < b.vec_id
    AND len(a.embedding) = len(b.embedding) {cand_pred})
SELECT id_a, id_b, CAST(floor(cos * 1e6) AS BIGINT) AS cos_micro
FROM p WHERE cos >= 0.4
""".strip()


@register(
    "x_cosine_neardup",
    _cos_oracle(bucketed=True),
    doc="Embedding-cosine near-dup pairs (>= 0.4) via sign-bit LSH candidates "
    "(one-bit multi-probe, no cartesian) + exact fold-cosine verify; the "
    "oracle replicates the bucket rule, recall vs the exact twin is "
    "property-tested",
)
def x_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_bucketed(e, threshold=0.4)


# The all-pairs reference twin (similarity.cosine_pairs, cross join) is a
# correctness ANCHOR, not a query a user of the engine would run — it was
# registered as x_cosine_neardup_exact through round 7 and is now
# pytest-only (tests/test_exact_anchors.py runs it against
# _cos_oracle(bucketed=False) at sf0.001): registry slots are bounded by
# the driver-gate rotation capacity (window 50 x staleness 3 = 150), so
# anchor twins yield their slots to real queries.  See
# tests/test_rotation_window.py for the capacity policy.
COSINE_EXACT_ANCHOR_ORACLE = _cos_oracle(bucketed=False)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


_ANN_ORACLE = f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bkt
  FROM embeddings WHERE {_VEC_VALID}),
q AS (SELECT vec_id AS q_id, embedding AS qe, bkt FROM base WHERE vec_id BETWEEN 1 AND 5),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
    (SELECT sum((CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)) * (CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)))
     FROM (SELECT unnest(q.qe) AS a, unnest(e.embedding) AS b) x) AS dist
  FROM q JOIN base e ON q.bkt = e.bkt AND e.vec_id <> q.q_id
                      AND len(q.qe) = len(e.embedding)),
r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM pairs)
SELECT q_id, n_id, rnk FROM r WHERE rnk <= 5
""".strip()


@register(
    "x_ann_bucketed",
    _ANN_ORACLE,
    doc="LSH/IVF-style ANN: sign-bit bucket over first 8 dims, search within "
    "bucket only (equi-join) — deterministic, oracle-replicated",
)
def x_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").between(1, 5))
    return similarity.ann_bucketed(e, q, k=5)


retire(
    "x_ann_bucketed",
    "candidate-rule subset of x_ann_multiprobe (bit_count(xor)=0 is the "
    "probe ball's center cell; same operator, n_probes=1)",
)


_ANN_MULTIPROBE_ORACLE = f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bkt
  FROM embeddings WHERE {_VEC_VALID}),
q AS (SELECT vec_id AS q_id, embedding AS qe, bkt FROM base WHERE vec_id BETWEEN 1 AND 5),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
    (SELECT sum((CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)) * (CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)))
     FROM (SELECT unnest(q.qe) AS a, unnest(e.embedding) AS b) x) AS dist
  FROM q JOIN base e ON bit_count(xor(q.bkt, e.bkt)) <= 1 AND e.vec_id <> q.q_id
                      AND len(q.qe) = len(e.embedding)),
r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM pairs)
SELECT q_id, n_id, rnk FROM r WHERE rnk <= 5
""".strip()


@register(
    "x_ann_multiprobe",
    _ANN_MULTIPROBE_ORACLE,
    doc="Multi-probe ANN: the query side probes its own sign-bit bucket plus "
    "every one-bit flip (full Hamming-1 ball, n_probes=9) via the same "
    "probe-explode as the cosine near-dup path, so near-boundary vectors "
    "recover neighbors from adjacent sign cells; candidate rule replicated "
    "in the oracle as bit_count(xor) <= 1",
)
def x_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").between(1, 5))
    return similarity.ann_bucketed(e, q, k=5, n_bits=8, n_probes=9)


_ANN_BLOCKED_ORACLE = f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS DOUBLE)) AS emb
  FROM embeddings WHERE {_VEC_VALID}),
q AS (SELECT vec_id AS q_id, emb AS qe FROM base WHERE vec_id BETWEEN 1 AND 5),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
    (SELECT sum((x.a - x.b) * (x.a - x.b))
     FROM (SELECT unnest(q.qe) AS a, unnest(e.emb) AS b) x) AS dist
  FROM q, base e WHERE e.vec_id <> q.q_id AND len(q.qe) = len(e.emb)),
r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM pairs)
SELECT q_id, n_id, rnk FROM r WHERE rnk <= 10
""".strip()


@register(
    "x_ann_blocked",
    _ANN_BLOCKED_ORACLE,
    doc="Blocked-GEMM brute-force top-10 (the 100 TB scale path): broadcast "
    "query matrix, numpy matmul per Arrow batch, map-side top-k.  Gated at "
    "integer precision: embeddings are quantized (floor(x*1024)) so every "
    "GEMM/fold intermediate is an exact small integer in float64 and "
    "summation order cannot perturb ranks — the raw-float path is "
    "property-tested against the fold twin instead",
)
def x_ann_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # validity on the RAW vectors, BEFORE quantization: floor() maps a NaN
    # component to NULL, which would sneak past the NaN check inside
    # knn_blocked (the oracle's valid predicate is on raw embeddings too)
    e = similarity.valid_vectors(load(spark, sf_dir, "embeddings"), "embedding")
    eq = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1024).cast("double")
        ).alias("embedding"),
    )
    q = eq.where(F.col("vec_id").between(1, 5))
    return similarity.knn_blocked(eq, q, k=10)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "x_multimodal_meta",
    """
WITH m AS (SELECT doc_id, doc_id % 6 AS c, (doc_id % 2520) // 6 AS k FROM documents)
SELECT doc_id,
  CASE c WHEN 0 THEN 'mp3' WHEN 2 THEN 'wav' WHEN 3 THEN 'mp4' WHEN 4 THEN 'webm'
       WHEN 5 THEN CASE WHEN k % 2 = 0 THEN 'avif' ELSE 'heic' END
       ELSE CASE WHEN k % 2 = 0 THEN 'ogg-vorbis' ELSE 'ogg-opus' END END AS container,
  CAST(CASE c WHEN 0 THEN 1 + k % 2 WHEN 2 THEN 1
       WHEN 3 THEN CASE WHEN (k // 2) % 2 = 0
                   THEN (1 + k % 3) // 2 ELSE (2 + k % 3) // 2 END
       WHEN 4 THEN CASE WHEN (k // 2) % 2 = 0
                   THEN (1 + k % 3) // 2 ELSE (2 + k % 3) // 2 END
       WHEN 5 THEN 0
       ELSE 1 + (k // 2) % 2 END AS BIGINT) AS n_channels,
  CAST(CASE c
       WHEN 0 THEN CASE k % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
       WHEN 2 THEN 8000
       WHEN 3 THEN CASE WHEN k % 2 = 0 THEN 600 ELSE 90000 END
       WHEN 4 THEN 1000000
       WHEN 5 THEN 0
       ELSE CASE WHEN k % 2 = 1 THEN 48000 ELSE
            CASE k % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 44100 ELSE 48000 END
       END END AS BIGINT) AS sample_rate,
  CAST(CASE c
       WHEN 0 THEN 8 + k % 7
       WHEN 2 THEN 800 + ((4 * k) % 5) * 160
       WHEN 3 THEN 1 + k % 3
       WHEN 4 THEN 1 + k % 3
       WHEN 5 THEN 1 + k % 3
       ELSE CASE WHEN k % 2 = 1 THEN 3
            ELSE 3 + k % 3 + CASE WHEN k % 4 = 2 THEN 1 ELSE 0 END END
       END AS BIGINT) AS n_units,
  CAST(CASE c
       WHEN 0 THEN (8 + k % 7) * 1152 * 1000 //
            CASE k % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
       WHEN 2 THEN (800 + ((4 * k) % 5) * 160) // 8
       WHEN 3 THEN ((2 + k % 5) * CASE WHEN k % 2 = 0 THEN 600 ELSE 90000 END + k % 7)
            * 1000 // CASE WHEN k % 2 = 0 THEN 600 ELSE 90000 END
       WHEN 4 THEN 1500 + (k % 7) * 500
       WHEN 5 THEN 0
       ELSE CASE WHEN k % 2 = 1 THEN 20 * (20 + k % 10)
            ELSE (2000 + (k % 5) * 800) * 1000 //
                 CASE k % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 44100 ELSE 48000 END
       END END AS BIGINT) AS duration_ms,
  CAST(CASE c
       WHEN 0 THEN CASE k % 4 WHEN 0 THEN 64 WHEN 1 THEN 96 WHEN 2 THEN 128 ELSE 160 END
       WHEN 2 THEN 128
       WHEN 3 THEN 0
       WHEN 4 THEN 0
       WHEN 5 THEN 0
       ELSE CASE WHEN k % 2 = 1 THEN 0 ELSE 64 + (k % 5) * 16 END
       END AS BIGINT) AS bitrate_kbps,
  CAST(CASE WHEN c = 5 THEN 64 + (k % 5) * 16 ELSE 0 END AS BIGINT) AS width,
  CAST(CASE WHEN c = 5 THEN 48 + (k % 7) * 12 ELSE 0 END AS BIGINT) AS height
FROM m
""".strip(),
    doc="Multimodal container sniffing through the REAL container "
    "parsers — the crawl-side route/filter/measure step that needs no "
    "sample decode: payload class rotates doc_id % 6 across MP3 (CBR "
    "Layer III frame walk with ID3v2 skip and Xing/Info cross-check, "
    "operators/mpeg_audio.py), Ogg (CRC-verified page walk, packet "
    "reassembly incl. a forced continued-page class, Vorbis ident / "
    "OpusHead headers with granule-exact durations, operators/ogg.py), "
    "PCM16 WAV (RIFF via the real decode_audio path), MP4 (ISO-BMFF "
    "box walk: ftyp brand, mvhd v0/v1 timescale-exact duration, "
    "per-trak hdlr kinds; every 4th payload is FRAGMENTED fMP4/DASH — "
    "mvex/trex defaults, tfhd overrides, exact trun duration sums — "
    "with a layout-invariant closed form, operators/mp4.py), WebM "
    "(EBML varint "
    "element walk incl. the unknown-size Segment escape, float "
    "Duration, TrackEntry kinds, operators/webm.py) and — round 15 — "
    "HEIF/AVIF still images (ISO 23008-12 meta item walk: ftyp brand "
    "routing, pitm/iinf item tables, primary ispe dims resolved "
    "through the ipma association with a ROTATING primary item and "
    "decoy dims on non-primary items, 15-bit property indices and "
    "32-bit v1 item-id forms in the structural rotation, "
    "operators/mp4.py::parse_heif_meta); emits codec "
    "identity, "
    "channels, rate, native unit count, duration, bitrate and, for "
    "still images, primary width/height — every "
    "field pinned closed-form by the oracle from the synth formulas. "
    "The sample/spectral decode behind these containers stays the "
    "declared decode_fn seam (COVERAGE.md); MP3 digital silence — the "
    "one spectral case exactly derivable from structure — decodes "
    "bit-exactly (mpeg_audio.decode_mp3_samples, pytest-gated). Scale: "
    "one scan + mapInPandas, no shuffle; pixels/samples never leave "
    "the executor",
)
def x_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload(d, "container", key_mod=2520)
    return multimodal.extract_container_meta(pay)


# ---------------------------------------------------------------------------
# Composite training-data prep pipeline
# ---------------------------------------------------------------------------


def _datapipe_oracle() -> str:
    scores = {
        lg: f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in ws)})))"
        for lg, ws in text.LANG_LEXICON.items()
    }
    best = "greatest(" + ", ".join(scores[lg] for lg in sorted(text.LANG_LEXICON)) + ")"
    return f"""
WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
s AS (SELECT *, {best} AS best, {scores['de']} AS s_de, {scores['en']} AS s_en FROM t),
en AS (SELECT * FROM s WHERE best > 0 AND s_en = best AND s_de < best),
q AS (SELECT doc_id, source, toks, len(toks) AS n_tok,
         len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS n_stop
      FROM en),
fil AS (SELECT * FROM q WHERE n_tok >= 30 AND n_stop * 25 >= n_tok),
fp AS (SELECT *, md5(array_to_string(toks, ' ')) AS fp_md5 FROM fil),
ded AS (SELECT * FROM fp WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fp_md5))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM ded GROUP BY source
""".strip()


@register(
    "x_datapipe_prep",
    _datapipe_oracle(),
    doc="End-to-end training-data prep composite: language-ID filter (en, "
    "tie-break-aware) -> quality gate (n_tok >= 30, integer stopword-ratio "
    "floor) -> normalized exact dedup on the token-stream fingerprint -> "
    "per-source corpus stats.  One declarative plan: every stage is column "
    "expressions feeding one groupBy + semi-join + final aggregate, so "
    "Catalyst fuses the filters into the scan and the whole prep runs in "
    "two shuffles (dedup key, final group)",
)
def x_datapipe_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    en = text.lang_id(d).where(F.col("lang_pred") == "en")
    qf = text.quality_features(en).where(
        (F.col("n_tok") >= 30) & (F.col("n_stop") * 25 >= F.col("n_tok"))
    )
    fp = text.fingerprint(qf).select("doc_id", "source", "n_tok", "fp_md5")
    # persist fence: exact_dedup references fp twice (group-min + semi-join);
    # without it the whole tokenize/langid/quality expression tree runs twice
    # over the raw corpus — the projection here is 4 narrow columns, far
    # smaller than the input, so caching it is the right 100 TB shape too
    fp = _persist(fp)
    ded = dedup.exact_dedup(fp, ["fp_md5"], "doc_id")
    return ded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tok"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "x_ngram_topk",
    f"""
{_TOK_CTE},
s AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)),
                                          i -> array_to_string(toks[i:i+1], ' '))) AS bgs
      FROM t WHERE len(toks) >= 2),
g AS (SELECT doc_id, unnest(bgs) AS bg FROM s)
SELECT bg, CAST(count(*) AS BIGINT) AS df
FROM g GROUP BY bg ORDER BY df DESC, bg LIMIT 20
""".strip(),
    doc="Corpus n-gram statistics: top-20 word bigrams by document "
    "frequency (distinct per doc -> count = df), deterministic tie-break. "
    "Partial aggregation map-side, TakeOrderedAndProject top-k — no global "
    "sort of the full bigram table",
)
def x_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    bg = d.selectExpr(
        "doc_id",
        f"explode({text.word_shingles_sql(text.tokens_sql('text'), 2)}) AS bg",
    )
    agg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("df"))
    return agg.orderBy(F.col("df").desc(), F.col("bg")).limit(20)


# Integer squared-L2 between two quantized lists — the distance form every
# vector oracle in this family shares (sequential unnest-sum matches the
# engine's bigint fold exactly).
_INT_L2 = ("(SELECT sum((x.u - x.v) * (x.u - x.v)) "
           "FROM (SELECT unnest({a}) AS u, unnest({b}) AS v) x)")


def _ivf_cte(dim: int = 64, coarse_bits: int = 4, n_probes: int = 2,
             scale: int = 1024) -> str:
    """The IVF CTE chain (quantize -> seed cells -> floored-mean integer
    centroids -> Lloyd re-assignment -> probe -> ranked candidates `r`),
    shared by the x_ann_ivf oracle and the x_ann_recall oracle so both
    gates derive the index from ONE definition."""
    cell = " + ".join(
        f"(CASE WHEN qv[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(coarse_bits)
    )
    cent_list = ", ".join(
        f"CAST(floor(sum(qv[{i + 1}]) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
        for i in range(dim)
    )
    return f"""
q0 AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
  FROM embeddings WHERE len(embedding) = {dim}
    AND len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) = 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
c0 AS (SELECT vec_id, qv, {cell} AS seed FROM q0),
cent AS (SELECT seed AS cell, [{cent_list}] AS c FROM c0 GROUP BY seed),
asg AS (SELECT v.vec_id, v.qv, ct.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_INT_L2.format(a='v.qv', b='ct.c')}, ct.cell) AS r
        FROM c0 v, cent ct),
base_a AS (SELECT vec_id, qv, cell FROM asg WHERE r = 1),
probe AS (SELECT vec_id, qv, cell FROM asg WHERE vec_id BETWEEN 1 AND 5 AND r <= {n_probes}),
cand AS (SELECT p.vec_id AS q_id, b.vec_id AS n_id,
                {_INT_L2.format(a='p.qv', b='b.qv')} AS dist
         FROM probe p JOIN base_a b ON p.cell = b.cell AND b.vec_id <> p.vec_id
                                    AND len(p.qv) = len(b.qv)),
r AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM cand)
""".strip()


def _ivf_oracle(dim: int = 64, coarse_bits: int = 4, n_probes: int = 2,
                k: int = 5, scale: int = 1024) -> str:
    return (
        f"WITH {_ivf_cte(dim, coarse_bits, n_probes, scale)}\n"
        f"SELECT q_id, n_id, rnk FROM r WHERE rnk <= {k}"
    )


@register(
    "x_ann_ivf",
    _ivf_oracle(),
    doc="IVF ANN with data-derived centroids, fully oracle-gated: sign-seeded "
    "cells, element-wise floored-mean integer centroids (exact integer "
    "sums, one Lloyd-style nearest-centroid re-assignment), queries probe "
    "their 2 nearest cells, exact integer-L2 top-5 on candidates. "
    "Centroid table is 16 rows (broadcast); base scanned once; one shuffle "
    "for the final per-query top-k",
)
def x_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").between(1, 5))
    return similarity.ann_ivf(e, q, dim=64, k=5, coarse_bits=4, n_probes=2)


def _ann_recall_oracle(dim: int = 64, coarse_bits: int = 4, n_probes: int = 2,
                       k: int = 5, scale: int = 1024) -> str:
    """x_ann_recall's twin: the shared IVF CTE chain plus an exact
    quantized-space top-k ground truth, compared per query.  Integer
    counts only — recall@k = n_hits / n_exact, computed by the reader."""
    return f"""
WITH {_ivf_cte(dim, coarse_bits, n_probes, scale)},
ivf AS (SELECT q_id, n_id FROM r WHERE rnk <= {k}),
exr AS (SELECT q.vec_id AS q_id, b.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_INT_L2.format(a='q.qv', b='b.qv')}, b.vec_id) AS rnk
        FROM (SELECT * FROM q0 WHERE vec_id BETWEEN 1 AND 5) q
        JOIN q0 b ON b.vec_id <> q.vec_id),
ex AS (SELECT q_id, n_id FROM exr WHERE rnk <= {k})
SELECT ex.q_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN ivf.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
FROM ex LEFT JOIN ivf ON ex.q_id = ivf.q_id AND ex.n_id = ivf.n_id
GROUP BY ex.q_id
""".strip()


@register(
    "x_ann_recall",
    _ann_recall_oracle(),
    doc="ANN index-quality evaluation: recall@5 of the IVF index "
    "(x_ann_ivf's exact configuration) against the exact quantized-space "
    "top-5 ground truth, per query — the gate a production vector "
    "pipeline clears before trusting an approximate index (tune "
    "coarse_bits/n_probes until recall passes, THEN deploy). Emits "
    "integer (n_exact, n_hits) so the hash is float-free; both branches "
    "share the quantization and tie rules, so the comparison is "
    "deterministic even at distance ties. The exact branch is one extra "
    "base scan + broadcast of the 5-query matrix + one top-k shuffle — "
    "operators/similarity.py::ann_recall",
)
def x_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id").between(1, 5))
    return similarity.ann_recall(e, q, dim=64, k=5, coarse_bits=4, n_probes=2)


def _kmeans_oracle(dim: int = 64, coarse_bits: int = 3, n_iters: int = 4,
                   scale: int = 1024) -> str:
    """Unrolled-CTE twin of similarity.kmeans_iter: sign-bit seed, then
    n_iters x (floored-mean integer centroids -> exact-integer-L2
    nearest-centroid re-assignment, ties to smallest cluster id)."""
    cell = " + ".join(
        f"(CASE WHEN qv[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(coarse_bits)
    )
    cent_list = ", ".join(
        f"CAST(floor(sum(qv[{i + 1}]) / CAST(count(*) AS DOUBLE)) AS BIGINT)"
        for i in range(dim)
    )
    d = ("(SELECT sum((x.u - x.v) * (x.u - x.v)) "
         "FROM (SELECT unnest(v.qv) AS u, unnest(ct.c) AS v) x)")
    steps = []
    for i in range(1, n_iters + 1):
        steps.append(
            f"c{i} AS (SELECT cid, [{cent_list}] AS c FROM a{i - 1} GROUP BY cid),\n"
            f"s{i} AS (SELECT v.vec_id, v.qv, ct.cid, {d} AS d FROM a0 v, c{i} ct),\n"
            f"a{i} AS (SELECT vec_id, qv, cid, d FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r "
            f"FROM s{i}) WHERE r = 1)"
        )
    return f"""
WITH q0 AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
  FROM embeddings WHERE len(embedding) = {dim}
    AND len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) = 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
a0 AS (SELECT vec_id, qv, CAST({cell} AS BIGINT) AS cid FROM q0),
{",".join(steps)}
SELECT cid, CAST(count(*) AS BIGINT) AS n_pts, CAST(sum(d) AS BIGINT) AS inertia
FROM a{n_iters} GROUP BY cid
""".strip()


@register(
    "x_kmeans_iter",
    _kmeans_oracle(),
    doc="Iterative Lloyd's k-means over the embedding corpus (4 full "
    "iterations, 8 sign-bit-seeded clusters), integer-exact end to end: "
    "floored-mean integer centroids from exact integer sums, "
    "nearest-centroid re-assignment by exact integer squared L2 with "
    "(dist, cid) tie-break, final (cid, n_pts, inertia) cluster report "
    "— the SemDeDup-style curation clustering pass. Per-iteration state "
    "is the 8-row centroid table (collected, inlined as one literal "
    "expression), so every assignment is scan-side: no join, window, or "
    "corpus shuffle in the loop; the unrolled-CTE oracle replays the "
    "identical iteration sequence — "
    "operators/similarity.py::kmeans_iter",
)
def x_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.kmeans_iter(e, dim=64, n_iters=4, coarse_bits=3)


# Shared int8-quantization CTE (mirrors operators/quantize.py exactly:
# corpus-global scale, two IEEE ops + exact floor per component, clamp at
# the 1-ulp-under -127 edge).
# Validity domain is the one shared engine contract
# (similarity.valid_vectors, which quantize.with_int8_codes reuses):
# NULL/empty/NaN/NULL-component vectors are excluded from the scale AND
# the codes (one NaN would poison the corpus max into NaN).  One constant,
# not a re-typed copy — a domain change must hit every oracle family at
# once or the quantize oracles silently split from the ann oracles.
_Q8_VALID = _VEC_VALID
_Q8_CTE = f"""
WITH s AS (SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS m
           FROM embeddings WHERE {_Q8_VALID}),
c AS (SELECT vec_id,
             CASE WHEN m > 0
                  THEN list_transform(embedding, x ->
                       greatest(-127, CAST(floor(CAST(x AS DOUBLE) * 127.0 / m) AS BIGINT)))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q8
      FROM embeddings CROSS JOIN s
      WHERE {_Q8_VALID})
""".strip()


@register(
    "x_embed_quantize8",
    f"""
{_Q8_CTE}
SELECT vec_id, CAST(len(q8) AS BIGINT) AS n_dims,
       CAST(len(list_filter(q8, c -> abs(c) = 127)) AS BIGINT) AS n_sat,
       CAST(COALESCE(list_sum(q8), 0) AS BIGINT) AS sum_code,
       CAST(COALESCE(list_sum(list_transform(q8, c -> c * c)), 0) AS BIGINT) AS l2sq_code
FROM c
""".strip(),
    doc="Symmetric int8 embedding quantization under a corpus-global scale "
    "(the writer-side pass of a quantized vector index: 4x smaller codes, "
    "integer distance kernels) with per-vector saturation/norm accounting. "
    "Scale is a 1-row broadcast agg; codes are scan-side exprs; every "
    "output is 64-bit integer math — oracle-exact",
)
def x_embed_quantize8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    return quantize.int8_stats(e)


@register(
    "x_knn_int8",
    f"""
{_Q8_CTE},
q AS (SELECT vec_id AS q_id, q8 AS qq8 FROM c WHERE vec_id BETWEEN 1 AND 5),
p AS (SELECT q.q_id, c.vec_id AS n_id,
             CAST(list_sum(list_transform(range(1, len(c.q8) + 1),
                  i -> (q.qq8[i] - c.q8[i]) * (q.qq8[i] - c.q8[i]))) AS BIGINT) AS dist
      FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id AND len(q.qq8) = len(c.q8)),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM p)
SELECT q_id, n_id, CAST(rnk AS INT) AS rnk, dist FROM r WHERE rnk <= 5
""".strip(),
    doc="Quantized-retrieval coarse stage: top-5 per query by exact integer "
    "squared L2 over the int8 codes (both sides under the same corpus "
    "scale; ties -> smallest neighbor id). The production chain reranks "
    "these survivors with knn_exact_fold on the float vectors; "
    "tests/test_pipeline_ops.py asserts the code-space recall against the "
    "exact e2 ranking",
)
def x_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    q = e.where(F.col("vec_id").between(1, 5))
    return quantize.knn_int8(e, q, k=5)


retire(
    "x_knn_int8",
    "coarse stage of x_knn_int8_rerank, whose oracle replays the identical "
    "integer code-space ranking before the float rerank",
)


@register(
    "x_knn_int8_rerank",
    f"""
{_Q8_CTE},
q AS (SELECT vec_id AS q_id, q8 AS qq8 FROM c WHERE vec_id BETWEEN 1 AND 5),
p AS (SELECT q.q_id, c.vec_id AS n_id,
             CAST(list_sum(list_transform(range(1, len(c.q8) + 1),
                  i -> (q.qq8[i] - c.q8[i]) * (q.qq8[i] - c.q8[i]))) AS BIGINT) AS dist
      FROM c CROSS JOIN q WHERE c.vec_id <> q.q_id AND len(q.qq8) = len(c.q8)),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS crnk FROM p),
cand AS (SELECT q_id, n_id FROM r WHERE crnk <= 20),
f AS (SELECT cand.q_id, cand.n_id,
        (SELECT sum((CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)) * (CAST(x.a AS DOUBLE) - CAST(x.b AS DOUBLE)))
         FROM (SELECT unnest(qe.embedding) AS a, unnest(ne.embedding) AS b) x) AS dist
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.q_id
      JOIN embeddings ne ON ne.vec_id = cand.n_id
      WHERE len(qe.embedding) = len(ne.embedding)),
rr AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rnk FROM f)
SELECT q_id, n_id, CAST(rnk AS INT) AS rnk FROM rr WHERE rnk <= 5
""".strip(),
    doc="Two-stage quantized retrieval, end to end: int8 code-space "
    "top-20 per query (integer kernel over 4x-smaller codes) then an "
    "exact float squared-L2 rerank of ONLY those candidates -> final "
    "top-5. The production ANN recipe — floats touched for 20 rows per "
    "query, never for the corpus; candidate list broadcast, so the "
    "rerank adds no O(corpus) shuffle. Oracle replays both stages "
    "(integer coarse distances, e2-style ordered-sum float rerank)",
)
def x_knn_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    q = e.where(F.col("vec_id").between(1, 5))
    return quantize.knn_int8_rerank(e, q, k=5, coarse_k=20)


@register(
    "x_multimodal_frames",
    """
WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
m AS (SELECT doc_id, text, n % 16 + 1 AS nf FROM b),
j AS (SELECT doc_id, text, nf, least(4, nf) AS ns, unnest([0, 1, 2, 3]) AS js FROM m),
f AS (SELECT doc_id, CAST(js * nf // ns AS BIGINT) AS frame_idx,
             md5(text || ':' || CAST(js * nf // ns AS VARCHAR)) AS frame_md5
      FROM j WHERE js < ns)
SELECT doc_id, frame_idx, frame_md5 FROM f
""".strip(),
    doc="Multimodal frame sampling: each payload exploded into up to 4 "
    "evenly-strided frames (integer stride, so the oracle replicates the "
    "index rule) with a per-frame digest via mapInPandas — the video "
    "frame-extraction fan-out shape with the codec stubbed behind the "
    "frame_fn integration point",
)
def x_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    with_bin = multimodal.attach_binary(d)
    meta = multimodal.extract_media_meta(with_bin)
    enriched = with_bin.join(meta.select("doc_id", "fake_frames"), "doc_id")
    return multimodal.sample_frames(enriched, max_frames=4)


# Retired round 12 (slot freed for x_warc_extract): the fake-digest frame
# fan-out is the PLUMBING twin of x_gif_frame_colors, which drives the
# identical explode-payload-into-per-frame-rows shape through the REAL
# GIF/animated-WebP decoders under its own oracle; sample_frames and the
# frame_fn seam stay pytest-covered (tests/test_pipeline_ops.py), and the
# anchor keeps this exact fake-path oracle green every run.
retire(
    "x_multimodal_frames",
    "plumbing twin of x_gif_frame_colors (same per-frame fan-out shape "
    "through mapInPandas; that query drives it through the real codecs)",
)


_WARC_CTYPE = "text/plain; charset=utf-8"

# ONE oracle mirror for every warc-pages gate (x_warc_extract and the
# streaming s37_stream_warc_tail in plans/streaming_replay.py): the
# fixtures frame the SAME page bytes, so the closed form is shared and
# cannot drift between the batch and streaming readers.
_WARC_PAGES_ORACLE = f"""
WITH d AS (
  -- mirror decode_page_bytes' utf-8-sig semantics: a text whose utf-8
  -- bytes begin EF BB BF is BOM-stripped ONCE by the reader (WHATWG:
  -- the BOM outranks the declared charset), so the oracle strips one
  -- leading U+FEFF too — byte-exact for every other input
  SELECT doc_id,
         CASE WHEN left(text, 1) = chr(65279) THEN substr(text, 2)
              ELSE text END AS page
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 10 = 7 THEN 404 ELSE 200 END AS BIGINT) AS http_status,
       '{_WARC_CTYPE}' AS content_type,
       CAST(octet_length(encode(page)) AS BIGINT) AS n_bytes,
       md5(page) AS body_md5
FROM d
""".strip()


@register(
    "x_warc_extract",
    _WARC_PAGES_ORACLE,
    doc="WARC crawl extraction end to end (sources/warc.py): the harness "
    "writes the documents table out as spec-shaped .warc.gz files (one "
    "gzip member per record, interleaved request records, executor-side "
    "one-file-per-group writes; responses rotate plain / chunked-TE / "
    "gzip-CE / brotli-CE / combined chunked+br framing by doc_id % 5 — "
    "the br classes decode through the libbrotli ctypes bridge and "
    "degrade to their br-less shapes when the library is absent; two "
    "of the eight files ship as IIPC "
    ".warc.zst instead — one zstd frame per record, and one of those "
    "additionally packed against a leading dictionary skippable frame "
    "whose frames genuinely reference it), then read_warc_pages scans "
    "back — binaryFile -> ONE fused Arrow pass doing record framing, "
    "response filter and strict HTTP status/header/payload split (RFC "
    "7230 dechunking + bounded content-encoding inflate) — and "
    "the gate pins per-document status, content-type, byte count and "
    "payload md5 against the closed-form documents oracle. This is the "
    "Common-Crawl WET-extraction shape; at 100 TB the parallel unit is "
    "the WARC file (~100k files/crawl), the scan saturates without "
    "intra-file splits, and payloads cross into Python exactly once. "
    "NULL-text docs are excluded by the engine NULL policy on both "
    "engines. The FIXTURE write (executor tasks into a driver tmpdir) "
    "is harness-only and assumes local mode's shared filesystem — in "
    "production the WARC files already exist in object storage and only "
    "the read side runs; the harness materializes the (row-capped) "
    "result so the tmpdir can be removed before returning",
)
def x_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip
    import os
    import shutil
    import tempfile

    import pandas as pd

    from ..sources import native_codecs
    from ..sources import warc as warc_src

    d = load(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("text").isNotNull()
    )
    n_docs = d.count()
    if n_docs > 2_000_000:
        raise RuntimeError(
            f"x_warc_extract is a correctness harness, capped at 2M docs "
            f"(got {n_docs}); run it at a smaller sf"
        )
    workdir = tempfile.mkdtemp(prefix="warc_extract_")
    # resolved driver-side so every executor frames the same class set;
    # the br class needs the encoder for the fixture AND the decoder for
    # the read-back, so both gate it
    br_ok = native_codecs.brotli_available() and native_codecs.brotli_encoder_available()
    zst_ok = native_codecs.zstd_available()
    # raw-content dictionary for the fid-2 .warc.zst class: heavy overlap
    # with the record scaffolding so the frames genuinely REFERENCE it
    # (a dictless decode of those frames must fail, proving the gate
    # drives the dictionary path, not a coincidentally-decodable twin)
    warc_dict = (
        b"WARC/1.1\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: "
        b"https://fixture.invalid/\r\nContent-Type: application/http;"
        b"msgtype=response\r\nContent-Length: \r\n\r\nHTTP/1.1 200 X\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\nContent-Length: \r\n"
    ) * 4

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        # fid 6: IIPC .warc.zst, one zstd frame per record; fid 2: same
        # plus the leading dictionary skippable frame, frames compressed
        # against it.  Both degrade to .warc.gz without libzstd.
        zst_file = zst_ok and fid in (2, 6)
        use_dict = zst_ok and fid == 2
        blob = bytearray()
        if use_dict:
            blob += (
                b"\x5d\x2a\x4d\x18"
                + len(warc_dict).to_bytes(4, "little")
                + warc_dict
            )

        def pack(warc_type, payload, **kw):
            if not zst_file:
                return warc_src.write_warc_record(warc_type, payload, **kw)
            raw = warc_src.write_warc_record(warc_type, payload, codec="plain", **kw)
            if use_dict:
                return native_codecs.zstd_compress_with_dict(raw, warc_dict)
            return native_codecs.zstd_compress(raw)

        for r in pdf.sort_values("doc_id").itertuples():
            body = str(r.text).encode("utf-8")
            status = 404 if r.doc_id % 10 == 7 else 200
            # rotate the HTTP framing so the chunked-TE, gzip-CE /
            # brotli-CE, and combined TE+CE decode paths run under the
            # driver gate too — the oracle is framing-invariant
            # (decoding restores the page bytes); without libbrotli the
            # br classes degrade to their br-less shapes
            mode = r.doc_id % 5
            if not br_ok:
                mode = {3: 0, 4: 1}.get(mode, mode)
            if mode in (1, 4):
                payload = body
                ce_hdr = ""
                if mode == 4:
                    # real crawls ship chunked TE and a CE together
                    payload = native_codecs.brotli_compress(body)
                    ce_hdr = "Content-Encoding: br\r\n"
                framed = b"".join(
                    f"{len(payload[i:i + 700]):x}\r\n".encode()
                    + payload[i : i + 700] + b"\r\n"
                    for i in range(0, len(payload), 700)
                ) + b"0\r\n\r\n"
                http = (
                    f"HTTP/1.1 {status} X\r\nContent-Type: {_WARC_CTYPE}\r\n"
                    f"{ce_hdr}Transfer-Encoding: chunked\r\n\r\n"
                ).encode() + framed
            elif mode == 2:
                gz = gzip.compress(body)
                http = (
                    f"HTTP/1.1 {status} X\r\nContent-Type: {_WARC_CTYPE}\r\n"
                    f"Content-Encoding: gzip\r\n"
                    f"Content-Length: {len(gz)}\r\n\r\n"
                ).encode() + gz
            elif mode == 3:
                br = native_codecs.brotli_compress(body)
                http = (
                    f"HTTP/1.1 {status} X\r\nContent-Type: {_WARC_CTYPE}\r\n"
                    f"Content-Encoding: br\r\n"
                    f"Content-Length: {len(br)}\r\n\r\n"
                ).encode() + br
            else:
                http = (
                    f"HTTP/1.1 {status} X\r\nContent-Type: {_WARC_CTYPE}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode() + body
            blob += pack(
                "request",
                b"GET / HTTP/1.1\r\n\r\n",
                record_id=f"<urn:req:{r.doc_id}>",
                target_uri=f"https://fixture.invalid/{r.doc_id}",
            )
            blob += pack(
                "response",
                http,
                record_id=f"<urn:doc:{r.doc_id}>",
                target_uri=f"https://fixture.invalid/{r.doc_id}",
                content_type="application/http;msgtype=response",
            )
        ext = "warc.zst" if zst_file else "warc.gz"
        with open(os.path.join(workdir, f"part-{fid:03d}.{ext}"), "wb") as f:
            f.write(blob)
        return pd.DataFrame({"file_id": [fid], "n": [len(pdf)]})

    n_files = (
        d.withColumn("file_id", F.col("doc_id") % 8)
        .groupBy("file_id")
        .applyInPandas(write_group, "file_id bigint, n bigint")
        .count()
    )
    if n_files == 0:
        raise RuntimeError("warc fixture: no files written")
    # the PAGES reader (responses + charset-aware byte decode): the
    # fixture's text/plain;charset=utf-8 payloads decode losslessly, so
    # the oracle is reader-invariant while the gate additionally
    # certifies decode_page_bytes on real fixture bytes
    pages = warc_src.read_warc_pages(spark, workdir, pattern="*.warc.*")
    out = pages.select(
        F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1).cast("bigint").alias("doc_id"),
        F.col("http_status").cast("bigint").alias("http_status"),
        F.col("content_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("body_md5"),
    )
    # materialize the doc-capped result, then drop the fixture files —
    # returning the lazy scan would pin the tmpdir for the caller's
    # lifetime (round-12 review: each invocation leaked a text-corpus
    # copy into /tmp)
    try:
        pdf = out.toPandas()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    schema = (
        "doc_id bigint, http_status bigint, content_type string, "
        "n_bytes bigint, body_md5 string"
    )
    return spark.createDataFrame(pdf, schema=schema)


@register(
    "x_archive_extract",
    """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'zip' ELSE 'tar' END AS archive,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS body_md5
FROM documents WHERE text IS NOT NULL
""".strip(),
    doc="Archive-packaged corpus extraction end to end (sources/"
    "archives.py): the harness writes the documents table out as strict "
    "spec-shaped archives — even file ids as ZIP (every 4th FORCED zip64, "
    "so the EOCD64/locator + 0x0001-extra walk runs on real fixtures; "
    "fid 2 uses the APPNOTE method-93 zstd member compression via the "
    "libzstd bridge), "
    "odd file ids as tar with >100-byte member paths carried via pax "
    "extended headers or old-GNU longname blocks (alternating, so both "
    "long-name routes rotate through the gate; files 5 and 7 write "
    "every member in a GNU SPARSE representation — old-GNU 'S' inline "
    "maps and pax 1.0 map-in-data respectively (round 16, "
    "representation-invariant oracle: reassembly must equal the exact "
    "member bytes); the four tar files ride "
    "gzip/xz/zstd/lz4 envelopes through the magic-sniffed compressed-tar "
    "path — zstd/lz4 via the libzstd/liblz4 ctypes bridges, each "
    "degrading to plain tar when its library is absent; the plain-tar "
    "file path stays pytest-gated via the roundtrip property suite and "
    "stdlib-tarfile conformance tests) — then read_zip/read_tar "
    "scan them back (binaryFile -> mapInPandas member explosion, "
    "central-directory/checksummed-header walks, CRC verify) and the "
    "gate pins per-document archive kind, byte count and payload md5 "
    "against the closed-form documents oracle. At 100 TB the parallel "
    "unit is the archive file, same as the WARC scan. The FIXTURE write "
    "is harness-only (local-mode shared filesystem); in production the "
    "archives already exist in object storage and only the read side "
    "runs; the harness materializes the (row-capped) result so the "
    "tmpdir can be removed before returning",
)
def x_archive_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pandas as pd

    from ..sources import archives as ar_src
    from ..sources import native_codecs

    d = load(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("text").isNotNull()
    )
    n_docs = d.count()
    if n_docs > 2_000_000:
        raise RuntimeError(
            f"x_archive_extract is a correctness harness, capped at 2M docs "
            f"(got {n_docs}); run it at a smaller sf"
        )
    workdir = tempfile.mkdtemp(prefix="archive_extract_")
    deep = "d" * 120  # member paths past the 100-byte ustar field
    # resolved driver-side so every executor writes the same class set
    zstd_ok = native_codecs.zstd_available()
    lz4_ok = native_codecs.lz4_available()

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["file_id"].iloc[0])
        members = [
            (f"corpus/{deep}/doc-{int(r.doc_id):012d}.txt",
             str(r.text).encode("utf-8"))
            for r in pdf.sort_values("doc_id").itertuples()
        ]
        if fid % 2 == 0:
            if fid == 2 and zstd_ok:
                # zstd member method (APPNOTE 93) rides the driver gate
                blob, ext = ar_src.write_zip(members, method=93), "zip"
            else:
                blob, ext = ar_src.write_zip(members, zip64=fid % 4 == 0), "zip"
        else:
            # fid 5/7 additionally write every member in a GNU SPARSE
            # representation (old-GNU 'S' / pax 1.0) so the round-16
            # sparse reassembly rides the driver gate — the oracle is
            # representation-invariant (same reassembled bytes)
            blob = ar_src.write_tar(
                members,
                long_names="pax" if fid % 4 == 1 else "gnu",
                sparse={5: "gnu", 7: "pax10"}.get(fid),
            )
            ext = "tar"
            # the four tar files each ride a compressed envelope so the
            # sniffed decompress paths sit under the driver gate too
            # (the oracle is envelope-invariant: same members either way)
            if fid == 5:
                import gzip

                blob, ext = gzip.compress(blob), "tar.gz"
            elif fid == 7:
                import lzma

                blob, ext = lzma.compress(blob), "tar.xz"
            elif fid == 3 and zstd_ok:
                blob, ext = native_codecs.zstd_compress(blob), "tar.zst"
            elif fid == 1 and lz4_ok:
                blob, ext = native_codecs.lz4_compress(blob), "tar.lz4"
        with open(os.path.join(workdir, f"part-{fid:03d}.{ext}"), "wb") as f:
            f.write(blob)
        return pd.DataFrame({"file_id": [fid], "n": [len(pdf)]})

    # file_id = doc_id % 8 keeps doc parity == file parity, so the oracle's
    # zip/tar split is the closed form doc_id % 2
    n_files = (
        d.withColumn("file_id", F.col("doc_id") % 8)
        .groupBy("file_id")
        .applyInPandas(write_group, "file_id bigint, n bigint")
        .count()
    )
    if n_files == 0:
        raise RuntimeError("archive fixture: no files written")
    rows = (
        ar_src.read_zip(spark, workdir)
        .withColumn("archive", F.lit("zip"))
        .unionByName(
            ar_src.read_tar(spark, workdir).withColumn("archive", F.lit("tar"))
        )
    )
    out = rows.select(
        F.regexp_extract("member", r"doc-(\d+)\.txt", 1).cast("bigint").alias("doc_id"),
        "archive",
        F.col("size").cast("bigint").alias("n_bytes"),
        F.md5("body").alias("body_md5"),
    )
    try:
        pdf = out.toPandas()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    schema = "doc_id bigint, archive string, n_bytes bigint, body_md5 string"
    return spark.createDataFrame(pdf, schema=schema)


@register(
    "x_repetition",
    f"""
{_TOK_CTE},
s AS (SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS ngrams_total,
             CASE WHEN len(toks) >= 3 THEN len({_SHS}) ELSE 0 END AS ngrams_distinct
      FROM t)
SELECT doc_id, CAST(ngrams_total AS BIGINT) AS ngrams_total,
       CAST(ngrams_distinct AS BIGINT) AS ngrams_distinct,
       CASE WHEN ngrams_total > 0
            THEN (ngrams_total - ngrams_distinct) / CAST(ngrams_total AS DOUBLE)
            ELSE 0.0 END AS dup_ngram_ratio
FROM s
""".strip(),
    doc="Gopher-style repetition signal: duplicate word-3-gram occurrence "
    "ratio per document (integer numerators, single IEEE division)",
)
def x_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.repetition_stats(d).drop("text")


@register(
    "x_pattern_counts",
    f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{text.EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{text.URL_RE}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
  CAST(length(text) AS BIGINT) AS n_chars,
  CASE WHEN length(text) > 0
       THEN len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE)
       ELSE 0.0 END AS digit_ratio
FROM documents
""".strip(),
    doc="C4-style content-pattern filters: email/URL/digit counts and the "
    "digit ratio per document (pure column regexes, codegen'd)",
)
def x_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.pattern_counts(d).drop("text")


# Deterministic URL weave for the canonicalization fixture (the parquet
# corpus carries no URLs): 25 canonical classes dressed with scheme /
# www. / trailing-slash / tracking-query / fragment variations keyed off
# doc_id.  Valid Spark SQL AND duckdb SQL — one definition, two engines.
_URL_WEAVE_SQL = """
concat(
  CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END,
  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
  'Site', CAST(doc_id % 25 AS STRING), '.example.com/page/', CAST(doc_id % 25 AS STRING),
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'
       WHEN doc_id % 4 = 1 THEN '?gclid=abc123' ELSE '' END,
  CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
)
""".strip()


@register(
    "x_url_dedup",
    f"""
WITH u AS (SELECT doc_id, {_URL_WEAVE_SQL.replace("AS STRING", "AS VARCHAR")} AS url FROM documents),
c AS (SELECT doc_id, {text.url_canon_sql('url')} AS canonical_url FROM u)
SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(count(*) AS BIGINT) AS n_docs
FROM c GROUP BY canonical_url
""".strip(),
    doc="Crawl-frontier URL dedup: canonicalize every document's URL "
    "(lowercase; strip scheme, www., fragment, all-tracker query strings, "
    "trailing slash — operators/text.py::canonical_url, ONE ordered "
    "regexp chain defined once for both engines) and keep the first "
    "document per canonical URL. The weave dresses 25 canonical classes "
    "in scheme/www/slash/utm/fragment variations, so the dedup provably "
    "collapses them. Scan-side codegen'd exprs + one map-side-combined "
    "groupBy on the canonical key — the frontier-dedup shape at crawl "
    "scale",
)
def x_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    u = d.select("doc_id", F.expr(_URL_WEAVE_SQL).alias("url"))
    c = u.select("doc_id", text.canonical_url(F.col("url")).alias("canonical_url"))
    return c.groupBy("canonical_url").agg(
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )


@register(
    "x_quality_filter",
    f"""
{_TOK_CTE},
q AS (SELECT doc_id, text, toks,
  len(toks) AS n_tok,
  COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS sum_tok_len,
  len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS n_stop,
  CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS ng_total,
  CASE WHEN len(toks) >= 3 THEN len({_SHS}) ELSE 0 END AS ng_distinct,
  len(regexp_extract_all(text, '{text.DIGIT_RE}')) AS n_digits,
  length(text) AS n_chars
FROM t),
r AS (SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tok, CAST(n_stop AS BIGINT) AS n_stop,
  CASE WHEN n_tok > 0 THEN sum_tok_len / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS avg_tok_len,
  CASE WHEN ng_total > 0 THEN (ng_total - ng_distinct) / CAST(ng_total AS DOUBLE)
       ELSE 0.0 END AS dup_ngram_ratio,
  CASE WHEN n_chars > 0 THEN n_digits / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio
FROM q),
f AS (SELECT *,
  CASE WHEN n_tok < {text.QUALITY_MIN_TOKENS} THEN 'too_few_tokens'
       WHEN n_tok > {text.QUALITY_MAX_TOKENS} THEN 'too_many_tokens'
       WHEN avg_tok_len < {text.QUALITY_MIN_AVG_TOK_LEN}
            OR avg_tok_len > {text.QUALITY_MAX_AVG_TOK_LEN} THEN 'avg_tok_len_range'
       WHEN n_stop < {text.QUALITY_MIN_STOPWORDS} THEN 'too_few_stopwords'
       WHEN dup_ngram_ratio > {text.QUALITY_MAX_DUP_NGRAM} THEN 'repetitive'
       WHEN digit_ratio > {text.QUALITY_MAX_DIGIT_RATIO} THEN 'digit_heavy'
       ELSE NULL END AS reason
FROM r)
SELECT doc_id, n_tok, n_stop, avg_tok_len, dup_ngram_ratio, digit_ratio,
       reason, reason IS NULL AS keep
FROM f
""".strip(),
    doc="Composite Gopher/C4-style quality gate: the documented rule ladder "
    "(token count -> avg token length -> stopword floor -> 3-gram "
    "repetition -> digit ratio) evaluated per document with keep + first "
    "failing reason. Integer numerators, single IEEE divisions, one "
    "comparison per rule — oracle-exact; map-only pass that rides the "
    "scan at 100 TB (no shuffle, no Python)",
)
def x_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_filter(d).drop("text")


@register(
    "x_train_test_split",
    f"""
WITH s AS (SELECT doc_id, source,
                  CASE WHEN {sampling.split_bucket_sql('doc_id')} < 8000
                       THEN 'train' ELSE 'test' END AS split
           FROM documents)
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM s GROUP BY source, split
""".strip(),
    doc="Deterministic 80/20 train/test split by md5-id bucket (pure "
    "function of the id — reproducible across runs, engines, partition "
    "layouts; no RNG, no shuffle for the labeling itself), summarized "
    "per (source, split)",
)
def x_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    s = sampling.hash_split(d, train_frac=0.8)
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
jp AS (SELECT id_a, id_b FROM ({_JACCARD_ORACLE}) q),
edges AS (SELECT id_a AS src, id_b AS dst FROM jp
          UNION SELECT id_b, id_a FROM jp),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS canonical_id
FROM reach GROUP BY a
""".strip()


@register(
    "x_dedup_clusters",
    _CLUSTERS_ORACLE,
    doc="Dedup clustering: connected components over the exact-Jaccard "
    "near-dup pair graph (threshold 0.1) — every document mapped to the "
    "smallest id reachable through pairs (its cluster's canonical doc; "
    "singletons map to themselves).  Iterative min-label propagation with "
    "a driver-checked fixpoint (diameter rounds, one shuffle each, data "
    "never collected); the oracle is a recursive-CTE transitive closure",
)
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.1).select("id_a", "id_b")
    return dedup.connected_components(pairs, d.select("doc_id"))


# Hot-band-bucket valve for the LSH-fed clustering path: a band bucket
# shared by F docs emits F^2/2 candidate rows, so the cap bounds the
# candidate join the way max_df bounds the shingle posting lists.  1000
# is production-shaped (drops only boilerplate that collapses >1000 docs
# onto one band key); fixture buckets top out at 4 members, so the gated
# result is valve-invariant here while the oracle still carries the
# literal twin of the predicate (tests/test_pipeline_ops.py proves the
# valve fires on a hostile corpus).
_LSH_MAX_BAND_DF = 1000

_CLUSTERS_LSH_ORACLE = f"""
WITH RECURSIVE
jp AS (SELECT id_a, id_b FROM (
  {_SH_CTE},
  {_lsh_ver_cte(max_band_df=_LSH_MAX_BAND_DF)}
  SELECT id_a, id_b FROM ver
  WHERE common / CAST(n_a + n_b - common AS DOUBLE) >= 0.5) q),
edges AS (SELECT id_a AS src, id_b AS dst FROM jp
          UNION SELECT id_b, id_a FROM jp),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS canonical_id
FROM reach GROUP BY a
""".strip()


@register(
    "x_dedup_clusters_lsh",
    _CLUSTERS_LSH_ORACLE,
    doc="Dedup clustering, 100 TB route: connected components over the "
    "BANDED-LSH candidate pair graph (16-perm 4x4 MinHash banding, "
    "hot-band valve max_band_df=1000, exact-Jaccard verify >= 0.5 on "
    "candidates only) — the same min-label CC as x_dedup_clusters fed "
    "by equi-join candidates instead of the output-bound exact "
    "inverted-index pair join (SCALE.md: exact-path exponent ~0.5 is "
    "the true pair volume at t=0.1; the banded path stays sublinear). "
    "Oracle derives candidates/verification from the shared "
    "_lsh_ver_cte fragment (one copy of the banding + valve rule) and "
    "closes them with the same recursive-CTE transitive closure",
)
def x_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, threshold=0.5, max_band_df=_LSH_MAX_BAND_DF
    ).select("id_a", "id_b")
    return dedup.connected_components(pairs, d.select("doc_id"))


# Retired round 12 (slot freed for s36_stream_metrics): the exact-Jaccard
# pair stage is the documented NON-scale twin of the banded-LSH route, and
# the min-label CC it feeds is the identical operator x_dedup_clusters_lsh
# gates — the anchor keeps the exact-path oracle (incl. the recursive-CTE
# closure) green every pytest run (tests/test_exact_anchors.py); the
# sf-scaling exponent measurement stays in bench.py's SCALING_QUERIES via
# corpus.spec, which resolves retired anchors.
retire(
    "x_dedup_clusters",
    "stage twin of x_dedup_clusters_lsh (same connected_components; the "
    "exact-Jaccard pair feed is the documented non-scale path)",
)


@register(
    "x_dedup_sweep",
    f"""
WITH cl AS ({_CLUSTERS_ORACLE}),
kept AS (SELECT d.doc_id, d.source, d.n_chars
         FROM documents d JOIN cl ON cl.doc_id = d.doc_id
         WHERE cl.doc_id = cl.canonical_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(k.doc_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(sum(k.n_chars), 0) AS BIGINT) AS kept_chars
FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
GROUP BY d.source
""".strip(),
    doc="End-to-end near-dup SWEEP with a retention report: Jaccard pair "
    "graph -> connected-component clusters -> keep each cluster's "
    "canonical (smallest-id) document -> per-source input/kept/char "
    "accounting — the acceptance artifact of a corpus dedup run "
    "(retention-rate dashboards). Composes jaccard_pairs + "
    "connected_components + one semi-join + one aggregate; the only new "
    "shuffles beyond clustering are the keep join (on doc_id) and the "
    "final per-source rollup",
)
def x_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.1).select("id_a", "id_b")
    comp = dedup.connected_components(pairs, d.select("doc_id"))
    kept = comp.where(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    kd = d.join(F.broadcast(kept.withColumnRenamed("doc_id", "__kid")),
                F.col("doc_id") == F.col("__kid"), "left")
    return kd.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count("__kid").cast("bigint").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("__kid").isNotNull(), F.col("n_chars"))), F.lit(0)
        ).cast("bigint").alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# Sketches
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH sk AS ({sketches.kmv_oracle_sql("SELECT l_returnflag, l_partkey FROM lineitem",
                                     "l_returnflag", "l_partkey", _KMV_K)}),
x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
      FROM lineitem GROUP BY 1)
SELECT sk.l_returnflag, sk.n_sketch, sk.kth_hash, sk.est_distinct, x.exact_distinct
FROM sk JOIN x USING (l_returnflag)
""".strip()


@register(
    "x_kmv_distinct",
    _KMV_ORACLE,
    doc="KMV (k-minimum-values) distinct-count sketch, k=64: per-group "
    "estimate (k-1)*2^56 div kth-smallest 56-bit md5 hash — the mergeable "
    "alternative to exact countDistinct whose per-group output is k "
    "numbers instead of every distinct value. Bit-reproducible across "
    "engines and partition layouts (md5 + integer floor-division, exact "
    "count returned for groups under k), unlike engine-specific HLL "
    "registers; exact countDistinct joined alongside so the gate also "
    "records the estimator's accuracy",
)
def x_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sk = sketches.kmv_distinct(li, ["l_returnflag"], "l_partkey", k=_KMV_K)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return sk.join(F.broadcast(exact), "l_returnflag")


@register(
    "x_hll_distinct",
    """
SELECT CAST(l_returnflag AS VARCHAR) AS grp,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact, TRUE AS hll_ok
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT '_all', CAST(count(DISTINCT l_partkey) AS BIGINT), TRUE FROM lineitem
""".strip(),
    doc="Native DataSketches-HLL distinct counts (hll_sketch_agg, lgK=14) "
    "with per-group sketches MERGED via hll_union_agg into a corpus-total "
    "row — the persist-once/roll-up-without-rescan shape exact "
    "countDistinct can't do at 100 TB. Exact counts computed alongside; "
    "the oracle pins them and asserts the 5% accuracy bound (hll_ok), so "
    "the estimator's error is hash-gated, not advisory",
)
def x_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return sketches.hll_distinct_check(li, "l_returnflag", "l_partkey")


# ---------------------------------------------------------------------------
# Profiling & sampling
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["orderkey", "custkey", "totalprice_c", "orderdate_day"]

_PROFILE_SRC = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
       epoch_us(o_orderdate) // 86400000000 AS orderdate_day
FROM orders
""".strip()


@register(
    "x_profile_columns",
    profiling.profile_oracle_sql(_PROFILE_SRC, _PROFILE_COLS),
    doc="Per-column profile (rows/nonnull/distinct/min/max/sum) over four "
    "BIGINT-derived orders columns in ONE job: map-side unpivot, C-group "
    "partial aggregation — the stats pass that precedes any pipeline "
    "filtering decision; all-integer, bit-exact",
)
def x_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("totalprice_c"),
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("orderdate_day"),
    )
    return profiling.profile_bigint(o, _PROFILE_COLS)


_STRAT_K = 20


@register(
    "x_sample_stratified",
    f"""
SELECT c_custkey, c_nationkey, CAST(rn AS BIGINT) AS sample_rank FROM (
  SELECT c_custkey, c_nationkey,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
  FROM customer) WHERE rn <= {_STRAT_K}
""".strip(),
    doc=f"Stratified exactly-{_STRAT_K}-per-nation customer sample, ranked by "
    "md5(id) with id tie-break — reproducible across engines/partitionings "
    "(no RNG), one hash-partitioned window per stratum, no global sort",
)
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return sampling.stratified_sample(c, ["c_nationkey"], "c_custkey", k=_STRAT_K)


_BLOOM_PRICE_C = 45_000_000  # cents: high-value orders -> selective build side


@register(
    "x_bloom_prune_semi",
    f"""
WITH hi AS (SELECT o_orderkey FROM orders
            WHERE CAST(round(o_totalprice * 100) AS BIGINT) > {_BLOOM_PRICE_C})
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem SEMI JOIN hi ON l_orderkey = hi.o_orderkey
GROUP BY l_returnflag
""".strip(),
    doc="Bloom-pruned semi join: lineitem of high-value orders. A "
    "partitioned Bloom filter (3 x 2^20-bit broadcastable bitmaps, "
    "native xxhash64 positions - no oracle parity needed since the "
    "exact join removes false positives) prunes the probe side with k "
    "map-side broadcast joins BEFORE the exact semi join's shuffle - "
    "the explicit analog of Spark's runtime bloom pruning; bloom admits "
    "a superset, so the oracle is the plain semi join",
)
def x_bloom_prune_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    hi = o.where(
        F.round(F.col("o_totalprice") * 100).cast("bigint") > _BLOOM_PRICE_C
    ).select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    matched = bloom.bloom_semi_join(li, hi, "l_orderkey", "o_orderkey")
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "revenue_c"
        ),
    )


# two deterministic synthetic snapshots of orders: keys divisible by 97
# exist only in NEW (inserts), by 89 only in OLD (deletes), by 11 have a
# bumped price in NEW (updates); everything else is unchanged churn-noise
_SNAP_OLD = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
FROM orders WHERE o_orderkey % 97 <> 0
""".strip()
_SNAP_NEW = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT)
         + CASE WHEN o_orderkey % 11 = 0 THEN 100 ELSE 0 END AS price_c
FROM orders WHERE o_orderkey % 89 <> 0
""".strip()


@register(
    "x_snapshot_diff",
    f"""
WITH o AS ({_SNAP_OLD}), n AS ({_SNAP_NEW})
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       CAST(COALESCE(o.price_c, -1) AS BIGINT) AS old_price_c,
       CAST(COALESCE(n.price_c, -1) AS BIGINT) AS new_price_c
FROM o FULL OUTER JOIN n USING (o_orderkey)
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.price_c IS DISTINCT FROM n.price_c
""".strip(),
    doc="CDC snapshot diff between two deterministic versions of orders: "
    "one full-outer sort-merge join on the key, null-safe column compare, "
    "output proportional to the churn (insert/delete/update rows only) - "
    "the incremental-processing primitive a recurring ingest needs; "
    "absent-side images coalesced to -1 for non-null BIGINT output",
)
def x_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    price_c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = o.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", price_c.alias("price_c")
    )
    new = o.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        (
            price_c
            + F.when(F.col("o_orderkey") % 11 == 0, F.lit(100)).otherwise(F.lit(0))
        ).alias("price_c"),
    )
    d = delta.snapshot_diff(old, new, ["o_orderkey"], ["price_c"])
    return d.select(
        "o_orderkey",
        "op",
        F.coalesce("old_price_c", F.lit(-1)).cast("bigint").alias("old_price_c"),
        F.coalesce("new_price_c", F.lit(-1)).cast("bigint").alias("new_price_c"),
    )


_PACK_BUDGET = 4096


@register(
    "x_seq_packing",
    f"""
SELECT doc_id, n_chars,
       CAST(cum - n_chars AS BIGINT) AS seq_offset,
       CAST((cum - n_chars) // {_PACK_BUDGET} AS BIGINT) AS seq_id
FROM (SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents)
""".strip(),
    doc=f"Concat-and-chunk sequence packing (budget {_PACK_BUDGET}): every "
    "document's offset in the concatenated id-ordered stream and the "
    "chunk its first token lands in - the pretraining data-loader "
    "layout. The global running sum is two-pass range-partitioned "
    "(literal bounds, local windows, broadcast prefix offsets), so no "
    "single-task window touches the data",
)
def x_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return packing.pack_sequences(d, "doc_id", "n_chars", _PACK_BUDGET)


_HIST_LO, _HIST_W, _HIST_N = 0, 2_500_000, 24


@register(
    "x_histogram",
    profiling.histogram_oracle_sql(
        "SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders",
        "price_c",
        _HIST_LO,
        _HIST_W,
        _HIST_N,
    ),
    doc="Fixed-width histogram of order totals in cents (24 x $25k bins, "
    "underflow/overflow sentinels): one projection + one <=26-group "
    "aggregate, partial-combined map-side - the distribution pass behind "
    "any length/quality cutoff decision",
)
def x_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c")
    )
    return profiling.histogram_fixed(o, "price_c", _HIST_LO, _HIST_W, _HIST_N)


_CHUNK_C, _CHUNK_S = 160, 120


@register(
    "x_doc_chunks",
    f"""
WITH n AS (SELECT doc_id, text,
                  CASE WHEN length(text) <= {_CHUNK_C} THEN 0
                       ELSE (length(text) - {_CHUNK_C} + {_CHUNK_S} - 1) // {_CHUNK_S}
                  END AS extra
           FROM documents),
i AS (SELECT unnest(range(0, 256)) AS chunk_idx)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {_CHUNK_S} AS BIGINT) AS chunk_start,
       substr(text, chunk_idx * {_CHUNK_S} + 1, {_CHUNK_C}) AS chunk_text,
       CAST(length(substr(text, chunk_idx * {_CHUNK_S} + 1, {_CHUNK_C})) AS BIGINT)
         AS chunk_len
FROM n, i WHERE chunk_idx <= extra
""".strip(),
    doc=f"Sliding-window chunking ({_CHUNK_C}-char windows every "
    f"{_CHUNK_S} chars, {_CHUNK_C - _CHUNK_S}-char overlap) - the "
    "retrieval/embedding prep fan-out as pure column exprs + "
    "explode(sequence): rides the scan, no shuffle, no UDF; one chunk "
    "minimum per document, short final window kept",
)
def x_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.chunk_documents(d, chunk_chars=_CHUNK_C, stride=_CHUNK_S)


_CONTAM_ORACLE = f"""
{_SH_CTE},
sp AS (SELECT doc_id,
              CASE WHEN {sampling.split_bucket_sql('doc_id')} < 8000
                   THEN 'train' ELSE 'test' END AS split
       FROM documents),
tr AS (SELECT s.doc_id, s.shs FROM sh0 s JOIN sp USING (doc_id) WHERE sp.split = 'train'),
bg AS (SELECT DISTINCT unnest(s.shs) AS g
       FROM sh0 s JOIN sp USING (doc_id) WHERE sp.split = 'test'),
hits AS (
  SELECT e.doc_id, count(*) AS n_hit
  FROM (SELECT doc_id, unnest(shs) AS g FROM tr) e JOIN bg USING (g)
  GROUP BY e.doc_id)
SELECT t.doc_id, CAST(len(t.shs) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit
FROM tr t LEFT JOIN hits h USING (doc_id)
""".strip()


@register(
    "x_contamination",
    _CONTAM_ORACLE,
    doc="Benchmark-contamination check: for every train-split document "
    "(deterministic md5 80/20 split), count its distinct 3-word shingles "
    "that also occur anywhere in the test split. The scale path joins "
    "8-byte xxhash64 gram keys, not strings; the oracle joins the raw "
    "shingles (collisions only inflate counts and are ~2^-56 here). "
    "This is the train-on-test leak detector every eval pipeline needs",
)
def x_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    s = sampling.hash_split(d, train_frac=0.8)
    train = s.where(F.col("split") == "train").select("doc_id", "text")
    bench = s.where(F.col("split") == "test").select("doc_id", "text")
    return dedup.contamination_counts(train, bench)


@register(
    "x_tfidf_topterms",
    f"""
{_TOK_CTE},
e AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
r AS (SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfs.df ASC, tf.term ASC) AS rnk
      FROM tf JOIN dfs USING (term))
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
""".strip(),
    doc="Per-document top-5 terms by TF-IDF rank, float-free: for fixed N "
    "the tf*log(N/df) order IS (tf DESC, df ASC), so the ranking needs "
    "only the two integers plus a term tie-break — bit-exact across "
    "engines where the float score would not be",
)
def x_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return text.tfidf_top_terms(d, top_k=5)


_HH_K = 60


@register(
    "x_heavy_hitters",
    f"""
{_TOK_CTE},
e AS (SELECT unnest(toks) AS term FROM t)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM e GROUP BY term
HAVING count(*) * {_HH_K} > (SELECT count(*) FROM e)
""".strip(),
    doc=f"Exact heavy hitters (tokens with frequency > n/{_HH_K}) via "
    "Misra-Gries candidate sketching + exact recount: the candidate set "
    "is bounded per partition regardless of vocabulary size, the recount "
    "touches candidates only, and the final filter is exact — so the "
    "output is deterministic although the sketch state is "
    "partition-layout-dependent. The oracle is the plain GROUP BY "
    "HAVING the sketch pass avoids shuffling",
)
def x_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.selectExpr(f"explode({text.tokens_sql('text')}) AS term")
    return sketches.heavy_hitters_exact(toks, "term", k=_HH_K)


@register(
    "x_fuzzy_match",
    """
WITH n AS (SELECT DISTINCT p_name AS name FROM part),
t AS (SELECT name, string_split(name, ' ')[-1] AS blk FROM n)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM t a JOIN t b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
""".strip(),
    doc="Entity-resolution fuzzy match: part-name pairs within edit "
    "distance 3, blocked on the final token over the DISTINCT name "
    "dictionary — quadratic work bounded by distinct names per block, "
    "never by row count; levenshtein agrees between Spark and duckdb",
)
def x_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return dedup.fuzzy_match_names(p, "p_name", max_dist=3)


_Z_BITS = 12
_Z_X = "o_custkey % 4096"
_Z_Y = "(epoch_us(o_orderdate) // 86400000000) % 4096"


@register(
    "x_zorder_stats",
    f"""
WITH z AS (
  SELECT {layout.zorder_key_sql([_Z_X, _Z_Y], _Z_BITS)} >> 18 AS z_tile,
         {_Z_X} AS x, {_Z_Y} AS y
  FROM orders)
SELECT z_tile, CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
FROM z GROUP BY z_tile
""".strip(),
    doc="Z-order (Morton) clustering keys for data layout: interleave 12 "
    "bucketized bits of (custkey, order-day), tile by the top 6 bits, "
    "and report per-tile min/max of both dimensions — every tile's "
    "bounds sit inside a 512x512 rectangle, which is precisely why "
    "files written in z-order prune on BOTH columns' min/max stats "
    "(the OPTIMIZE ZORDER BY mechanic). Pure closed-form integer bit "
    "arithmetic, bit-identical in duckdb",
)
def x_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 4096).alias("x"),
        (F.expr("unix_timestamp(o_orderdate) div 86400") % 4096).alias("y"),
    )
    z = layout.zorder_key([F.col("x"), F.col("y")], _Z_BITS)
    return (
        o.withColumn("z_tile", F.shiftright(z, 18))
        .groupBy("z_tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


@register(
    "x_triangle_count",
    """
WITH il AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS lo, b.p AS hi
      FROM il a JOIN il b ON a.g = b.g AND a.p < b.p),
w AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM e e1 JOIN e e2 ON e1.hi = e2.lo),
t AS (SELECT count(*) AS n_triangles
      FROM w JOIN e ON w.a = e.lo AND w.c = e.hi)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       CAST(t.n_triangles AS BIGINT) AS n_triangles
FROM t
""".strip(),
    doc="Triangle counting over the part co-purchase graph (parts linked "
    "iff they share an order): degree-oriented node-iterator — every "
    "edge oriented low-(degree,id) -> high, wedges only from out-edges, "
    "closed by a semi-join — so out-degrees are O(sqrt(m))-bounded and "
    "hub parts cannot explode the wedge shuffle. The oracle counts the "
    "same triangles with the naive a<b<c enumeration",
)
def x_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return graph.triangle_count(edges)


def _pagerank_oracle() -> str:
    # the same 3 damped iterations, unrolled: bigint fixed-point makes
    # every intermediate order-independent and engine-exact (duckdb's
    # hugeint SUM and // truncation agree with Spark's bigint sum + div
    # for these non-negative, < 2^60 values)
    it = """
s{i} AS (SELECT e.dst AS v, SUM(r{p}.r // deg.deg) AS s
        FROM e JOIN deg USING (src) JOIN r{p} ON r{p}.v = e.src
        GROUP BY e.dst),
r{i} AS (SELECT v.v, CAST(150000 + (85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS r
        FROM v LEFT JOIN s{i} USING (v))"""
    steps = ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
WITH il AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS src, b.p AS dst
      FROM il a JOIN il b ON a.g = b.g AND a.p <> b.p),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
v AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM v),{steps}
SELECT v AS part_id, r AS rank_micro FROM r3
""".strip()


@register(
    "x_pagerank",
    _pagerank_oracle(),
    doc="Fixed-point integer PageRank (3 damped iterations, d=0.85) over "
    "the symmetrized part co-purchase graph — the quality-weighting "
    "signal a web-scale training corpus derives from its link graph. "
    "Rank in 1e-6 bigint units with truncating-division contributions, "
    "so each iteration is order-independent and the unrolled-CTE oracle "
    "hash-gates it EXACTLY; ranks localCheckpoint per round (lineage "
    "truncation), edges+degrees checkpoint once",
)
def x_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    und = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    directed = und.select(
        F.col("lo").alias("src"), F.col("hi").alias("dst")
    ).unionAll(und.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
    return graph.pagerank(directed, iterations=3, damping_pct=85).select(
        F.col("v").alias("part_id"), "rank_micro"
    )


def _labelprop_oracle(iterations: int = 3) -> str:
    it = """
c{i} AS (SELECT a.v, l{p}.l, count(*) AS c
         FROM adj a JOIN l{p} ON l{p}.v = a.n GROUP BY a.v, l{p}.l),
l{i} AS (SELECT v, l FROM (SELECT v, l,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, l) AS rk
         FROM c{i}) WHERE rk = 1)"""
    steps = ",".join(it.format(i=i, p=i - 1) for i in range(1, iterations + 1))
    return f"""
WITH il AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS lo, b.p AS hi
      FROM il a JOIN il b ON a.g = b.g AND a.p < b.p),
adj AS (SELECT lo AS v, hi AS n FROM e UNION ALL SELECT hi, lo FROM e),
l0 AS (SELECT DISTINCT v, v AS l FROM adj),{steps}
SELECT v AS part_id, l AS label FROM l{iterations}
""".strip()


@register(
    "x_labelprop",
    _labelprop_oracle(3),
    doc="Deterministic synchronous label propagation (3 rounds, Raghavan "
    "et al.) over the part co-purchase graph — the community-detection "
    "signal for source clustering and near-dup neighborhood analysis. "
    "Every vertex adopts its neighbors' most frequent label, ties to the "
    "smallest (classic LPA tie-breaks randomly — undeterminizable, so "
    "the oracle pins (count DESC, label ASC)); per round one label join "
    "+ one (v,label) count shuffle + a min(struct) argmax (no window), "
    "labels checkpointed per round — operators/graph.py::label_propagation",
)
def x_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return graph.label_propagation(edges, iterations=3).select(
        F.col("v").alias("part_id"), "label"
    )


def _coreness_oracle(rounds: int = 4) -> str:
    it = """
c{i} AS (SELECT v, max(least(rn, c)) AS c FROM (
           SELECT a.v, c{p}.c,
                  row_number() OVER (PARTITION BY a.v ORDER BY c{p}.c DESC) AS rn
           FROM adj a JOIN c{p} ON c{p}.v = a.n) GROUP BY v)"""
    steps = ",".join(it.format(i=i, p=i - 1) for i in range(1, rounds + 1))
    return f"""
WITH il AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS lo, b.p AS hi
      FROM il a JOIN il b ON a.g = b.g AND a.p < b.p),
adj AS (SELECT lo AS v, hi AS n FROM e UNION ALL SELECT hi, lo FROM e),
c0 AS (SELECT v, count(*) AS c FROM adj GROUP BY v),{steps}
SELECT v AS part_id, CAST(c AS BIGINT) AS coreness FROM c{rounds}
""".strip()


@register(
    "x_coreness",
    _coreness_oracle(4),
    doc="Distributed k-core decomposition (4 h-index rounds, Montresor "
    "et al. 2011) over the part co-purchase graph — the subgraph-density "
    "signal that grades how deep each item sits in the co-occurrence "
    "structure (single-k peeling is all-or-nothing on uniform random "
    "graphs; the full decomposition is informative on any degree "
    "distribution). Each vertex starts at its degree and repeatedly "
    "takes the H-index of its neighbors' values — monotone to exact "
    "coreness, contract is the round-4 state; per round one label join "
    "+ a per-vertex descending rank + a max(least(rn,c)) aggregate, "
    "values checkpointed per round — operators/graph.py::coreness_hindex",
)
def x_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return graph.coreness_hindex(edges, rounds=4).select(
        F.col("v").alias("part_id"), "coreness"
    )


def _bfs_oracle(rounds: int = 4) -> str:
    inf = 1 << 40
    it = """
d{i} AS (SELECT d.v, LEAST(d.dist, COALESCE(m.nd, {inf})) AS dist
         FROM d{p} d LEFT JOIN (SELECT a.v, MIN(dp.dist) + 1 AS nd
                                FROM adj a JOIN d{p} dp ON dp.v = a.n
                                GROUP BY a.v) m ON m.v = d.v)"""
    steps = ",".join(it.format(i=i, p=i - 1, inf=inf) for i in range(1, rounds + 1))
    return f"""
WITH il AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS lo, b.p AS hi
      FROM il a JOIN il b ON a.g = b.g AND a.p < b.p),
adj AS (SELECT lo AS v, hi AS n FROM e UNION ALL SELECT hi, lo FROM e),
v AS (SELECT DISTINCT v FROM adj),
d0 AS (SELECT v, CASE WHEN v % 100 = 0 THEN 0 ELSE {inf} END AS dist FROM v),{steps}
SELECT v AS part_id, CAST(dist AS BIGINT) AS hops FROM d{rounds} WHERE dist < {inf}
""".strip()


@register(
    "x_bfs_hops",
    _bfs_oracle(4),
    doc="Multi-source BFS hop distances (4 Bellman-Ford rounds) from the "
    "part_id % 100 = 0 seed set over the part co-purchase graph — the "
    "distance-to-trusted-source proximity signal link-graph curation "
    "derives next to PageRank. Each round relaxes min(own, nearest "
    "neighbor + 1) — monotone, all-integer, exact hop distance within "
    "the round budget, so the unrolled-CTE oracle hash-gates it; per "
    "round one join onto the checkpointed adjacency + one map-side-"
    "combinable min shuffle (the pagerank iteration cost model) — "
    "operators/graph.py::bfs_hops",
)
def x_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    seeds = (
        edges.select(F.col("lo").alias("v"))
        .unionAll(edges.select(F.col("hi").alias("v")))
        .where(F.col("v") % 100 == 0)
        .distinct()
    )
    return graph.bfs_hops(edges, seeds, rounds=4).select(
        F.col("v").alias("part_id"), "hops"
    )


@register(
    "x_exact_quantiles",
    """
WITH d AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         row_number() OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_orderkey, l_linenumber) AS rn,
         count(*) OVER () AS n
  FROM lineitem)
SELECT CAST(max(n) AS BIGINT) AS n_rows,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN price_c END) AS BIGINT) AS median_c,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN price_c END) AS BIGINT) AS p90_c,
       CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN price_c END) AS BIGINT) AS p99_c
FROM d
""".strip(),
    doc="EXACT global quantiles (median/p90/p99) by rank selection — the "
    "scale-safe alternative to percentile_approx when exactness is "
    "required: global rank assembled from range-bucketed pieces "
    "(operators/prefix.py::with_global_rank, no single-task window), "
    "then the rank-position rows (r10's per-group convention, applied "
    "globally) collapse to one row.  Cents-integer values so the oracle "
    "hash is float-free",
)
def x_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import rows_at_global_ranks

    li = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("price_c"),
        "l_orderkey",
        "l_linenumber",
    )
    # rank SELECTION, not full ranking: only the <=3 buckets containing a
    # requested position are shuffled into the local-sort window (the
    # offsets are plan literals, so the prune happens map-side); the total
    # falls out of the bucket-offsets action — no separate count() pass
    picked, total = rows_at_global_ranks(
        li,
        ["price_c", "l_orderkey", "l_linenumber"],
        # python // floors == duckdb // truncation for the non-negative n
        lambda n: [(n + 1) // 2, (9 * n + 9) // 10, (99 * n + 99) // 100],
        "rn",
    )

    def at(rank: int):
        return F.max(F.when(F.col("rn") == F.lit(rank), F.col("price_c")))

    return picked.groupBy().agg(
        # max over an empty frame is NULL == the oracle's max(n) on 0 rows
        F.max(F.lit(total)).cast("bigint").alias("n_rows"),
        at((total + 1) // 2).cast("bigint").alias("median_c"),
        at((9 * total + 9) // 10).cast("bigint").alias("p90_c"),
        at((99 * total + 99) // 100).cast("bigint").alias("p99_c"),
    )


@register(
    "x_clean_text",
    """
WITH c AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS n_urls,
         CAST(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT)
           AS n_emails,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(text, 'https?://[^\\s]+', ' ', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'),
           '\\s+', ' ', 'g')) AS clean
  FROM documents)
SELECT doc_id, n_urls, n_emails,
       md5(clean) AS clean_md5,
       CAST(length(clean) AS BIGINT) AS clean_chars
FROM c
""".strip(),
    doc="C4-style text scrub: strip URLs and e-mails, collapse whitespace, "
    "trim — the pre-tokenization cleaning pass of a training-data "
    "pipeline. Patterns restricted to the Java-regex/RE2 common subset "
    "so Spark and duckdb transform identically; output compared by md5 "
    "of the cleaned text (order: urls -> emails -> whitespace)",
)
def x_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    cleaned = text.clean_text(d)
    return cleaned.select(
        "doc_id",
        "n_urls",
        "n_emails",
        F.md5(F.col("clean")).alias("clean_md5"),
        F.length("clean").cast("bigint").alias("clean_chars"),
    )


# the synthetic documents contain no URLs, so the extraction input is
# built deterministically from fixture columns (identical expression both
# sides): every doc cites its source's domain and, when doc_id % 3 = 0, a
# mirror host — non-trivial multiplicities for the per-domain aggregate.
_DOMAIN_TEXT_SQL = (
    "'see https://' || source || '.example.com/' || CAST(doc_id AS VARCHAR) "
    "|| CASE WHEN doc_id % 3 = 0 "
    "THEN ' and http://mirror-' || source || '.org/x' ELSE '' END || ' ' || text"
)


@register(
    "x_domain_stats",
    rf"""
WITH w AS (SELECT doc_id, {_DOMAIN_TEXT_SQL} AS wtext FROM documents),
d AS (
  SELECT doc_id, unnest(regexp_extract_all(wtext, 'https?://([^/\s]+)', 1)) AS domain
  FROM w)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_refs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM d GROUP BY domain
""".strip(),
    doc="Web-corpus governance: extract the host of every URL mentioned in "
    "each document (capture group 1 of a Java-regex/RE2-common pattern), "
    "explode, and aggregate reference and document counts per domain -- "
    "the source-mix / blocklist accounting step of a crawl pipeline. "
    "The fixtures carry no URLs, so both sides weave source-derived URLs "
    "into the text with the same expression first. One explode + one "
    "map-side-combined groupBy; distinct-doc counts shuffle (domain, "
    "doc_id) pairs, bounded by total URL mentions",
)
def x_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    wtext = F.expr(
        "concat('see https://', source, '.example.com/', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 3 = 0 "
        "THEN concat(' and http://mirror-', source, '.org/x') ELSE '' END, ' ', text)"
    )
    doms = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(wtext, F.lit(r"https?://([^/\s]+)"), 1)
        ).alias("domain"),
    )
    return doms.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


_WINNOW_K, _WINNOW_W = 4, 4
# duckdb twins of operators/text.py::winnow_fingerprints (1-based inclusive
# list slicing: toks[i : i+k-1] is k elements)
_WINNOW_CTE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - {_WINNOW_K} + 2),
                        i -> md5(array_to_string(toks[i:i+{_WINNOW_K - 1}], ' '))) AS grams
  FROM t WHERE len(toks) >= {_WINNOW_K + _WINNOW_W - 1}),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(grams) - {_WINNOW_W} + 2),
                                      j -> list_min(grams[j:j+{_WINNOW_W - 1}]))) AS fps
  FROM g)
""".strip()


_WINNOW_MAX_DF = 50  # hot-fingerprint guard: prune fps shared by > this many docs


@register(
    "x_winnow_pairs",
    f"""
{_WINNOW_CTE},
post AS (SELECT doc_id, unnest(fps) AS fp FROM f),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS common
  FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
  WHERE a.fp IN (SELECT fp FROM post GROUP BY fp HAVING count(*) <= {_WINNOW_MAX_DF})
  GROUP BY 1, 2)
SELECT id_a, id_b, common FROM pairs WHERE common >= 2
""".strip(),
    doc="Partial-overlap dedup candidates via winnowing (k=4-token grams, "
    "w=4 window, min-hash per window): any shared run of k+w-1 tokens "
    "lands an identical fingerprint in both docs, so a copied paragraph "
    "inside an otherwise-different document is caught — the overlap "
    "class whole-doc MinHash dilutes away — with ~1/w the inverted-"
    "index size of full k-gram Jaccard. Equi-join on fingerprint with a "
    f"max_df={_WINNOW_MAX_DF} hot-fingerprint prune (a fp shared by F "
    "docs costs F^2/2 join rows, so ubiquitous boilerplate must be "
    "dropped pre-join), pair-count filter >= 2",
)
def x_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.winnow_pairs(
        d, k=_WINNOW_K, w=_WINNOW_W, min_common=2, max_df=_WINNOW_MAX_DF
    )


# ---------------------------------------------------------------------------
# PII redaction / governance filters / real-codec multimodal features
# ---------------------------------------------------------------------------

# Like _DOMAIN_TEXT_SQL: the synthetic documents carry no PII, so both
# sides weave deterministic PII from fixture columns with the same
# expression — every doc gets an e-mail; doc_id % 3 adds a phone,
# % 5 an SSN, % 7 an IPv4 — then the scrub runs over the woven text.
_PII_TEXT_SQL = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' call (555) 123-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END"
    " || ' ' || text"
)

_PII_WEAVE_SPARK = (
    "concat('contact user', CAST(doc_id AS STRING), '@', source, '.example.com', "
    "CASE WHEN doc_id % 3 = 0 THEN concat(' call (555) 123-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN concat(' ssn 123-45-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN concat(' host 10.0.', "
    "CAST(doc_id % 256 AS STRING), '.1') ELSE '' END, "
    "' ', text)"
)


def _pii_oracle() -> str:
    pats = text.PII_PATTERNS
    counts = ",\n         ".join(
        f"CAST(length(regexp_extract_all(wtext, '{p}')) AS BIGINT) AS n_{label}"
        for label, p in pats.items()
    )
    scrub = "wtext"
    for label, p in pats.items():
        scrub = f"regexp_replace({scrub}, '{p}', '<{label.upper()}>', 'g')"
    return f"""
WITH w AS (SELECT doc_id, {_PII_TEXT_SQL} AS wtext FROM documents),
s AS (
  SELECT doc_id,
         {counts},
         {scrub} AS scrub
  FROM w)
SELECT doc_id, n_ssn, n_phone, n_ip, n_email,
       md5(scrub) AS scrub_md5,
       CAST(length(scrub) AS BIGINT) AS scrub_chars
FROM s
""".strip()


@register(
    "x_pii_scrub",
    _pii_oracle(),
    doc="PII detection + redaction: count SSN / phone / IPv4 / e-mail "
    "patterns on the original text, replace each class with a <LABEL> "
    "placeholder in the contract order ssn -> phone -> ip -> email "
    "(operators/text.py::pii_scrub) — the privacy pass a training corpus "
    "runs before tokenization. Patterns restricted to the Java-regex/RE2 "
    "common subset; output compared by md5 of the scrubbed text. Pure "
    "regexp column expressions: scan-parallel, no shuffle, 100 TB-safe",
)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    woven = d.select("doc_id", F.expr(_PII_WEAVE_SPARK).alias("wtext"))
    scrubbed = text.pii_scrub(woven, text_col="wtext", out_col="scrub")
    return scrubbed.select(
        "doc_id",
        "n_ssn",
        "n_phone",
        "n_ip",
        "n_email",
        F.md5(F.col("scrub")).alias("scrub_md5"),
        F.length("scrub").cast("bigint").alias("scrub_chars"),
    )


_BLOCKLIST = [
    "src3.example.com",
    "src7.example.com",
    "src18.example.com",
    "mirror-src1.org",
    "mirror-src13.org",
]
_BLOCKLIST_IN = ", ".join(f"'{d}'" for d in _BLOCKLIST)


@register(
    "x_blocklist_filter",
    rf"""
WITH w AS (SELECT doc_id, {_DOMAIN_TEXT_SQL} AS wtext FROM documents),
d AS (
  SELECT doc_id, unnest(regexp_extract_all(wtext, 'https?://([^/\s]+)', 1)) AS domain
  FROM w),
b AS (SELECT DISTINCT doc_id FROM d WHERE domain IN ({_BLOCKLIST_IN})),
keep AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM b))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(min(doc_id) AS BIGINT) AS first_doc
FROM keep GROUP BY source
""".strip(),
    doc="Domain-blocklist governance filter: extract every URL host per "
    "document (same weave as x_domain_stats), drop any document citing a "
    "blocklisted domain, report surviving docs per source. The blocklist "
    "is a literal dim broadcast to every executor (no shuffle for the "
    "membership probe); only the blocked-doc-id anti-join shuffles, keyed "
    "on doc_id — the robots/licence/toxic-domain exclusion step of a "
    "crawl pipeline, scale-safe because the blocklist is small by nature",
)
def x_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    wtext = F.expr(
        "concat('see https://', source, '.example.com/', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 3 = 0 "
        "THEN concat(' and http://mirror-', source, '.org/x') ELSE '' END, ' ', text)"
    )
    doms = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(wtext, F.lit(r"https?://([^/\s]+)"), 1)
        ).alias("domain"),
    )
    bl = spark.createDataFrame([(x,) for x in _BLOCKLIST], "domain string")
    blocked = (
        doms.join(F.broadcast(bl), "domain", "semi").select("doc_id").distinct()
    )
    keep = d.join(blocked, "doc_id", "left_anti")
    return keep.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@register(
    "x_image_ahash_dedup",
    """
SELECT CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY doc_id % 50
""".strip(),
    doc="Image near-dup dedup through the REAL image codecs (PNG; "
    "lossless WebP/VP8L for key classes doc_id % 50 with class % 6 == 2 "
    "— color-indexing transform, 8-pixel bundling; AVIF via the system "
    "libheif AV1-lossless for class % 6 == 3 (round-16 bridge, "
    "operators/libheif_bridge.py; PNG fallback when absent); LOSSY-VP8 "
    "WebP via "
    "the system libwebp for class % 6 == 4, quality 90; 24-bit BMP for "
    "class % 6 == 5): synthesize a "
    "64x64 greyscale PNG per doc (payload class = doc_id % 50, so ~N/50 "
    "docs share each image bit-for-bit), decode with the stdlib PNG "
    "decoder, compute a 64-bit average-hash (8x8 block means vs global "
    "mean), and group documents by hash. The aHash of the synthetic "
    "pattern provably equals its md5-derived bit pattern, so the duckdb "
    "oracle recovers the exact clustering closed-form WITHOUT decoding — "
    "a hash-checked gate over the full encode -> Arrow -> decode -> "
    "feature path (operators/multimodal.py::synth_png_payload/"
    "image_ahash). Scale: one scan + mapInPandas, shuffle only (hash) "
    "pairs",
)
def x_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload(d, "image", key_mod=50)
    hashed = multimodal.image_ahash(pay)
    return hashed.groupBy("ahash").agg(
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.count("*").cast("bigint").alias("n_docs"),
    ).select("min_doc", "n_docs")


@register(
    "x_image_resize",
    """
WITH bits AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('img' || CAST(doc_id % 50 AS VARCHAR)), 1, 16)
              AS UBIGINT) AS b
  FROM documents),
w AS (SELECT doc_id,
             255 * list_sum(list_transform(range(0, 64),
                   k -> CASE WHEN (b >> (63 - k)) & 1 = 1
                        THEN 128 * (k // 8) + 8 * (k % 8) + 38 ELSE 0 END)) AS ws
      FROM bits)
SELECT doc_id, CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
       CAST(ws AS BIGINT) AS pix_wsum
FROM w
""".strip(),
    doc="Deterministic area resize through the REAL PNG codec (the "
    "fixed-resolution preprocessing step of an image training pipeline): "
    "synthesize the 64x64 block-pattern PNG per doc, decode, integer "
    "box-average down to 16x16 (4x4 boxes divide evenly, so the mean is "
    "exact truncating-integer), and emit a position-weighted pixel "
    "checksum that pins every resized pixel's value AND position. Each "
    "4x4 box lies inside one 8px pattern block, so the resized pixel is "
    "exactly the block's 0/255 bit — the oracle reproduces the checksum "
    "closed-form from the md5 bits without decoding: 255 * sum over set "
    "bits k of (128*(k div 8) + 8*(k mod 8) + 38). One scan + "
    "mapInPandas, no shuffle — operators/multimodal.py::resize_images",
)
def x_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload(d, "png", key_mod=50)
    return multimodal.resize_images(pay, 16, 16)


@register(
    "x_jpeg_ahash_dedup",
    """
SELECT CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY doc_id % 40
""".strip(),
    doc="Image dedup through the REAL JPEG codec (from-scratch Annex-K "
    "encoder + general Huffman/arithmetic/IDCT decoder, "
    "operators/multimodal.py::encode_jpeg/decode_jpeg): synthesize a "
    "64x64 JPEG per doc (payload class = doc_id % 40) whose ENCODING "
    "rotates by class — greyscale baseline, 4:2:0-subsampled color "
    "(class % 5 == 1), 12-bit SOF1 (class % 5 == 2), progressive 4:2:0 "
    "color with the libjpeg default "
    "10-scan script (class % 5 == 3), 4:2:0 ARITHMETIC-coded "
    "(class % 5 == 4: sequential SOF9 / progressive SOF10 by key "
    "parity; T.81 QM coder, operators/jpeg_arith.py, "
    "conformance-tested against the system libjpeg) — decode, compute "
    "the 64-bit "
    "average-hash, group documents by hash. The synth pattern is "
    "8x8-block-constant, JPEG-block-aligned and constant-chroma, so "
    "only DC coefficients survive the FDCT under every encoding and "
    "reconstruction error is <= 1 grey level — the aHash provably "
    "equals the md5-derived bit pattern and the oracle recovers the "
    "clustering closed-form WITHOUT decoding. Scale: one scan + "
    "mapInPandas, shuffle only (hash) pairs",
)
def x_jpeg_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload(d, "jpeg", key_mod=40)
    hashed = multimodal.image_ahash(pay)
    return hashed.groupBy("ahash").agg(
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.count("*").cast("bigint").alias("n_docs"),
    ).select("min_doc", "n_docs")


@register(
    "x_audio_features",
    """
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(800 + (doc_id % 5) * 160 AS BIGINT) AS n_frames,
       CAST((800 + (doc_id % 5) * 160) // 8 AS BIGINT) AS duration_ms,
       CAST(CASE doc_id % 4
            WHEN 1 THEN CASE doc_id % 7 WHEN 0 THEN 1980 WHEN 1 THEN 3004
                 WHEN 2 THEN 4092 WHEN 3 THEN 5116 WHEN 4 THEN 5884
                 WHEN 5 THEN 6908 ELSE 7932 END
            WHEN 2 THEN CASE doc_id % 7 WHEN 0 THEN 2016 WHEN 1 THEN 3008
                 WHEN 2 THEN 4032 WHEN 3 THEN 4992 WHEN 4 THEN 6016
                 WHEN 5 THEN 7040 ELSE 8064 END
            ELSE 2000 + (doc_id % 7) * 1000
            END AS BIGINT) AS peak_amplitude
FROM documents
""".strip(),
    doc="Audio feature extraction through the REAL audio codecs: "
    "synthesize a mono square wave per doc (n_frames and amplitude are "
    "integer functions of doc_id) whose ENCODING rotates by doc_id % 4 "
    "— PCM16 WAV (stdlib wave), G.711 mu-law (tag 7), G.711 A-law "
    "(tag 6) through the from-scratch RIFF reader "
    "(operators/multimodal.py::decode_wav_samples), and FLAC through "
    "the from-scratch operators/flac.py codec — decode via mapInPandas, "
    "emit channels / sample-rate / frames / duration / peak. PCM and "
    "FLAC peaks are exactly +-amp (FLAC is lossless); G.711 is lossy "
    "through a FIXED 256-level table, so the decoded peak is the "
    "nearest G.711 level of amp and the oracle states those quantized "
    "levels as literals (pinned against the canonical CCITT tables by "
    "tests/test_wav_codecs.py) — every feature stays closed-form "
    "WITHOUT the oracle decoding anything",
)
def x_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    # the payload depends only on doc_id % 4 / % 5 / % 7, all preserved
    # by % 140 — folding keys makes the synth lru_cache actually hit
    # (the G.711 nearest-level encode is the priciest fixture synth)
    pay = multimodal.attach_synth_payload(d, "wav", key_mod=140)
    return multimodal.extract_audio_meta(pay).select(
        "doc_id", "n_channels", "sample_rate", "n_frames", "duration_ms", "peak_amplitude"
    )


@register(
    "x_image_neardup_pairs",
    """
SELECT CAST(d.doc_id AS BIGINT) AS id_a,
       CAST(d.doc_id + 1 AS BIGINT) AS id_b,
       CAST(1 AS BIGINT) AS hamming
FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 1
WHERE d.doc_id % 2 = 0
""".strip(),
    doc="Image NEAR-dup pairs through the real image codecs: odd docs "
    "carry their even predecessor's image with one 8x8 block inverted "
    "(a known Hamming-1 aHash perturbation), the CODEC rotating by pair "
    "class — PNG, baseline 4:2:0 color JPEG, lossless WebP (VP8L), "
    "progressive 4:2:0 JPEG, lossy-VP8 WebP (system libwebp, q90) — "
    "then the generic 16-bit-chunk pigeonhole blocking "
    "(operators/dedup.py::hamming_neardup_pairs, shared with SimHash) "
    "recovers exactly the (2m, 2m+1) twin pairs at distance 1 — the "
    "block-aligned DC-only constant-chroma pattern makes every aHash "
    "bit exact under all five codecs, so the oracle stays closed-form, "
    "no decode needed. Distinct md5-derived class hashes are ~32 bits "
    "apart, so no cross-class pair survives the <=3 refine. Scale: "
    "explode x4 chunk rows, equi-join on chunk value, exact bit_count "
    "refine; pixels never shuffle",
)
def x_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload_twins(d)
    hashed = multimodal.image_ahash(pay)
    pairs = dedup.hamming_neardup_pairs(hashed, hash_col="ahash", max_hamming=3)
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )


# Guaranteed cross-doc duplicate spans: every doc_id % 4 = 0 document is
# prefixed with the same 10-token boilerplate (one full span at k=10), so
# the corpus-wide first-occurrence rule provably fires; natural repeats in
# the synthetic text dedup symmetrically on both sides.
_BOILER = "shared boilerplate header spans exactly ten tokens for dedup here"


@register(
    "x_span_dedup",
    f"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '{_BOILER} ' || text ELSE text END AS wtext
  FROM documents),
t AS (SELECT doc_id, list_filter(string_split_regex(lower(wtext), '[^a-z0-9]+'), x -> x <> '') AS toks FROM w),
s AS (SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN []
                  ELSE list_transform(range(0, CAST((len(toks) + 9) // 10 AS INT)),
                                      i -> array_to_string(toks[i*10+1:i*10+10], ' '))
             END AS spans
      FROM t),
e AS (SELECT doc_id, u.idx AS idx, u.span AS span FROM (
        SELECT doc_id, unnest(list_transform(range(0, len(spans)),
                                             i -> {{'idx': i, 'span': spans[i+1]}})) AS u
        FROM s)),
r AS (SELECT doc_id, idx, span,
             row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) AS rn
      FROM e),
k AS (SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(span, ' ' ORDER BY idx) AS clean
      FROM r WHERE rn = 1 GROUP BY doc_id)
SELECT s.doc_id,
       CAST(len(s.spans) AS BIGINT) AS n_spans,
       COALESCE(k.n_kept, 0) AS n_kept,
       md5(COALESCE(k.clean, '')) AS clean_md5
FROM s LEFT JOIN k ON s.doc_id = k.doc_id
""".strip(),
    doc="C4-style duplicate-SPAN removal (operators/text.py::dedup_spans): "
    "chunk every document into consecutive 10-token spans, keep only the "
    "corpus-wide FIRST occurrence of each span (smallest (doc_id, idx)), "
    "reassemble documents from their surviving spans — boilerplate shared "
    "across documents is removed at sub-document granularity, the overlap "
    "class whole-doc dedup cannot touch. One shuffle keyed on span text "
    "(the spans are the payload - minimum wire volume), reassembly is a "
    "map-side-combinable collect_list per doc. The weave plants one "
    "guaranteed shared span in every doc_id % 4 = 0 document",
)
def x_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    woven = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.lit(_BOILER + " "), F.col("text"))
        ).otherwise(F.col("text")).alias("wtext"),
    )
    out = text.dedup_spans(woven, text_col="wtext", span_tokens=10)
    return out.select(
        "doc_id",
        "n_spans",
        "n_kept",
        F.md5(F.col("clean")).alias("clean_md5"),
    )


_MIX_RATES = {"src0": 2.5, "src1": 0.25, "src2": 0.0}  # others: 1.0


def _mix_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{g}' THEN {r}" for g, r in sorted(_MIX_RATES.items())
    )
    rate = f"(CASE {cases} ELSE 1.0 END)"
    bucket = sampling.split_bucket_sql("doc_id")
    n = (
        f"(CAST(floor({rate}) AS INT) + "
        f"CASE WHEN {bucket} < CAST(({rate} - floor({rate})) * 10000 AS INT) "
        f"THEN 1 ELSE 0 END)"
    )
    return f"""
WITH m AS (SELECT doc_id, source, {n} AS n FROM documents)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_docs,
       CAST(min(doc_id) FILTER (WHERE n > 0) AS BIGINT) AS first_doc
FROM m GROUP BY source HAVING sum(n) > 0
""".strip()


@register(
    "x_weighted_mix",
    _mix_oracle(),
    doc="Deterministic training-mix construction "
    "(operators/sampling.py::weighted_mix): per-source sampling rates with "
    "whole-part row duplication and md5-bucket fractional sampling — "
    "src0 at 2.5 epochs, src1 at 0.25, src2 dropped, everything else 1.0 "
    "— summarized as emitted rows / surviving docs per source. Pure "
    "projection + explode (no shuffle, no RNG, reproducible across "
    "engines and partitionings); the oracle replays the exact bucket "
    "arithmetic",
)
def x_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = sampling.weighted_mix(d, _MIX_RATES)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


def _gif_oracle() -> str:
    def byte_at(h: str, c: int) -> str:
        hexd = "'0123456789abcdef'"
        return (
            f"CAST((strpos({hexd}, substr({h}, {c}, 1)) - 1) * 16 + "
            f"(strpos({hexd}, substr({h}, {c + 1}, 1)) - 1) AS BIGINT)"
        )

    h = "md5('gif' || CAST(doc_id % 25 AS VARCHAR) || ':' || CAST(i AS VARCHAR))"
    return f"""
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       {byte_at(h, 1)} AS r,
       {byte_at(h, 3)} AS g,
       {byte_at(h, 5)} AS b
FROM documents, range(0, 4) t(i)
WHERE i <= (doc_id % 25) % 4
""".strip()


@register(
    "x_gif_frame_colors",
    _gif_oracle(),
    doc="Video-style frame analysis through the REAL multi-frame codecs "
    "(GIF via stdlib-LZW decode_gif; animated WebP via the VP8X+ANIM/"
    "ANMF compositor operators/webp.py::decode_webp_frames, key class "
    "% 5 == 3): each doc carries (key % 4) + 1 solid-color frames whose "
    "colors are md5-derived, the decoder reconstructs every frame "
    "(color table / canvas compositing), and the exact integer mean "
    "color per frame is emitted — which the duckdb oracle recomputes as "
    "a hex-parse, closed-form, WITHOUT decoding. One mapInPandas scan; "
    "only per-frame statistics cross the Arrow boundary, pixels never "
    "leave the worker",
)
def x_gif_frame_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    pay = multimodal.attach_synth_payload(d, "gif", key_mod=25)
    return multimodal.extract_gif_frame_colors(pay)


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle (reproducible training order)
# ---------------------------------------------------------------------------

_SHUF_SEED = 42


@register(
    "x_corpus_shuffle",
    f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SHUF_SEED}'), 1, 14)) AS BIGINT) AS hkey
  FROM documents)
SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY hkey, doc_id) AS BIGINT) AS shuffle_pos
FROM h
""".strip(),
    doc="Deterministic global corpus shuffle: every document gets its "
    "exact position in a seeded pseudo-random training order (56-bit md5 "
    "of doc_id+seed, ties broken by doc_id — rerunning with the same "
    "seed reproduces the epoch order bit-for-bit on any engine or "
    "partition layout, which engine-native rand() cannot promise).  The "
    "position is assembled with the range-bucketed global rank "
    "(operators/prefix.py::with_global_rank) — per-bucket local windows "
    "+ broadcast cumulative offsets, NO single-task global sort, so the "
    "shuffle-write stage a trainer chains after this (writing "
    "bucketed-by-position shards) scales with input splits",
)
def x_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import with_global_rank

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SHUF_SEED}"))),
                1,
                14,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hkey"),
    )
    return (
        with_global_rank(d, ["hkey", "doc_id"], "shuffle_pos")
        .select("doc_id", "source", F.col("shuffle_pos").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "query", "merge", "vector"]
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "x_bm25_topk",
    f"""
{_TOK_CTE},
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM t),
e AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       FROM e WHERE term IN ({_BM25_TERMS_IN}) GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
w AS (SELECT tf.doc_id,
             ln(1.0 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * (tf.tf * {_BM25_K1 + 1.0})
             / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * tf.dl / s.avgdl)) AS w
      FROM tf JOIN dfs USING (term) CROSS JOIN stats s),
sc AS (SELECT doc_id, count(*) AS n_terms, sum(w) AS score FROM w GROUP BY 1),
r AS (SELECT doc_id, n_terms, score,
             row_number() OVER (ORDER BY round(score * 1000000) DESC, doc_id) AS rnk
      FROM sc)
SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms,
       round(score, 6) AS score_r, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 10
""".strip(),
    doc="BM25 top-10 retrieval (k1=1.2, b=0.75) for a fixed query-term "
    "set — the classic relevance ranking a training pipeline runs for "
    "eval-set mining and quality-by-relevance filtering. Corpus stats "
    "(N, avgdl) come from one tiny aggregate; per-(doc, term) weights "
    "are pure column arithmetic over integer tf/df/dl (map-side partial "
    "aggs, broadcast df join); the top-10 is ORDER BY + LIMIT, which "
    "Catalyst compiles to TakeOrderedAndProject (map-side partial "
    "top-k) — no global sort, no single-task window over the corpus "
    "(rank is assigned AFTER the limit, over 10 rows). Cross-engine "
    "float discipline: identical literal arithmetic on both sides, "
    "ranking on round(score*1e6) so sub-ulp ln/sum-order differences "
    "cannot flip an order, score emitted at 6 dp",
)
def x_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{text.tokens_sql('text')} AS toks"
    )
    d = _persist(d.select("doc_id", "toks", F.size("toks").alias("dl")))
    n_docs, avgdl = d.select(F.count(F.lit(1)), F.avg("dl")).first()
    if not n_docs or avgdl is None:
        # Empty corpus: degrade to the contract-schema empty result like
        # every lazy query does, instead of float(None) blowing up at
        # plan-construction time (the corpus stats are the one eager step).
        return spark.createDataFrame(
            [], "doc_id bigint, n_terms bigint, score_r double, rnk bigint"
        )
    e = d.select("doc_id", "dl", F.explode("toks").alias("term")).where(
        F.col("term").isin(_BM25_TERMS)
    )
    tf = e.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = tf.join(F.broadcast(dfs), "term").withColumn(
        "w",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.lit(float(avgdl)))
        ),
    )
    sc = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("w").alias("score")
    )
    qkey = F.round(F.col("score") * F.lit(1000000.0))
    top = sc.orderBy(qkey.desc(), F.col("doc_id")).limit(10)
    rnk = F.row_number().over(Window.orderBy(qkey.desc(), F.col("doc_id")))
    return top.withColumn("rnk", rnk).select(
        "doc_id",
        F.col("n_terms").cast("bigint").alias("n_terms"),
        F.round(F.col("score"), 6).alias("score_r"),
        F.col("rnk").cast("bigint").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM quality scoring
# ---------------------------------------------------------------------------


@register(
    "x_bigram_lm_score",
    f"""
{_TOK_CTE},
e AS (SELECT doc_id, u.bg[1] AS w1, u.bg[2] AS w2
      FROM (SELECT doc_id,
                   unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
            FROM t) u),
cb AS (SELECT w1, w2, count(*) AS cb FROM e GROUP BY 1, 2),
cu AS (SELECT w1, count(*) AS cu FROM e GROUP BY 1),
v AS (SELECT count(DISTINCT w1) AS v FROM e),
sc AS (SELECT e.doc_id, count(*) AS n_bigrams,
              avg(ln((cb.cb + 1.0) / (cu.cu + v.v))) AS lp
       FROM e JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
       GROUP BY e.doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(lp, 6) AS avg_logp
FROM sc WHERE doc_id < 50
""".strip(),
    doc="Bigram-LM quality scoring: per-document average add-one-smoothed "
    "conditional log-likelihood ln((c(w1,w2)+1)/(c(w1)+V)) under the "
    "corpus's own bigram counts — the classic cheap LM-based quality "
    "signal (perplexity filtering) a training pipeline runs before "
    "spending real model compute. Bigrams are one zip_with over the "
    "token array (no Python); counts are two partially-aggregated "
    "groupBys joined back (the bigram-count join broadcasts when small); "
    "V is one scalar. Scored sample bounded to doc_id < 50 so the gate "
    "hashes full float rows; 6-dp rounding absorbs sub-ulp ln/sum-order "
    "engine differences (same discipline as x_bm25_topk)",
)
def x_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{text.tokens_sql('text')} AS toks"
    )
    # greatest(..., 0): a zero/one-token doc (empty or punctuation-only
    # text) would otherwise pass a negative length to slice(), which Spark
    # rejects with INVALID_PARAMETER_VALUE.LENGTH while DuckDB's list
    # slicing tolerates it — a Spark-only job failure on real corpora.
    e = _persist(
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    "         slice(toks, 2, greatest(size(toks) - 1, 0)),"
                    "         (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
    )
    cb = e.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = e.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = e.agg(F.count_distinct("w1").alias("v"))
    # Corpus-wide counts (cb/cu/v) must see ALL documents, but only the
    # scored sample flows through the scoring join + per-doc aggregate —
    # pre-filtering the probe side cuts that join's input ~10x here and
    # far more at real scale when callers score a sample of the corpus.
    scored = e.where(F.col("doc_id") < 50)
    sc = (
        scored.join(cb, ["w1", "w2"])
        .join(cu, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.avg(
                F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("v")))
            ).alias("lp"),
        )
    )
    return sc.select(
        "doc_id", "n_bigrams", F.round(F.col("lp"), 6).alias("avg_logp")
    )


# ---------------------------------------------------------------------------
# Tokenizer construction / collocations / embedding-space drift
# ---------------------------------------------------------------------------


@register(
    "x_bpe_pair_counts",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
v AS (SELECT unnest(toks) AS w FROM t),
vocab AS (SELECT w, count(*) AS freq FROM v GROUP BY 1),
ch AS (SELECT w, freq, list_transform(range(1, len(w)),
                                      i -> substr(w,i,1) || ' ' || substr(w,i+1,1)) AS prs
       FROM vocab),
pr AS (SELECT unnest(prs) AS pair, freq FROM ch),
agg AS (SELECT pair, sum(freq) AS cnt FROM pr GROUP BY 1),
r AS (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk FROM agg)
SELECT pair, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 20
""".strip(),
    doc="One BPE merge iteration (Sennrich et al.): corpus-frequency-"
    "weighted adjacent character-pair counts over the vocabulary, top-20 "
    "merge candidates — the subword-tokenizer construction step. The "
    "token explode shrinks map-side into |vocab|; pair generation is "
    "pure column expressions over vocabulary rows; top-k is "
    "TakeOrderedAndProject (no global sort); rank window over 20 rows. "
    "Integer counts, no float discipline needed — "
    "operators/text.py::bpe_pair_counts",
)
def x_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_pair_counts(load(spark, sf_dir, "documents"), k=20)


retire(
    "x_bpe_pair_counts",
    "single iteration of the merge loop x_bpe_train_k gates end to end "
    "(k=8 argmax+merge rounds over the same pair-count derivation)",
)


_BPE_K = 8

# The two BPE-critical SQL fragments, shared by the train and apply oracle
# builders (ONE copy — a fix applied to one oracle alone would make
# x_bpe_train_k and x_bpe_apply derive different merge sequences from the
# same corpus).  The fold is the engine-exactness-critical part: a greedy
# left-to-right non-overlapping merge as a single-string list_reduce whose
# accumulator seeds with the FIRST element, matching Spark's
# aggregate(slice(arr, 2, n-1), arr[0], step) — repeated global
# regexp_replace is NOT equivalent (match resumption skips back-to-back
# occurrences).
_BPE_PAIR_CTE = (
    "SELECT pair, sum(freq) AS cnt FROM ("
    "SELECT freq, unnest(list_transform(range(1, len(syms)), "
    "j -> syms[j] || ' ' || syms[j + 1])) AS pair FROM {src}) GROUP BY 1"
)
_BPE_FOLD = (
    "string_split(list_reduce(syms, "
    "(acc, x) -> CASE WHEN (acc = m.a OR ends_with(acc, ' ' || m.a)) "
    "AND x = m.b "
    "THEN left(acc, length(acc) - length(m.a)) || m.a || m.b "
    "ELSE acc || ' ' || x END), ' ')"
)


def _bpe_train_oracle(k: int) -> str:
    """Unrolled-CTE twin of text.bpe_train: k argmax+merge iterations.

    The merge step is the SAME single-string greedy fold as the Spark
    operator (see _BPE_FOLD), so the merge sequence — not just the
    counts — is engine-exact.  Merge exhaustion (no pair left before
    round k) needs no guard HERE: an empty m{{i}} empties v{{i}} and every
    later p/m, so the UNION-ALL emits exactly the merges that happened —
    the same prefix Spark's break-on-None loop records."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"p{i} AS ({_BPE_PAIR_CTE.format(src=f'v{i - 1}')}),\n"
            f"m{i} AS (SELECT pair, cnt, split_part(pair, ' ', 1) AS a, "
            f"split_part(pair, ' ', 2) AS b "
            f"FROM p{i} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        if i < k:  # the k-th merge is recorded, never applied
            steps.append(
                f"v{i} AS (SELECT freq, {_BPE_FOLD} AS syms "
                f"FROM v{i - 1}, m{i} m)"
            )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rnk, pair, CAST(cnt AS BIGINT) AS cnt "
        f"FROM m{i}"
        for i in range(1, k + 1)
    )
    return f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
vocab AS (SELECT w, count(*) AS freq FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
v0 AS (SELECT freq, list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms
       FROM vocab),
{",".join(steps)}
{selects}
""".strip()


@register(
    "x_bpe_train_k",
    _bpe_train_oracle(_BPE_K),
    doc=f"Full BPE vocabulary training loop ({_BPE_K} merges, Sennrich et "
    "al.): iterate corpus-frequency-weighted argmax pair + greedy "
    "non-overlapping merge over the vocabulary symbol arrays, emitting "
    "the exact merge SEQUENCE (rnk, pair, cnt) — the tokenizer-prep "
    "loop x_bpe_pair_counts runs one step of. Only the initial token "
    "explode is corpus-sized; each iteration is a |pairs| partial agg + "
    "a 1-row TakeOrderedAndProject argmax + a column-expression merge "
    "fold, with per-round localCheckpoint and superseded-checkpoint "
    "release (the pagerank idiom). The unrolled-CTE oracle replicates "
    "the same greedy fold via list_reduce, so the sequence is "
    "engine-exact — operators/text.py::bpe_train",
)
def x_bpe_train_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_train(load(spark, sf_dir, "documents"), k=_BPE_K)


def _bpe_apply_oracle(k: int) -> str:
    """Unrolled-CTE twin of text.bpe_encode_stats: re-derive the k-merge
    sequence exactly as _bpe_train_oracle does (same argmax + greedy-fold
    fragments, but carrying the word through and applying ALL k merges —
    training never applies its k-th), then encode the vocabulary and
    aggregate per-document compression stats through the token stream.

    Unlike the train oracle, the APPLY chain must survive merge
    exhaustion: the encoded vocabulary is the final v{{k}}, so an empty
    m{{i}} must pass v{{i-1}} through unchanged (LEFT JOIN + CASE), not
    empty it — a plain cross join against the empty argmax would wipe
    v{{i}}..v{{k}} and return zero rows on a legal corpus whose merges run
    dry before round k (Spark's loop breaks and keeps the vocab)."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"p{i} AS ({_BPE_PAIR_CTE.format(src=f'v{i - 1}')}),\n"
            f"m{i} AS (SELECT split_part(pair, ' ', 1) AS a, "
            f"split_part(pair, ' ', 2) AS b "
            f"FROM p{i} ORDER BY cnt DESC, pair LIMIT 1),\n"
            f"v{i} AS (SELECT w, freq, "
            f"CASE WHEN m.a IS NULL THEN syms ELSE {_BPE_FOLD} END AS syms "
            f"FROM v{i - 1} LEFT JOIN m{i} m ON TRUE)"
        )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
e AS (SELECT doc_id, unnest(toks) AS w FROM t),
vocab AS (SELECT w, count(*) AS freq FROM e GROUP BY 1),
v0 AS (SELECT w, freq, list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)) AS syms
       FROM vocab),
{",".join(steps)},
enc AS (SELECT w, len(syms) AS n_sub FROM v{k})
SELECT e.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(length(e.w)) AS BIGINT) AS n_chars,
  CAST(sum(enc.n_sub) AS BIGINT) AS n_subwords
FROM e JOIN enc USING (w) GROUP BY 1
""".strip()


@register(
    "x_bpe_apply",
    _bpe_apply_oracle(_BPE_K),
    doc=f"BPE tokenizer APPLY: encode the corpus with the freshly trained "
    f"{_BPE_K}-merge vocabulary (x_bpe_train_k's loop, all merges "
    "applied) and emit per-document compression stats (n_words, "
    "n_chars, n_subwords) — the sequence-length-budget / out-of-domain "
    "signal. The k greedy folds run over |vocab| rows only (pure column "
    "expressions); encoded word lengths join back into the token stream "
    "(AQE-broadcast while the vocabulary fits) for one map-side-partial "
    "per-doc aggregation. Zero-token documents produce no row; "
    "all-bigint output — operators/text.py::bpe_encode_stats",
)
def x_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bpe_encode_stats(load(spark, sf_dir, "documents"), k=_BPE_K)


@register(
    "x_pmi_pairs",
    f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
e AS (SELECT doc_id, unnest(toks) AS term FROM t2),
dfc AS (SELECT term, count(*) AS df FROM e GROUP BY 1),
top AS (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS trk
        FROM dfc QUALIFY trk <= 40),
ef AS (SELECT e.doc_id, e.term, top.df FROM e JOIN top USING (term)),
n AS (SELECT count(*) AS n_docs FROM t2),
prs AS (SELECT a.term AS w1, b.term AS w2, a.df AS df1, b.df AS df2, count(*) AS cab
        FROM ef a JOIN ef b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1,2,3,4),
sc AS (SELECT w1, w2, cab, ln(cab * 1.0 * n.n_docs / (df1 * df2)) AS pmi
       FROM prs CROSS JOIN n),
r AS (SELECT w1, w2, CAST(cab AS BIGINT) AS cab, round(pmi, 6) AS pmi_r,
             row_number() OVER (ORDER BY round(pmi * 1000000) DESC, w1, w2) AS rnk
      FROM sc)
SELECT w1, w2, cab, pmi_r, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 25
""".strip(),
    doc="Top-25 document-level PMI collocations over the 40 highest-df "
    "terms: pmi = ln(c_ab*N/(df_a*df_b)) with distinct-term doc counts — "
    "phrase-vocabulary mining / topic-coherence. The vocab restriction "
    "bounds per-doc pair explosion at vocab_top^2; pairs come from the "
    "per-doc sorted term array via transform/flatten (NO self-join of "
    "the exploded table); df table and N broadcast. Rank on "
    "round(pmi*1e6), 6-dp emit — operators/text.py::pmi_top_pairs",
)
def x_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.pmi_top_pairs(load(spark, sf_dir, "documents"), vocab_top=40, k=25)


@register(
    "x_embed_centroids",
    f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE {_VEC_VALID}),
u AS (SELECT label, i AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q6
      FROM e, unnest(range(1, len(embedding) + 1)) AS t(i)),
c AS (SELECT label, pos, sum(q6) AS sq, count(*) AS n FROM u GROUP BY 1,2),
nrm AS (SELECT label, max(n) AS n_vecs, sum(CAST(sq AS HUGEINT) * sq) AS nq
        FROM c GROUP BY 1 HAVING sum(CAST(sq AS HUGEINT) * sq) > 0),
pairs AS (SELECT a.label AS label_a, b.label AS label_b,
                 sum(CAST(a.sq AS HUGEINT) * b.sq) AS dq
          FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
          GROUP BY 1,2)
SELECT CAST(p.label_a AS BIGINT) AS label_a, CAST(p.label_b AS BIGINT) AS label_b,
       CAST(na.n_vecs AS BIGINT) AS n_a, CAST(nb.n_vecs AS BIGINT) AS n_b,
       round(CAST(p.dq AS DOUBLE)
             / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE))), 6) AS cos_r
FROM pairs p JOIN nrm na ON na.label = p.label_a JOIN nrm nb ON nb.label = p.label_b
""".strip(),
    doc="Pairwise cosine between per-label embedding centroids — the "
    "corpus-drift / cluster-separation report over embedded shards. "
    "Every cross-row aggregate is INTEGER (1e-6 fixed-point components, "
    "bigint/decimal(38,0) sums), so the final cosine is one "
    "deterministic double expression over exact integers: hash-safe "
    "across engines with no float-sum-order discipline. posexplode "
    "partially aggregates map-side to |labels| x dim rows; norms and "
    "the pos-equi dot join run on that tiny broadcast table — "
    "operators/similarity.py::label_centroid_cosines",
)
def x_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_centroid_cosines(load(spark, sf_dir, "embeddings"))


_SEMDEDUP_RADIUS = 85_000  # int8-code squared-L2 near-dup threshold
_SEMDEDUP_BITS = 6  # 2^6 coarse cells at fixture scale (production: 16-20)
_SEMDEDUP_VALID = _VEC_VALID  # one shared validity domain (see _Q8_VALID note)
_SEMDEDUP_CELL = " + ".join(
    f"(CASE WHEN q8[{i + 1}] < 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_SEMDEDUP_BITS)
)


@register(
    "x_semantic_dedup",
    f"""
WITH RECURSIVE
s AS (SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS m
      FROM embeddings WHERE {_SEMDEDUP_VALID}),
c AS (SELECT vec_id, label,
             CASE WHEN m > 0
                  THEN list_transform(embedding, x ->
                       greatest(-127, CAST(floor(CAST(x AS DOUBLE) * 127.0 / m) AS BIGINT)))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q8
      FROM embeddings CROSS JOIN s
      WHERE {_SEMDEDUP_VALID}),
cc AS (SELECT vec_id, label, q8, ({_SEMDEDUP_CELL}) AS cell FROM c),
jp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM cc a JOIN cc b ON a.cell = b.cell AND a.vec_id < b.vec_id
                          AND len(a.q8) = len(b.q8)
       WHERE CAST(list_sum(list_transform(range(1, len(a.q8) + 1),
             i -> (a.q8[i] - b.q8[i]) * (a.q8[i] - b.q8[i]))) AS BIGINT)
             <= {_SEMDEDUP_RADIUS}),
edges AS (SELECT id_a AS src, id_b AS dst FROM jp UNION SELECT id_b, id_a FROM jp),
reach(a, b) AS (
  SELECT vec_id, vec_id FROM cc
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
comp AS (SELECT a AS vec_id, min(b) AS canonical_id FROM reach GROUP BY a)
SELECT CAST(cc.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN cc.vec_id = comp.canonical_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM cc JOIN comp USING (vec_id)
GROUP BY 1
""".strip(),
    doc="SemDeDup-shaped semantic dedup end-to-end (the one LLM-pipeline "
    "family previously missing a composite): corpus-global int8 quantize "
    "-> IVF seed-cell assignment (sign bits of the first 6 code "
    "components) -> within-cell integer squared-L2 near-dup pairs (<= "
    f"{_SEMDEDUP_RADIUS}) -> min-label connected components -> per-label "
    "retention (n_vecs, n_kept: each component keeps its smallest id). "
    "Deterministic and integer-exact at every cross-row step; the "
    "quadratic term is per-cell inside one equi-join (coarse_bits is the "
    "cell-size knob; like SemDeDup, near-dups are sought within a "
    "cluster only) — operators/similarity.py::semantic_dedup",
)
def x_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e, radius=_SEMDEDUP_RADIUS, coarse_bits=_SEMDEDUP_BITS
    )


_CDC_POWERS = [text.CDC_BASE**e for e in range(text.CDC_K - 1, -1, -1)]
_CDC_TERMS = " + ".join(
    f"CAST(codes[i+{j}] AS BIGINT)*{_CDC_POWERS[j]}" for j in range(text.CDC_K)
)


# Shared CDC chunk-derivation CTE chain (doc_id, chunk s/e spans) — the
# DuckDB mirror of operators/text.py::cdc_chunks, used by BOTH the batch
# (x_cdc_dedup) and streaming (s32) oracles so the cut rule can never
# desynchronize between them.
_CDC_CHUNK_CTES = f"""
WITH d0 AS (SELECT doc_id, text FROM documents WHERE length(text) >= 1),
c AS (SELECT doc_id, text, length(text) AS L,
        list_transform(range(1, length(text)+1), i -> ascii(substr(text, i, 1))) AS codes
      FROM d0),
h AS (SELECT doc_id, text, L,
        CASE WHEN L >= {text.CDC_K}
             THEN list_transform(range(1, L - {text.CDC_K - 2}),
                  i -> CASE WHEN ({_CDC_TERMS}) % {text.CDC_DIVISOR} = 0
                            THEN i + {text.CDC_K - 1} END)
             ELSE [] END AS rawcuts FROM c),
cu AS (SELECT doc_id, text, L,
        list_concat(list_filter(rawcuts, x -> x IS NOT NULL AND x < L), [L]) AS cuts
       FROM h),
ch AS (SELECT doc_id, j AS chunk_idx,
        (CASE WHEN j = 1 THEN 0 ELSE cuts[j - 1] END) + 1 AS s,
        cuts[j] AS e, text
      FROM cu, unnest(range(1, len(cuts)+1)) AS u(j))
""".strip()


@register(
    "x_cdc_dedup",
    f"""
{_CDC_CHUNK_CTES},
rows_ AS (SELECT doc_id, md5(substr(text, s, e - s + 1)) AS chunk_md5,
                 e - s + 1 AS chunk_len FROM ch)
SELECT chunk_md5, CAST(max(chunk_len) AS BIGINT) AS chunk_len,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM rows_ GROUP BY 1 HAVING count(*) >= 2
""".strip(),
    doc="Content-defined chunk dedup (Rabin/FastCDC idea): cut where the "
    "rolling 8-char polynomial hash hits 0 mod 64, so boundaries follow "
    "content and an early edit re-aligns at the next boundary instead "
    "of shifting every block — the edit-robust dedup fixed-size blocks "
    "can't do. Reports chunks appearing >= 2 times (occurrences, "
    "distinct docs, first doc). Integer/string-exact throughout (int64 "
    "polynomial hash, md5 — no floats); chunking is a vectorized-numpy "
    "mapInPandas kernel riding the scan partitions (map-only, no "
    "shuffle, Arrow-batched), then one hash-partial groupBy on "
    "chunk_md5 — operators/text.py::cdc_chunks",
)
def x_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = text.cdc_chunks(load(spark, sf_dir, "documents"))
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.max("chunk_len").cast("bigint").alias("chunk_len"),
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .where(F.col("n_occ") >= 2)
        .select("chunk_md5", "chunk_len", "n_occ", "n_docs", "min_doc")
    )


@register(
    "x_dup_cluster_sizes",
    f"""
WITH cl AS ({_CLUSTERS_ORACLE}),
sz AS (SELECT canonical_id, count(*) AS cluster_size FROM cl GROUP BY 1)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sz GROUP BY 1
""".strip(),
    doc="Duplicate-cluster size distribution: how many near-dup clusters "
    "of each size the corpus contains and how many documents they hold "
    "— the shape report a dedup run is judged by (a heavy tail of giant "
    "clusters means boilerplate; all-singletons means the threshold is "
    "too tight). Two partial-agg rollups on top of the iterative "
    "min-label clustering (operators/dedup.py::connected_components); "
    "nothing new shuffles except the canonical-id count",
)
def x_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, threshold=0.1).select("id_a", "id_b")
    comp = dedup.connected_components(pairs, d.select("doc_id"))
    sz = comp.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sz.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_docs"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


retire(
    "x_dup_cluster_sizes",
    "rollup twin: two partial aggs over the identical jaccard_pairs + "
    "connected_components output that x_dedup_clusters gates row by row",
)


@register(
    "x_embed_gram",
    f"""
WITH v AS (SELECT embedding FROM embeddings WHERE {_VEC_VALID}),
dm AS (SELECT len(embedding) AS d, count(*) AS c FROM v GROUP BY 1
       ORDER BY c DESC, d ASC LIMIT 1),
q AS (SELECT vec_id, i,
                  CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS qv
           FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)
           WHERE {_VEC_VALID} AND len(embedding) = (SELECT d FROM dm)),
g AS (SELECT a.i AS i, b.i AS j, sum(CAST(a.qv AS HUGEINT) * b.qv) AS s,
             count(*) AS n
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(s AS BIGINT) AS s_q, CAST(n AS BIGINT) AS n_rows
FROM g
""".strip(),
    doc="Distributed exact Gram matrix X^T X over 1e-6 fixed-point "
    "embedding components (upper triangle, 1-based dims) — the "
    "covariance/whitening/PCA-prep statistic before decorrelating or "
    "compressing an embedding corpus. One mapInPandas pass emits a "
    "dim^2/2 triangle per partition (int64 GEMM, exact), one tiny "
    "decimal(38,0) keyed sum merges — shuffle volume is partitions x "
    "dim^2 regardless of row count, and every aggregate is integer, so "
    "the hash is engine-stable with no float discipline — "
    "operators/similarity.py::gram_matrix. Validity domain mirrored "
    "exactly: valid_vectors plus the modal-dimensionality filter "
    "(ties to the smaller dim). The oracle is the quadratic "
    "per-component self-join (fine at gate scale)",
)
def x_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.gram_matrix(load(spark, sf_dir, "embeddings"))


_QI_PCTS = (0.5, 0.9, 0.99)


@register(
    "x_quantiles_interp",
    """
WITH d AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         row_number() OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_orderkey, l_linenumber) AS rn,
         count(*) OVER () AS n
  FROM lineitem),
pos AS (
  SELECT p.p,
         CAST(FLOOR((max(d.n) - 1) * p.p) AS BIGINT) + 1 AS lo,
         (max(d.n) - 1) * p.p - FLOOR((max(d.n) - 1) * p.p) AS frac
  FROM d, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                  (CAST(0.99 AS DOUBLE))) AS p(p)
  GROUP BY p.p),
v AS (
  SELECT pos.p, pos.frac,
         max(CASE WHEN d.rn = pos.lo THEN d.price_c END) AS vlo,
         max(CASE WHEN d.rn = pos.lo + 1 THEN d.price_c END) AS vhi
  FROM d JOIN pos ON d.rn IN (pos.lo, pos.lo + 1) GROUP BY pos.p, pos.frac)
SELECT p AS pct, round(vlo + (COALESCE(vhi, vlo) - vlo) * frac, 6) AS value_c
FROM v
""".strip(),
    doc="EXACT interpolated percentiles (percentile_cont semantics: "
    "position (n-1)p, linear interpolation between the two bracketing "
    "order statistics) — the continuous twin of x_exact_quantiles' "
    "rank-selection. Rank comes from the range-bucketed assembly (no "
    "single-task window); n is known from the same action, so the "
    "bracketing positions are PLAN LITERALS and the interpolation is "
    "one deterministic double expression over two integer order "
    "statistics — identical IEEE ops on both engines, no float-sum "
    "discipline needed. p=0.99's upper neighbor can exceed n; it "
    "degrades to the lower statistic (COALESCE) on both sides",
)
def x_quantiles_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.prefix import rows_at_global_ranks

    li = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("price_c"),
        "l_orderkey",
        "l_linenumber",
    )
    specs_of = lambda n: [
        (p, int(math.floor((n - 1) * p)) + 1, (n - 1) * p - math.floor((n - 1) * p))
        for p in _QI_PCTS  # same IEEE double products as the oracle's
    ]
    picked, total = rows_at_global_ranks(
        li,
        ["price_c", "l_orderkey", "l_linenumber"],
        lambda n: [pos for _, lo, _ in specs_of(n) for pos in (lo, lo + 1)],
        "rn",
    )
    if total == 0:
        # oracle parity on an empty table: the oracle's position CTE is
        # built FROM the data, so it yields zero rows — a global
        # aggregate here would instead emit 3 all-NULL rows
        return spark.createDataFrame([], "pct double, value_c double")
    specs = specs_of(total)
    needed = sorted({pos for _, lo, _ in specs for pos in (lo, lo + 1)})
    sel = picked.select("rn", "price_c")
    agg = sel.groupBy().agg(
        *[
            F.max(F.when(F.col("rn") == pos, F.col("price_c"))).alias(f"__v{pos}")
            for pos in needed
        ]
    )
    # all 3 percentile rows come out of the ONE single-row aggregate via an
    # exploded literal-struct array — a unionByName of per-percentile
    # selects would re-execute the whole aggregate (and its upstream scan)
    # once per branch
    rows = []
    for p, lo, frac in specs:
        # lo+1 is always in `needed` by construction; a missing upper
        # neighbor (lo == n) surfaces as a NULL aggregate -> coalesce
        vlo = F.col(f"__v{lo}")
        vhi = F.coalesce(F.col(f"__v{lo + 1}"), vlo)
        rows.append(
            F.struct(
                F.lit(float(p)).alias("pct"),
                F.round(vlo + (vhi - vlo) * F.lit(frac), 6).alias("value_c"),
            )
        )
    return agg.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.pct", "s.value_c"
    )


# Retired round 13 (slot freed for x_archive_extract): the interpolated
# percentiles are the method twin of the still-gated x_exact_quantiles —
# both ride the SAME rows_at_global_ranks range-bucketed rank assembly,
# and only the final selection differs (one deterministic interpolation
# expression over two integer order statistics vs the rank-position row).
# The anchor keeps the full oracle compare green every pytest run
# (tests/test_exact_anchors.py), and the no-join plan-shape test stays on
# via corpus.spec.
retire(
    "x_quantiles_interp",
    "method twin of x_exact_quantiles (same rows_at_global_ranks "
    "rank-bucketed assembly; only the final interpolation expression "
    "differs)",
)


@register(
    "x_char_entropy",
    """
WITH d0 AS (SELECT doc_id, lower(text) AS t FROM documents
            WHERE doc_id < 100 AND length(text) > 0),
ch AS (SELECT doc_id, substr(t, i, 1) AS c
       FROM d0, unnest(range(1, length(t)+1)) AS u(i)),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(n) AS nt, count(*) AS k FROM cnt GROUP BY 1),
e AS (SELECT cnt.doc_id,
             -sum((cnt.n / CAST(tot.nt AS DOUBLE))
                  * ln(cnt.n / CAST(tot.nt AS DOUBLE))) AS ent,
             max(tot.k) AS k, max(tot.nt) AS nt
      FROM cnt JOIN tot ON tot.doc_id = cnt.doc_id GROUP BY 1)
SELECT doc_id, CAST(k AS BIGINT) AS distinct_chars, CAST(nt AS BIGINT) AS n_chars,
       abs(round(ent, 6)) AS entropy_r
FROM e
""".strip(),
    doc="Character-entropy quality signal (Shannon entropy of the "
    "lowercased char distribution): the classic gibberish/blob detector "
    "— encrypted or base64 content scores near ln(alphabet), repeated-"
    "char spam near 0, natural language in a narrow band. Char explode "
    "partially aggregates map-side to at most |alphabet| rows per doc "
    "per task; the per-doc entropy aggregate then runs over <= "
    "|alphabet| rows. doc_id < 100 sample bounds the gate output; 6-dp "
    "rounding absorbs float-sum order (bigram-LM discipline) — "
    "operators/text.py::char_entropy",
)
def x_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return text.char_entropy(d)
