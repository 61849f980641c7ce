"""Benchmark harness — prints ONE JSON line for the driver.

Workloads:
* BASELINE shapes (BASELINE.md): skyline of 1M anti-correlated points at
  d=2/3/4, domain [0,10000] — generated in-engine (sources/generators.py,
  same distributions as the reference's producer).  Reference totals at the
  same shape: ~17-19s (2-D), ~27s (3-D), ~700s (4-D).  The point set is
  persisted before timing and each shape runs median-of-5, so the
  number measures the skyline operator, not generation or JIT warm-up.
* Declared-corpus headliners at $SPARK_GRAFT_SF_DIR (default sf0.1).
* LLM-pipeline scale paths at TWO sfs (default sf0.01 vs sf0.1): the
  ``scaling`` block records both timings, input row counts, and the
  fitted exponent log(t_big/t_small)/log(n_big/n_small) — ~1.0 means
  linear.  Small-sf runs carry fixed per-query overhead (session, plan,
  tiny-task scheduling), so exponents read as a *ceiling* check (well
  below 2 = not pairwise-quadratic), not a precision fit.

Fault isolation: every query runs under try/except; a failing query records
an ``errors`` entry and the final JSON line is emitted unconditionally, so
one bad query can never zero out the whole artifact.

Artifact split: the LAST stdout line is a compact summary kept under
``_MAX_STDOUT_LINE`` chars (the driver captures only the last 2000 chars of
stdout); the full detail — scaling block, untruncated error lines — goes to
``BENCH_DETAIL.json`` next to this file and to stderr.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SMALL_SF_DIR,
BENCH_SKIP_1M=1 / BENCH_SKIP_SCALING=1 for quick runs.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_skyline_qos_flink_spark.operators.skyline import (  # noqa: E402
    skyline,
    skyline_verify_count,
)
from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import pipeline, relational  # noqa: E402, F401  (register)
from query_skyline_qos_flink_spark.session import get_spark  # noqa: E402
from query_skyline_qos_flink_spark.sources.generators import points  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# The driver keeps only the last 2000 chars of stdout; leave headroom for
# a trailing newline and any stray warning the JVM writes on shutdown.
# (Back to 1800 in r12 per ADVICE: r11's 1850 left only ~150 chars for a
# shutdown warning to land AFTER the final line without truncating it
# mid-object.  The spread map no longer needs the margin — it carries
# only the >=2x-ratio entries now that every suite query is median-agg.)
_MAX_STDOUT_LINE = 1800
CORPUS_QUERIES = [
    "s1_skyline_2d",
    "s3_skyline_3d",
    "s4_skyline_4d",
    "s8_skyline_groupwise",
    "s9_twophase_dim",
    "m1_partition_stats",
    "e1_dedup_exact",
    "e2_knn_bruteforce",
    "e3_text_stats",
    "x_minhash_lsh_pairs",
    "x_token_stats",
    "x_ann_blocked",
    "x_ann_ivf",
    "x_datapipe_prep",
    "r2_join_topk_revenue",
    "r9_sessionize",
    "r13_regional_revenue",
    "x_bloom_prune_semi",
    "x_snapshot_diff",
    "x_seq_packing",
    "x_profile_columns",
    "x_pii_scrub",
    "x_span_dedup",
    "x_image_neardup_pairs",
    "x_quality_filter",
    "x_knn_int8_rerank",
    "x_hll_distinct",
    "x_jpeg_ahash_dedup",
    "x_url_dedup",
    "s22_skyband",
    "s23_top_dominating",
    "s24_dynamic_skyline",
    "s27_reverse_skyline",
    "s34_skycube_4d",
    "s28_kdominant_skyline",
    "s29_skyline_layers",
    "s30_prob_skyline",
    "s31_thick_skyline",
    "x_cdc_dedup",
    "x_bm25_topk",
    "x_corpus_shuffle",
    "x_bigram_lm_score",
    "x_embed_gram",
    "x_char_entropy",
    "m2_strategy_stats",
    "x_semantic_dedup",
]
# r12 (verdict item 5): EVERY suite query is timed median-of-3 with its
# full rep list recorded in BENCH_DETAIL, so the headline map carries ONE
# aggregation semantics (the final line says `"agg":"median"`) and
# round-over-round diffs stop silently comparing a min to a median.
# r10/r11 mixed min-of-2 and median-of-3 entries, which made bimodal
# queries (m2_strategy_stats reps ~[4, 0.5, 5]) read as 9x "regressions"
# at identical code.  The first rep's one-time codegen/AQE-compile cost
# is naturally discarded by the median (it is almost always the max);
# the rep lists adjudicate anything surprising.
# FIXTURE-SYNTH suite entries: inputs are attach_synth_payload* media
# fixtures encoded from scratch inside the first rep's workers (see the
# corpus loop) — they get one untimed, recorded warm rep.
FIXTURE_SYNTH_QUERIES = {"x_image_neardup_pairs", "x_jpeg_ahash_dedup"}
SMALL_SF_DIR = os.environ.get("SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.01")
# scale-path queries measured at both sfs -> their driving input table
SCALING_QUERIES = {
    "x_minhash_lsh_pairs": "documents",
    "x_simhash_pairs": "documents",
    "x_cosine_neardup": "embeddings",
    "x_ann_blocked": "embeddings",
    "x_dedup_clusters": "documents",  # iterative min-label propagation
    "x_dedup_clusters_lsh": "documents",  # banded candidates feeding the same CC
    "x_semantic_dedup": "embeddings",  # quantize + cell join + components
    "x_contamination": "documents",  # hash-key anti/semi join
    "x_seq_packing": "documents",  # bucketed two-pass global cumsum
    "x_exact_quantiles": "lineitem",  # bucketed two-pass global rank
    "s1_skyline_2d": "lineitem",  # relational 2-D skyline path
    "s3_skyline_3d": "lineitem",  # mapInPandas kernel + merge path
    "x_span_dedup": "documents",  # span-keyed first-occurrence shuffle
    "x_image_neardup_pairs": "documents",  # decode + signature self-join
    "x_gif_frame_colors": "documents",  # multi-frame decode fan-out
    "x_quality_filter": "documents",  # map-only composite rule ladder
    "x_jpeg_ahash_dedup": "documents",  # real-JPEG decode + hash groupBy
    "s22_skyband": "lineitem",  # local-band superset + broadcast-verify
    "s27_reverse_skyline": "part",  # filter-then-verify refuter counting
    "s28_kdominant_skyline": "lineitem",  # non-transitive filter-then-verify
    "s29_skyline_layers": "lineitem",  # iterated skyline + broadcast peel
    "s30_prob_skyline": "lineitem",  # skyband bound + counting scans
    "s31_thick_skyline": "lineitem",  # skyline + broadcast eps band-join
    "s34_skycube_4d": "lineitem",  # fused single-pass 15-subspace lattice
    "x_cdc_dedup": "documents",  # map-only CDC chunking + hash groupBy
    "x_bm25_topk": "documents",  # explode + broadcast-df + TakeOrdered
    "x_corpus_shuffle": "documents",  # range-bucketed global rank
    "x_bigram_lm_score": "documents",  # zip_with bigrams + two count joins
    "x_pagerank": "lineitem",  # fixed-iteration join+agg, ckpt per round
    "x_kmeans_iter": "embeddings",  # literal-centroid Lloyd's, scan-side assign
    "x_bpe_apply": "documents",  # vocab-sized merge folds + encode join
    "x_multimodal_meta": "documents",  # container sniff: scan + mapInPandas
    "x_warc_extract": "documents",  # warc write+scan+HTTP split roundtrip
    "x_labelprop": "lineitem",  # per-round label join + count + struct argmax
    "x_coreness": "lineitem",  # h-index rounds: join + ranked max agg
    "x_bfs_hops": "lineitem",  # per-round relax join + partial-min shuffle
    "x_ann_recall": "embeddings",  # IVF branch + exact broadcast-knn branch
}


# In-band session-elevation calibration (r15 verdict item 2): the box
# shows hours-long ~35% whole-session elevation windows (SCALE.md
# residual-variance band) that made BENCH_r15 (57.9 s) unrecognizable
# against the same-commit floor (44.5 s) and cost a round of A/B
# adjudication.  Measure the window IN the artifact instead: a fixed
# single-thread pure-CPU burn (sha256 over a fixed buffer — no numpy/
# BLAS threading, no allocator churn) runs before and after the suite,
# and every timed rep records its /proc/stat user/sys/steal split.  An
# elevated window slows the burn and/or shows up as system/steal time;
# identical code at a quiet hour reads ~_CALIB_REF_S.
_CALIB_REF_S = 0.396  # floor burn, re-pinned r16 final run (burn_s
# [0.402, 0.396] at the 36.66 s suite total); re-pin DOWNWARD if a
# future round's burn_s beats it — never raise it to match an elevated
# session.


def _calib_burn() -> float:
    """Fixed pure-CPU burn: sha256 of 1 MiB x 512 (~0.5 GiB hashed)."""
    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(512):
        h.update(buf)
    return round(time.perf_counter() - t0, 3)


def _proc_stat() -> dict[str, float] | None:
    """Aggregate cpu line of /proc/stat in seconds (None off-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        tck = os.sysconf("SC_CLK_TCK")
        names = ("user", "nice", "system", "idle", "iowait", "irq",
                 "softirq", "steal")
        return {n: int(v) / tck for n, v in zip(names, parts[1:9])}
    except Exception:
        return None


def _stat_delta(a, b) -> dict[str, float] | None:
    if not a or not b:
        return None
    return {k: round(b[k] - a[k], 2) for k in a}


def final_line(total: float, sf, timings: dict[str, float],
               errors: dict[str, str],
               spreads: dict[str, dict] | None = None,
               calib: dict | None = None) -> str:
    """The driver-facing summary: ONE stdout JSON line <= _MAX_STDOUT_LINE.

    When the per-query map outgrows the budget, keep the slowest queries
    (the perf signal) and record how many were cut; the full map always
    lives in BENCH_DETAIL.json + stderr.  ``spreads`` contributes one
    compact max/min ratio per multi-rep query so the round artifact
    itself records the measured variance band (full rep lists stay in
    BENCH_DETAIL's spreads block).
    """
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "agg": "median",  # every entry in `queries` is a median (r12)
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    if calib:
        # the elevation header travels WITH the number it contextualizes:
        # a total read against BASELINE.md without calib is r15's mistake
        out["calib"] = calib
    if spreads:
        # 1-dp ratios for the entries whose reps actually spread (>= 2x
        # — the regression-adjudication band): with every suite query
        # median-agg now, an unfiltered map would list the whole suite;
        # exact ratios + full rep lists are in BENCH_DETAIL either way
        out["spread"] = {
            k: round(v["spread_ratio"], 1)
            for k, v in spreads.items()
            if v.get("agg") == "median" and v["spread_ratio"] >= 2.0
        }
        if not out["spread"]:
            del out["spread"]
    if errors:
        out["errors"] = {k: v[:60] for k, v in errors.items()}
    line = json.dumps(out, separators=(",", ":"))
    # spread is the other unbounded field: shrink it BEFORE trimming
    # queries (r10 ADVICE: trimming queries first let a large spread map
    # evict the slow-query entries this line exists to preserve) — but
    # smallest-ratio-first, so the high-variance entries (the
    # regression-adjudication signal) survive longest; full rep lists
    # live in BENCH_DETAIL either way
    n_spread = len(out.get("spread", {}))
    while len(line) > _MAX_STDOUT_LINE and out.get("spread"):
        sp = out["spread"]
        del sp[min(sp, key=sp.get)]
        if sp:
            out["spread_omitted"] = n_spread - len(sp)
        else:
            del out["spread"]
            out["spread_omitted"] = n_spread
        line = json.dumps(out, separators=(",", ":"))
    keep = sorted(timings, key=timings.get, reverse=True)
    while len(line) > _MAX_STDOUT_LINE and keep:
        keep = keep[:-5]
        out["queries"] = {k: round(timings[k], 2) for k in keep}
        out["queries_omitted"] = len(timings) - len(keep)
        if "errors" in out and len(out["errors"]) > 5:
            out["errors"] = dict(list(out["errors"].items())[:5])
            out["errors_omitted"] = len(errors) - 5
        line = json.dumps(out, separators=(",", ":"))
    # an all-queries-failed run has timings == {} and the loop above never
    # fires — the errors map alone must not outgrow the capture either
    while len(line) > _MAX_STDOUT_LINE and len(out.get("errors", {})) > 1:
        kept = list(out["errors"].items())[: max(len(out["errors"]) // 2, 1)]
        out["errors"] = dict(kept)
        out["errors_omitted"] = len(errors) - len(kept)
        line = json.dumps(out, separators=(",", ":"))
    return line


def main() -> None:
    spark = get_spark(app_name="skyline-bench")
    # Spin up the Python worker pool BEFORE any clock starts: the first
    # Arrow-UDF stage of a fresh session forks + imports pyspark/numpy in
    # every worker (~20 s across 32 cores, measured), which otherwise
    # lands in whichever timed query first touches a pandas path — the
    # round-9 solo run recorded skyline_anti_3d_1m at 4.3 s (vs its 1.8 s
    # steady state) purely because cold start bled past best-of-2.  The
    # warm-up measures nothing: the queries are timed, the forks are not.
    # Best-effort: a warm-up failure must never abort the run — losing the
    # whole perf artifact is worse than noisier first-query timings.
    try:
        spark.range(64, numPartitions=32).mapInPandas(
            lambda it: (pdf for pdf in it), schema="id long"
        ).count()
    except Exception as exc:
        print(f"# worker warm-up failed (continuing): {exc}", file=sys.stderr)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    scaling: dict[str, dict] = {}
    spreads: dict[str, dict] = {}
    burns: list[float] = []
    run_stat0 = _proc_stat()

    def timed(name: str, fn, repeats: int = 1, agg: str = "min") -> int | None:
        reps: list[float] = []
        cpu_split: list[list[float]] = []  # per-rep [user_s, sys_s, steal_s]

        def one_rep() -> int:
            st0 = _proc_stat()
            t0 = time.time()
            n = fn()
            reps.append(round(time.time() - t0, 3))
            d = _stat_delta(st0, _proc_stat())
            if d:
                cpu_split.append([d["user"], d["system"], d["steal"]])
            return n

        extra = 0
        for _ in range(repeats):
            try:
                n = one_rep()
            except Exception:
                errors[name] = traceback.format_exc(limit=6)
                print(f"# {name}: ERROR\n{errors[name]}", file=sys.stderr)
                return None
        # r17 (verdict item 2, additions only): sub-second medians get two
        # EXTRA reps (median-of-5).  The box's measured 2-6.5x rep-to-rep
        # spreads mean a median-of-3 cannot adjudicate the +-0.3 s deltas
        # where 20 of r16's 24 official "regressions" lived; two more
        # samples cost ~1 s/query and double the power exactly where it
        # was missing.  Same timed region, same median aggregation, and
        # every rep (with its cpu_split steal column) stays in the
        # BENCH_DETAIL spreads block for the next judge.
        if agg == "median" and repeats > 1 and sorted(reps)[len(reps) // 2] < 1.0:
            extra = 2
            for _ in range(extra):
                try:
                    n = one_rep()
                except Exception:
                    errors[name] = traceback.format_exc(limit=6)
                    print(f"# {name}: ERROR\n{errors[name]}", file=sys.stderr)
                    return None
        repeats += extra
        # MEDIAN everywhere since r12 (one agg semantics across the
        # artifact): the first rep pays codegen/AQE compile and lands at
        # the max, so the median discards it; the box's proven 2-5x
        # run-to-run spread makes a minimum an unstable round-over-round
        # comparator (round-9 directive).  agg="min" remains for ad-hoc
        # callers only.
        val = min(reps) if agg == "min" else sorted(reps)[len(reps) // 2]
        timings[name] = val
        if repeats > 1:
            # full spread to BENCH_DETAIL so the next round can separate
            # noise from regression without a worktree bisect
            spreads[name] = {
                "reps_s": reps,
                "agg": agg,
                "spread_ratio": round(max(reps) / max(min(reps), 1e-3), 2),
            }
            if cpu_split:
                # box-wide user/system/steal seconds per rep: the r15
                # TLB-shootdown episode read as 65-75% SYSTEM time, and
                # co-tenant pressure reads as steal — either signature
                # turns "mystery mover" into a one-glance adjudication
                spreads[name]["cpu_split_s"] = cpu_split
        print(f"# {name}: {n} rows in {val}s ({agg} of {repeats}: {reps})", file=sys.stderr)
        return n

    try:
        burns.append(_calib_burn())  # session-elevation probe, pre-suite
        print(f"# calib burn (pre): {burns[0]}s vs ref {_CALIB_REF_S}s",
              file=sys.stderr)
        # BASELINE workload shapes (1M anti-correlated, domain [0,10000]).
        # Persist the input first so the timing excludes generation;
        # median-of-5 to suppress run-to-run VM noise.
        if not os.environ.get("BENCH_SKIP_1M"):
            for d in (2, 3, 4):
                try:
                    df = points(
                        spark, 1_000_000, d, "anti_correlated", domain=10000, seed=42
                    ).persist()
                    df.count()  # materialize before the clock starts
                except Exception:
                    errors[f"skyline_anti_{d}d_1m"] = traceback.format_exc(limit=6)
                    continue
                dims = [f"v{i}" for i in range(d)]
                # median-of-5: the box's run-to-run variance on this shape
                # is 2-5x (measured 6-rep spreads of 1.8-11.8 s at IDENTICAL
                # code across two rounds' commits) — with the pre-timing
                # worker warm-up absorbing cold start, the median of five
                # reps is a stable round-over-round comparator where
                # best-of-3 still swung 2.45x (round-9 verdict item 5);
                # the full rep list lands in BENCH_DETAIL's spreads block
                n_timed = timed(
                    f"skyline_anti_{d}d_1m",
                    lambda df=df, dims=dims: skyline(df, dims).count(),
                    repeats=5,
                    agg="median",
                )
                # Correctness loop-closure: the 1M shapes are timed at a
                # size the sf0.01 oracle never sees, so re-verify the WHOLE
                # persisted input against the distributed result's survivor
                # matrix (skyline_verify_count): the non-dominated row
                # count equals the result count iff the result is exactly
                # the skyline.  A silent phase-1/merge divergence (false or
                # missing survivor) shows up here; a single-task re-compute
                # would be quadratic at 4-D's ~220k survivors.
                if n_timed is not None:
                    try:
                        n_ref = skyline_verify_count(df, dims, skyline(df, dims))
                        if n_ref != n_timed:
                            errors[f"skyline_anti_{d}d_1m_sizecheck"] = (
                                f"distributed skyline returned {n_timed} rows, "
                                f"single-phase kernel returned {n_ref}"
                            )
                            print(
                                f"# skyline_anti_{d}d_1m SIZECHECK FAILED: "
                                f"{n_timed} != {n_ref}",
                                file=sys.stderr,
                            )
                        else:
                            print(
                                f"# skyline_anti_{d}d_1m sizecheck ok ({n_ref} rows)",
                                file=sys.stderr,
                            )
                    except Exception:
                        errors[f"skyline_anti_{d}d_1m_sizecheck"] = traceback.format_exc(limit=6)
                df.unpersist()

        # Warm-up: first parquet scan of each fixture pays one-time costs
        # (file listing, footer reads) that are not operator cost; absorb
        # them here so the timed queries measure steady state.  (The
        # Python worker pool is already warm — main() spins it up before
        # any clock starts.)
        try:
            for t in ("lineitem", "orders", "events", "documents", "embeddings"):
                spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
        except Exception:
            pass  # warm-up is best-effort; timings just include cold costs

        # median-of-3 for every suite entry (one agg semantics across the
        # headline map, r12): the first rep's one-time codegen/broadcast/
        # AQE-compile cost lands at the max and the median discards it.
        #
        # Fixture-synth queries get ONE untimed warm rep first (recorded
        # as fixture_warm_s in the spreads block, never hidden): their
        # inputs are attach_synth_payload* fixtures whose from-scratch
        # ENCODES (progressive JPEG, VP8L) run inside the first rep's
        # workers and then sit in per-worker lru caches — rep 1 was
        # measuring fixture construction, not the operator (r14's
        # x_image_neardup_pairs reps [23.1, 0.45, 0.34], a 67x spread for
        # three straight rounds; root-caused r15, see SCALE.md).  A real
        # deployment reads already-encoded bytes from storage, so the
        # encode cost is bench-fixture-only; the decode+hash+join operator
        # path is what the timed reps measure.
        for name in CORPUS_QUERIES:
            spec = corpus.REGISTRY[name]
            warm_s = None
            warm_err = None
            if name in FIXTURE_SYNTH_QUERIES:
                t0 = time.time()
                try:
                    spec.fn(spark, SF_DIR).count()
                    warm_s = round(time.time() - t0, 3)
                except Exception as exc:
                    # keep the failure VISIBLE (the timed reps may still
                    # pass with partially-warm caches — the next round
                    # must see why rep 1 reads hot)
                    warm_err = f"{type(exc).__name__}: {exc}"[:300]
            timed(name, lambda spec=spec: spec.fn(spark, SF_DIR).count(),
                  repeats=3, agg="median")
            if warm_s is not None and name in spreads:
                spreads[name]["fixture_warm_s"] = warm_s
            if warm_err is not None:
                # record even when the timed reps ALSO failed (spreads
                # entry absent): whether the warm rep failed the same
                # way is adjudication evidence
                spreads.setdefault(name, {})["fixture_warm_error"] = warm_err

        if not os.environ.get("BENCH_SKIP_SCALING") and os.path.isdir(SMALL_SF_DIR) \
                and os.path.realpath(SMALL_SF_DIR) != os.path.realpath(SF_DIR):
            rowcount = lambda d, t: spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
            for name, table in SCALING_QUERIES.items():
                try:
                    # spec() also resolves retired anchors (x_dedup_clusters:
                    # the exact-path exponent is still the SCALE.md datum)
                    spec = corpus.spec(name)
                    t0 = time.time()
                    spec.fn(spark, SMALL_SF_DIR).count()
                    t_small = round(time.time() - t0, 3)
                    if name in timings:  # big-sf timing already measured in the suite
                        t_big = timings[name]
                    else:  # scaling-only query: keep it OUT of the suite total so
                        # "value"/"queries" mean the same thing with or without
                        # the scaling block
                        t0 = time.time()
                        n = spec.fn(spark, SF_DIR).count()
                        t_big = round(time.time() - t0, 3)
                        print(f"# scaling-only {name}: {n} rows in {t_big}s", file=sys.stderr)
                    n_small, n_big = rowcount(SMALL_SF_DIR, table), rowcount(SF_DIR, table)
                    scaling[name] = {
                        "t_small_s": t_small,
                        "t_big_s": t_big,
                        "rows_small": n_small,
                        "rows_big": n_big,
                        "exponent": (
                            round(
                                math.log(max(t_big, 1e-3) / max(t_small, 1e-3))
                                / math.log(n_big / n_small),
                                3,
                            )
                            if n_big != n_small
                            else None
                        ),
                    }
                    print(f"# scaling {name}: {scaling[name]}", file=sys.stderr)
                except Exception:
                    errors[f"scaling:{name}"] = traceback.format_exc(limit=6)
                    print(f"# scaling {name}: ERROR", file=sys.stderr)
    finally:
        burns.append(_calib_burn())  # post-suite probe: elevation can
        print(f"# calib burn (post): {burns[-1]}s", file=sys.stderr)
        # start or lift MID-run; two samples bound the window.  Judge
        # elevation by the MIN burn: the r15 pattern was WHOLE-session
        # elevation (both samples high → still flagged), while the
        # post-suite burn alone can read high purely from the suite's
        # own thermal/contention wake — flagging on that would mislabel
        # a quiet run (both raw samples stay in the artifact either way)
        min_burn = min(burns) if burns else None
        calib = {
            "burn_s": burns,
            "ref_s": _CALIB_REF_S,
            "elev_pct": (
                round((min_burn / _CALIB_REF_S - 1.0) * 100)
                if min_burn
                else None
            ),
        }
        run_d = _stat_delta(run_stat0, _proc_stat())
        if run_d:
            busy = run_d["user"] + run_d["system"]
            calib["sys_pct"] = round(100 * run_d["system"] / busy) if busy else 0
            if run_d["steal"] > 0.01 * busy:
                calib["steal_s"] = run_d["steal"]
        if calib["elev_pct"] is not None and calib["elev_pct"] > 20:
            # the artifact SAYS it sampled a hot window — r15's 57.9 s vs
            # 44.5 s floor had to be adjudicated after the fact instead
            calib["elevated"] = True
            print(f"# SESSION ELEVATED: calib burn {min_burn}s is "
                  f"{calib['elev_pct']}% over the {_CALIB_REF_S}s floor ref",
                  file=sys.stderr)
        total = round(sum(timings.values()), 3)
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        detail = {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "scaling": scaling,
            "calib": calib,
        }
        if errors:
            detail["errors"] = {k: v.splitlines()[-1] for k, v in errors.items()}
        # spreads LAST: the stderr dump's tail end is what survives inside
        # the driver's 2000-char capture alongside the final line, so the
        # rep lists for the high-variance queries sit closest to it
        detail["spreads"] = spreads
        # Full detail (scaling block, untruncated error lines) goes to a
        # sidecar + stderr; the driver only captures the LAST 2000 chars of
        # stdout, so the machine-readable final line must stay compact
        # (round-6 verdict: the full dump outgrew the capture and the round
        # recorded parsed:null).
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json"), "w") as f:
                json.dump(detail, f, indent=1)
        except Exception:
            pass
        print("# detail: " + json.dumps(detail), file=sys.stderr)
        print(final_line(total, detail["sf"], timings,
                         detail.get("errors", {}), spreads, calib))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
