#!/usr/bin/env python
"""Benchmark harness: runs the headline queries from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query seconds.

Execution is forced with the `noop` sink (full plan materialization, no
count() shortcuts).  Each query runs REPS times and the median is
reported — the reference baseline is likewise a steady-state average /
median over repeated runs (`docs/benchmarks.md`, BASELINE.md), so a
single cold run (Janino codegen compile + first file read) would not be
comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # relational surface
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "q14_window_rownum",
    "q25_events_tumbling",
    "q26_sessionize",
    # TPC-H join-heavy shapes (Q10 top-k over 4-way join; Q7 nation-pair)
    "q39_returned_items",
    "q43_volume_shipping",
    # graph operators
    "g02_degrees",
    "g04_degree_distribution",
    "g05_two_hop",
    "g07_bfs_length",
    # GraphAr reader (build cost excluded via warm cache)
    "ga02_read_edges",
    "ga03_edges_point_lookup",
    "ga05_degrees_from_offsets",
    # streaming semantics in batch mode
    "st03_session_window",
    "st04_sliding_window",
    # LLM-pipeline operators
    "t04_exact_dedup",
    "t06_minhash_clusters",
    "s01_topk_cosine",
    # round-2 additions: corpus dup-ngram sweep, bucketized interval join
    "t13_dup_ngram_coverage",
    "q53_interval_join",
    # round-2 wave 2: repetition stats, bigram-LM fluency, int8 QA,
    # k-means assign (all pure-aggregation/projection shapes)
    "t14_repetition_stats",
    "t19_lm_fluency",
    "s04_quantize_stats",
    "s05_kmeans_assign",
    # round-3: pagerank, interval overlap, chunk dedup, skip-grams,
    # real BMP decode (two Python stages), composed k-means, sqrt-n semdedup
    "g09_pagerank",
    "q56_interval_overlap_join",
    "t23_chunk_dedup",
    "t25_skipgram_topk",
    "m04_bmp_channel_stats",
    "s08_kmeans_fit",
    "s06_semdedup",
    # round-3 wave 2: sketch-exact heavy hitters, one-scan funnel fold,
    # SCD2 gaps-and-islands, PQ encode + codes-only ADC search, weighted
    # Bellman-Ford SSSP
    "t26_heavy_hitters",
    "q58_funnel",
    "q59_scd2_intervals",
    "s09_pq_encode",
    "s10_pq_adc_topk",
    "g13_sssp",
    # round-3 wave 3: k-core peeling; t27 (re-pointed at word-TRIGRAM
    # terms with max_df_frac=0.5 engaged in round 7 — the s17→s20
    # representation move) is back in the sweep after being the only
    # skipped entry: the trigram vocabulary discriminates (Σdf² 2.8e6
    # vs 4e8 for words at sf0.1), ~4.4 s/run where the word form was
    # ~3 min.
    "g14_kcore",
    "t27_tfidf_cosine_pairs",
    # round-3 wave 4: retrieval stack (BM25 + hybrid RRF), warehouse
    # surface (exact quantiles, one-scan stats, CDC upsert), graph
    # (label propagation, personalized pagerank), keep-best dedup,
    # mergeable HLL rollup, audio PCM pipeline
    "t28_bm25_topk",
    "s11_hybrid_rrf",
    "q60_exact_quantiles",
    "q61_table_stats",
    "q62_cdc_upsert",
    "g15_label_propagation",
    "g16_personalized_pagerank",
    "d05_keep_best_dedup",
    "q63_hll_sketch_union",
    "m06_audio_energy",
    # round-4: real baseline-JPEG codec round-trip (encode DCT+Huffman,
    # decode Huffman+IDCT — two Arrow-batched Python stages, no shuffle),
    # vocabulary-free feature hashing, the wedge-join link predictor,
    # and per-series gap-fill windows
    "m07_jpeg_roundtrip",
    "t32_feature_hashing",
    "g20_link_prediction",
    "q68_gapfill_interpolate",
    # round-5: real color-JPEG codec round-trip (4 codec passes incl.
    # fixed-point color transforms), real 2x thumbnail resize chain,
    # edge-granularity k-truss peeling, one-scan OHLC bars, exact
    # histogram, MIPS retrieval, char-trigram language profiles
    "m10_color_jpeg",
    "m11_thumbnail_downsample",
    "g22_ktruss",
    "q72_ohlc_resample",
    "q73_value_histogram",
    "s14_mips_topk",
    "t35_char_ngram_profile",
    # round-5 wave 2/3: native recursive CTE, VARIANT shredding,
    # point-in-time dim lookup, dynamic partition pruning (includes the
    # partitioned-fact staging write), weighted reservoir, truecolor
    # PNG + WAV container codecs
    "q74_recursive_cte",
    "q75_variant_json",
    "q76_pit_dimension_lookup",
    "q77_dynamic_partition_pruning",
    "t36_weighted_sample",
    "m12_rgb_png",
    "m13_wav_container",
    # round-6: capped SemDeDup (the production scale path next to s06's
    # exact-QA twin), indexed-color PNG codec, multi-edge-type GraphAr
    "s16_semdedup_capped",
    "m14_palette_png",
    "ga19_multi_edge_types",
    "m17_gif_lzw",
    "g24_scc",
    "g25_condensation_levels",
    "q80_kmv_distinct_rollup",
    # round-6 wave 2: CMS frequency sketch, pivot round-trip, prefix-
    # filtered Jaccard join, binary Hamming retrieval + two-stage
    # re-rank, lateral top-n, runtime bloom join, multi-source BFS,
    # Luby MIS, winnowing fingerprints, language-ID classify, animated
    # GIF codec
    "q81_cms_heavy_key_estimates",
    "q82_pivot_unpivot_roundtrip",
    "q83_lateral_topn_per_group",
    "q84_runtime_bloom_filter_join",
    "t37_language_id_classify",
    "t38_winnow_fingerprints",
    # s17_jaccard_similarity_join is deliberately NOT benched at sf0.1:
    # the t27 pathology again — the fixture's 31-word uniform vocabulary
    # makes EVERY token a stopword, so document-frequency ordering can't
    # discriminate and the rarest-token prefixes still fan out ~13M
    # candidate pairs (measured; 39 s at sf0.1).  On a Zipf vocabulary
    # (any real corpus) the prefix filter is exactly what kills that
    # fanout.  The entry stays in the correctness registry (500-doc SFs
    # are fine), and the same operator over 8-char shingles — vocab
    # ~46k on this fixture — is the realistic-discrimination shape
    # benched as s20 below (5.7 s vs 39.5 s at sf0.1, same machinery).
    "s20_shingle_jaccard_join",
    "s18_binary_hamming_topk",
    "s19_hamming_rerank_topk",
    "g26_seed_set_closeness",
    "g27_luby_mis",
    "g28_random_walks",
    "m18_animated_gif",
    # round-6 wave 3: float WAV + 16-bit PNG + PGM codecs, Gopher
    # quality rules, polymorphic UDTF
    "m19_float_wav",
    "m20_gray16_png",
    "m21_pgm_stats",
    "t39_gopher_quality_flags",
    "u08_polymorphic_udtf",
    "q85_time_weighted_average",
    "q86_scd2_apply",
    "q87_not_in_null_semantics",
    "d07_near_dup_clusters",
    "m22_jpeg_quant16",
    "g29_hyperball",
    "q88_observation_metrics",
    "ga20_attach_view_join",
    "m23_bmp32_alpha",
    "t40_fingerprint_decontam",
    "d08_cluster_split",
    "q89_last_touch_attribution",
    # round-7: SemDeDup production shape (fixed k + cap), palette-tRNS
    # PNG, local-color-table GIF; wave 2: linear attribution,
    # conversion-window funnel, retrieval-quality eval, exact Gram matrix
    "s21_semdedup_fixed_k",
    "m24_palette_trns_png",
    "m25_local_palette_gif",
    "q90_linear_attribution",
    "q91_funnel_within_window",
    "s22_retrieval_recall_mrr",
    "s23_gram_matrix",
    "d09_semantic_dedup_corpus",
    "q92_percentile_cont",
    "m26_jpeg_restart_markers",
    "g30_greedy_coloring",
    "s24_random_projection",
    "m27_palette4_png",
    "q93_capped_sessionization",
    "m28_tiff_strips",
    "g31_minimum_spanning_forest",
    "m29_jpeg_progressive",
    "g32_weighted_spanning_forest",
    "d10_single_linkage_clusters",
    "m30_tiff_packbits",
    "m31_tiff_lzw",
    "m32_progressive_color_jpeg",
    "m33_quad_wav",
    "g33_adamic_adar",
    "q94_running_distinct",
    "g34_katz_centrality",
    "q96_time_decay_attribution",
    "q95_rfm_segmentation",
    "q97_clamped_balance",
    "q98_mad_outliers",
    "q99_weighted_median",
    "q100_winsorize",
    "t41_url_canonical_dedup",
    "s25_sq8_rerank_topk",
    "t42_greedy_pack_bins",
    "q102_kll_quantile_rollup",
]

# Fixed CANARY lane (round 7): ~20 entries spanning every surface
# family, benched median-of-5 EVERY round with an identical recipe,
# REGARDLESS of how the headline set rotates — this is the
# round-over-round comparability anchor the r6 verdict flagged as
# missing (the r5→r6 headline rotation left only 3 comparable entries,
# and reps=1 full-sweep noise could not adjudicate regressions like
# m11's 9.4x full-sweep anomaly).  Do not rotate this list; append
# only.  m11 is here precisely to adjudicate that anomaly under clean
# median-of-5 conditions.
CANARY_QUERIES = [
    "q01_pricing_summary",      # scan + agg
    "q05_revenue_by_nation",    # multi-join star
    "q14_window_rownum",        # window
    "q39_returned_items",       # TPC-H Q10 shape
    "q43_volume_shipping",      # TPC-H Q7 shape
    "q80_kmv_distinct_rollup",  # sketch rollup
    "g02_degrees",              # graph offsets fast path
    "g05_two_hop",              # graph join
    "g07_bfs_length",           # iterative graph
    "g09_pagerank",             # iterative graph, weighted
    "g14_kcore",                # peeling
    "ga02_read_edges",          # GraphAr reader
    "ga03_edges_point_lookup",  # GraphAr CSR seek
    "t04_exact_dedup",          # hash dedup
    "t06_minhash_clusters",     # LSH + CC pipeline
    "d02_simhash_pairs",        # blocking + verify + exact baseline
    "s01_topk_cosine",          # brute-force ANN
    "s19_hamming_rerank_topk",  # two-stage retrieval
    "m07_jpeg_roundtrip",       # heavy Python codec
    "m11_thumbnail_downsample", # the r6 full-sweep anomaly
    "st03_session_window",      # streaming batch twin
]

# Streaming lane (round 6): every st entry runs its real micro-batch
# pipeline to completion inside the registry callable (memory sink,
# run_to_memory blocks), so wall-clock over the CALL measures source
# staging + state management + sink — the lane a watermark-eviction or
# state-store regression would show up in (previously these 14 entries
# had value oracles but zero timing history).  Kept out of the headline
# total so round-over-round comparisons of `value` stay apples-to-apples;
# reported under "streaming"/"streaming_total".
ST_QUERIES = [
    "st01_stream_tumbling",
    "st02_stream_dedup",
    "st03_session_window",
    "st04_sliding_window",
    "st05_stateful_totals",
    "st06_stream_static_join",
    "st07_stream_stream_join",
    "st08_foreach_batch_sink",
    "st09_chained_windows",
    "st10_trending_topk",
    "st11_stream_static_join",
    "st12_stream_hll_distinct",
    "st13_stream_outer_join",
    "st14_streaming_ohlc",
    "st15_stream_full_join",
    "st16_streaming_kmv_distinct",
    "st17_streaming_cms",
    "st18_stream_semi_join",
    "st19_streaming_capped_sessions",
    "st20_stream_anti_join",
    "st21_stream_anti_join_horizon",
    "st22_streaming_funnel",
    "st23_streaming_funnel_window",
    "st24_stream_scd2_enrich",
    "st25_streaming_last_touch",
    "st26_streaming_clamped_balance",
    "st27_streaming_running_distinct",
    "st28_streaming_time_decay",
    "st29_stream_scd2_enrich_left",
    "st30_streaming_twap",
    "st31_streaming_kll_quantile",
]

# Interleaved-control normalization (round 11): two consecutive rounds
# (r9 ga02/ga20, r10 st07-st13 + canary) needed HAND-BUILT contention
# adjudications because this box shows sustained external load that
# inflates absolute timings 1.3-8x.  `--normalize` (or
# SPARK_GRAFT_BENCH_NORMALIZE=1) makes that method a native mode: one
# control entry (round-robin over the three below - scan+agg, graph
# offsets, window, all plan-stable since round 1) runs immediately
# before EVERY timed rep in every lane; each control's MINIMUM across
# the whole run is its contention-free floor, the adjacent control's
# inflation factor (ctrl/floor) deflates the rep it precedes, and the
# reported *_norm value is the median of deflated reps.  Raw medians
# stay untouched - normalization ADDS columns, never replaces them.
CONTROL_QUERIES = [
    "q01_pricing_summary",
    "g02_degrees",
    "q14_window_rownum",
]

# Python-worker control (round 12): the r11 s10 adjudication conceded
# that all three controls above are JVM-side, so pandas-UDF lanes (the
# PQ family, codecs) were being discounted by the wrong meter —
# Python-worker contention (fork/exec pressure, GIL-bound pickling,
# CPU stolen from the arrow pipe) moves independently of JVM task
# contention.  This control is a fixed 100k-row arrow-batched
# mapInPandas identity + sum: big enough to exercise worker spawn +
# arrow transfer, small enough (<0.5 s idle) to interleave everywhere.
PY_CONTROL = "py00_map_in_pandas"

# plan markers that put a query on the Python-worker path; such lanes
# are deflated by PY_CONTROL's inflation factor instead of the JVM
# control's
_PY_PLAN_MARKERS = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInArrow",
    "PythonMapInArrow",
    "PythonUDTF",
)


def uses_python_workers(df) -> bool:
    """True when the query's plan crosses into Python workers (pandas
    UDF / mapInPandas / UDTF).  The analyzed logical plan is checked
    first (cheap); scalar pandas UDFs only materialize as
    ArrowEvalPython/BatchEvalPython nodes in the PHYSICAL plan, so fall
    back to sparkPlan (planning only, no execution)."""
    try:
        txt = df._jdf.queryExecution().analyzed().toString()
        if any(m in txt for m in _PY_PLAN_MARKERS):
            return True
        txt = df._jdf.queryExecution().sparkPlan().toString()
    except Exception:
        return False
    return any(m in txt for m in _PY_PLAN_MARKERS)


_ST_PY_FNS: set[str] | None = None


def st_uses_python_workers(entry_fn) -> bool:
    """Streaming-entry classifier: the entry executes the stream inside
    the call, so the returned memory-sink frame shows no Python nodes.
    Instead, collect the streaming-ops functions whose source crosses
    into Python workers (applyInPandasWithState / mapInPandas /
    transformWithState) once, then check whether the entry's source
    calls one of them."""
    global _ST_PY_FNS
    import inspect

    if _ST_PY_FNS is None:
        from duckdb_graphar_spark.streaming import ops as _ops

        fns: set[str] = set()
        for fname in dir(_ops):
            fn = getattr(_ops, fname)
            if callable(fn) and getattr(fn, "__module__", "") == _ops.__name__:
                try:
                    src = inspect.getsource(fn)
                except (OSError, TypeError):
                    continue
                if any(
                    m in src
                    for m in (
                        "applyInPandasWithState",
                        "mapInPandas",
                        "transformWithState",
                        "pandas_udf",
                    )
                ):
                    fns.add(fname)
        _ST_PY_FNS = fns
    # registry entries are generic closures (__spark_entry__._q.wrapped)
    # whose own source never names the ops function — unwrap to the
    # decorated entry via the closure cells first
    fns = [entry_fn]
    for cell in getattr(entry_fn, "__closure__", None) or ():
        try:
            v = cell.cell_contents
        except ValueError:
            continue
        if callable(v):
            fns.append(v)
    for fn in fns:
        try:
            entry_src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        if any(f in entry_src for f in _ST_PY_FNS):
            return True
    return False


class _ControlNormalizer:
    """Paired control sampler + end-of-run deflation (see the
    CONTROL_QUERIES / PY_CONTROL comments).  Every sample runs ONE JVM
    control (round-robin over the three) AND the Python-worker control;
    floors are only known once the whole run finishes, so lanes store
    (rep_seconds, ((jvm_ctrl, s), (py_ctrl, s))) pairs and `normalize`
    post-processes them, picking the like-for-like meter per query."""

    def __init__(self, spark, qs, sf_dir: str) -> None:
        self._spark, self._qs, self._sf = spark, qs, sf_dir
        self._i = 0
        self.obs: list[tuple[str, float]] = []
        for c in CONTROL_QUERIES:  # one untimed warm rep each
            qs[c](spark, sf_dir).write.mode("overwrite").format("noop").save()
        self._py_df = self._build_py_control(spark)
        self._py_df.write.mode("overwrite").format("noop").save()  # warm

    @staticmethod
    def _build_py_control(spark):
        from pyspark.sql import functions as F

        def _ident(it):
            for pdf in it:
                yield pdf

        return (
            spark.range(0, 100_000, 1, 8)
            .select("id", (F.col("id") % 97).alias("v"))
            .mapInPandas(_ident, "id long, v long")
            .groupBy()
            .agg(F.sum("v").alias("s"))
        )

    def _run_control(self, name: str) -> tuple[str, float]:
        self._spark.sparkContext.setJobDescription(f"control: {name}")
        t0 = time.time()
        if name == PY_CONTROL:
            self._py_df.write.mode("overwrite").format("noop").save()
        else:
            self._qs[name](self._spark, self._sf).write.mode(
                "overwrite"
            ).format("noop").save()
        dt = time.time() - t0
        self.obs.append((name, dt))
        return (name, dt)

    def sample(self) -> tuple[tuple[str, float], tuple[str, float]]:
        jvm = self._run_control(CONTROL_QUERIES[self._i % len(CONTROL_QUERIES)])
        self._i += 1
        py = self._run_control(PY_CONTROL)
        return (jvm, py)

    def floors(self) -> dict[str, float]:
        f: dict[str, float] = {}
        for name, dt in self.obs:
            f[name] = min(f.get(name, dt), dt)
        return f

    def factor_median(self, *, python: bool) -> float:
        """Median inflation factor (ctrl/floor) across the run's JVM
        controls (python=False) or Python-worker controls (True)."""
        fl = self.floors()
        vals = sorted(
            ct / fl[cn]
            for cn, ct in self.obs
            if (cn == PY_CONTROL) == python
        )
        return round(vals[len(vals) // 2], 3) if vals else 1.0

    def normalize(
        self,
        raw: dict[str, list[tuple[float, tuple]]],
        py_lanes: set[str] | None = None,
    ) -> dict[str, float]:
        fl = self.floors()
        py_lanes = py_lanes or set()
        out: dict[str, float] = {}
        for name, reps in raw.items():
            vals = []
            for q, ctrl in reps:
                # backward compat: ctrl is either a single (name, s)
                # pair (pre-r12 artifacts) or the ((jvm), (py)) pair
                if isinstance(ctrl[0], tuple):
                    cn, ct = ctrl[1] if name in py_lanes else ctrl[0]
                else:
                    cn, ct = ctrl
                vals.append(q * (fl[cn] / ct))
            vals.sort()
            out[name] = round(vals[len(vals) // 2], 3)
        return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("bench")
    qs = E.queries()

    # warm the file cache + JVM before timing (baseline numbers are
    # steady-state averages, docs/benchmarks.md)
    qs["q00_scan_region"](spark, sf_dir).count()
    # pre-build the GraphAr layout so ga* timings measure reads, not writes
    E._orders_graphar(spark, sf_dir)

    normalize = ("--normalize" in sys.argv[1:]) or os.environ.get(
        "SPARK_GRAFT_BENCH_NORMALIZE", "0"
    ) not in ("0", "", "false")
    norm = _ControlNormalizer(spark, qs, sf_dir) if normalize else None
    canary_raw: dict[str, list] = {}
    results_raw: dict[str, list] = {}
    st_raw: dict[str, list] = {}
    py_flags: dict[str, bool] = {}

    # median-of-5: this box shows sporadic host-level CPU contention
    # (identical plans swing 3×) — a wider median absorbs a stalled rep.
    # Each query additionally gets ONE untimed warm rep (codegen compile +
    # shuffle-file warmup), so even a low-rep invocation (driver runs used
    # n=2 in round 2 and showed a 2.7× phantom q01 regression) can't put a
    # cold/contended rep into the reported number; `queries_min` records
    # the per-query minimum — the contention-free floor — alongside the
    # median.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    # canary lane FIRST (right after warmup, before the long sweep heats
    # the machine) and ALWAYS median-of-5 — its whole point is clean
    # round-over-round comparability, so it ignores the reps override
    # the driver may pass for the big sweep.
    canary_reps = int(os.environ.get("SPARK_GRAFT_CANARY_REPS", "5"))
    canary: dict[str, float] = {}
    canary_min: dict[str, float] = {}
    for name in CANARY_QUERIES:
        print(f"[bench:canary] {name}", file=sys.stderr, flush=True)
        # label jobs (guide §1.5) so event logs / status API attribute
        # work per query even with the UI disabled
        spark.sparkContext.setJobDescription(f"canary: {name}")
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        if norm:
            py_flags[name] = uses_python_workers(qs[name](spark, sf_dir))
        times = []
        for _ in range(canary_reps):
            ctrl = norm.sample() if norm else None
            spark.sparkContext.setJobDescription(f"canary: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            times.append(dt)
            if norm:
                canary_raw.setdefault(name, []).append((dt, ctrl))
        times.sort()
        canary[name] = round(times[len(times) // 2], 3)
        canary_min[name] = round(times[0], 3)

    results: dict[str, float] = {}
    results_min: dict[str, float] = {}
    for name in BENCH_QUERIES:
        print(f"[bench] {name}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(f"bench: {name}")
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        if norm and name not in py_flags:
            py_flags[name] = uses_python_workers(qs[name](spark, sf_dir))
        times = []
        for _ in range(reps):
            ctrl = norm.sample() if norm else None
            spark.sparkContext.setJobDescription(f"bench: {name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            times.append(dt)
            if norm:
                results_raw.setdefault(name, []).append((dt, ctrl))
        times.sort()
        results[name] = round(times[len(times) // 2], 3)
        results_min[name] = round(times[0], 3)

    # streaming lane: the work happens inside the call (run_to_memory
    # drives the stream to completion), so time the call itself; one
    # untimed warm rep covers source staging + codegen like the batch lane
    st_reps = int(os.environ.get("SPARK_GRAFT_BENCH_ST_REPS", "3"))
    st_results: dict[str, float] = {}
    st_results_min: dict[str, float] = {}
    for name in ST_QUERIES:
        print(f"[bench:st] {name}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(f"bench:st {name}")
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        if norm and name not in py_flags:
            # a streaming entry RUNS inside the call and returns a
            # memory-sink batch frame (no Python nodes visible), so
            # classify from the entry's source instead
            py_flags[name] = st_uses_python_workers(qs[name])
        times = []
        for _ in range(st_reps):
            ctrl = norm.sample() if norm else None
            spark.sparkContext.setJobDescription(f"bench:st {name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            times.append(dt)
            if norm:
                st_raw.setdefault(name, []).append((dt, ctrl))
        times.sort()
        st_results[name] = round(times[len(times) // 2], 3)
        st_results_min[name] = round(times[0], 3)

    total = round(sum(results.values()), 3)
    norm_cols: dict = {}
    if norm:
        py_lanes = {n for n, v in py_flags.items() if v}
        queries_norm = norm.normalize(results_raw, py_lanes)
        norm_cols = {
            "normalized": True,
            "queries_norm": queries_norm,
            "canary_norm": norm.normalize(canary_raw, py_lanes),
            "streaming_norm": norm.normalize(st_raw, py_lanes),
            "control_floors": {
                k: round(v, 3) for k, v in norm.floors().items()
            },
            "control_obs": len(norm.obs),
            # JVM-control inflation median (comparable to r11 artifacts)
            "contention_factor_median": norm.factor_median(python=False),
            # Python-worker-control inflation median (NEW r12): the
            # like-for-like meter for pandas-UDF lanes
            "py_control": PY_CONTROL,
            "py_contention_factor_median": norm.factor_median(python=True),
            "py_lanes": sorted(py_lanes),
            "queries_norm_total": round(sum(queries_norm.values()), 3),
        }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": results,
                "queries_min": results_min,
                "canary": canary,
                "canary_min": canary_min,
                "canary_reps": canary_reps,
                "streaming": st_results,
                "streaming_min": st_results_min,
                "streaming_total": round(sum(st_results.values()), 3),
                "sf": sf,
                **norm_cols,
            }
        ),
        flush=True,
    )
    # Compact summary as the FINAL stdout line: the driver captures a
    # bounded tail of stdout, and the full record above (per-query
    # medians + minima for ~120 entries) can exceed it — r06/r07 landed
    # as `parsed: null`.  This line is self-sufficient (metric, value,
    # unit, sf, slowest-5 queries, canary/streaming totals) and always
    # fits whatever tail the driver keeps.
    slowest5 = dict(
        sorted(results.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(results),
                "queries": slowest5,
                "queries_note": "slowest 5 of the full sweep (full record on the previous stdout line)",
                "canary_total": round(sum(canary.values()), 3),
                "n_canary": len(canary),
                "streaming_total": round(sum(st_results.values()), 3),
                "n_streaming": len(st_results),
                **(
                    {
                        "normalized": True,
                        "queries_norm_total": norm_cols["queries_norm_total"],
                        "contention_factor_median": norm_cols[
                            "contention_factor_median"
                        ],
                        "py_contention_factor_median": norm_cols[
                            "py_contention_factor_median"
                        ],
                    }
                    if norm
                    else {}
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
