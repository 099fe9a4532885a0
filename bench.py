"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is materialized with the noop sink (full execution, no driver
collect cost). The WOD conversion job (the reference's actual workload —
largest bundled fixture, 9,390 casts / 68,915 lines) is benched alongside
the relational/LLM-ops headliners.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

#: Headline queries (registry names) — one per operator family.
HEADLINERS = [
    "flagship_regional_revenue",   # 5-way join + agg + sort
    "agg_group_sum_avg",           # TPC-H Q1 shape
    "agg_count_distinct",
    "join_inner_equi",
    "join_asof",
    "window_multi",                # one shuffle, 3 window funcs
    "window_topk_per_group",
    "topk_limit",
    "stream_tumbling_counts",
    "stream_session_window",
    "q7_nation_volume",            # 6-way join, dim self-joined twice
    "q18_large_orders",            # aggregate-then-filter + top-k
    "dedup_exact",
    "dedup_minhash_lsh",           # LSH signature + band join + verify
    # dedup_simhash (32-bit arm) de-headlined round 7: it is explicitly
    # pedagogical (wide pigeonhole segments → large candidate volume);
    # the production Manku shape below is the one worth tracking.
    "dedup_simhash64",             # HEADLINE simhash: Manku 64-bit/d<=3 (round 3)
    "similarity_topk",
    "similarity_knn_join",
    "similarity_ann_ivf",          # oracled IVF ANN (round 2)
    "similarity_ann_ivf_join",     # large-batch ANN join tier (round 5)
    "similarity_pq_adc",           # PQ code search, FAISS ADC shape (round 5)
    "similarity_ann_ivf_adc",      # IVFADC: cells + codes combined (round 6)
    "similarity_ann_ivf_adc_refined",  # + FAISS refine stage (round 12)
    "curation_domain_mix",         # target-mixture resampling (round 6)
    "join_asof_bucketed",          # equi-join-only as-of plan (round 2)
    "curation_pack_sequences",     # sharded context-window packing (round 2)
    "curation_decontaminate",      # 13-gram eval-overlap filter (round 5)
    "text_quality",
    "json_funcs",
    "q5_local_supplier",           # Q5 proper: local-supplier 6-way join (round 6)
    "q21_waiting_supplier",        # exists + not-exists fact self-joins (round 6)
    "graph_pagerank",              # 3-iteration fixed-point PageRank (round 6)
    "dedup_segments_c4",           # segment dedup + doc reconstruction (round 6)
    "join_range_bucketed",         # interval join via time buckets (round 6)
    "rag_chunk_documents",         # map-only overlapping chunking (round 6)
    "curation_pipeline_stats",     # composed 4-stage curation pipeline (round 6)
    "events_resample_gapfill",     # dense-grid resample + locf (round 6)
    "dedup_semdedup_prune",        # SemDeDup keep-one decision (round 6 s2)
    "dedup_incremental_exact",     # cross-snapshot hash-index ingest (round 6 s2)
    "json_variant_extract",        # VARIANT parse-once + typed gets (round 6 s2)
    "multimodal_decode_arrow",     # mapInArrow blob kernel (round 6 s2)
    "multimodal_decode_wav",       # REAL stdlib-wave decode via mapInPandas (round 14)
    "text_bpe_train",              # distributed Sennrich BPE merge loop (round 14)
    "text_bpe_train_batched",      # top-K-disjoint batched merge rounds (round 15)
    "text_bpe_encode_external",    # frozen-tokenizer held-out encode (round 15)
]


from contextlib import contextmanager


@contextmanager
def _blas_threads(n: int | None):
    """Temporarily pin the loaded OpenBLAS to ``n`` threads (no-op when
    ``n`` is None or the library can't be found). Round-15 measurement
    fix: numpy's "single-threaded" matmul actually fans out to ALL cores
    via OpenBLAS (32 threads here), so the legacy probes measured idle
    multi-core capacity, not a fixed workload — the same matmul read
    0.006 s on an idle host and 0.302 s under ambient load, a 50× swing
    that made probe normalization meaningless. Scoped via ctypes to the
    probe only (an env-var pin would leak into executor numpy kernels)."""
    if n is None:
        yield
        return
    import ctypes
    import glob

    import numpy as np

    lib = None
    try:
        root = os.path.dirname(os.path.dirname(np.__file__))
        for pat in ("numpy.libs/*openblas*", "numpy/.libs/*openblas*"):
            hits = glob.glob(os.path.join(root, pat))
            if hits:
                lib = ctypes.CDLL(hits[0])
                break
    except OSError:
        lib = None
    setter = getter = None
    if lib is not None:
        for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
            if hasattr(lib, sym):
                setter = getattr(lib, sym)
                getter = getattr(lib, sym.replace("set", "get"))
                break
    if setter is None:
        yield
        return
    n0 = getter()
    setter(n)
    try:
        yield
    finally:
        setter(n0)


def _cpu_probe(pin: bool = False) -> float:
    """Seconds for a fixed numpy matmul workload (min of 3) — a
    calibration anchor for cross-round comparisons: this host's available
    CPU swings between runs, so a query-time ratio between rounds only
    means something relative to the probe ratio.

    ``pin=True`` (round 15) pins BLAS to ONE thread so the probe is a
    true single-core measure; the default (legacy) lets OpenBLAS fan out
    and is kept as THIS round's primary so the ratio against r14's
    recorded probes compares like with like — from r16 on, the pinned
    series (present in both rounds' files) takes over (_previous_round
    prefers it)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1200, 1200))
    runs = []
    with _blas_threads(1 if pin else None):
        for _ in range(3):
            t0 = time.perf_counter()
            (a @ a).sum()
            runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def _cpu_probe_parallel(n_threads: int = 16, pin: bool = False) -> float:
    """Seconds for the same workload run on ``n_threads`` CONCURRENT
    threads (numpy releases the GIL; min of 3 rounds). The single-thread
    probe cannot see MULTI-core contention — round 6's driver run showed
    every query uniformly ~11% slower at an EQUAL single-thread probe,
    which re-measurement on an idle host traced to other processes eating
    cores during the driver's run (32-thread query stages slow down, a
    1-core probe doesn't). The parallel/serial probe ratio exposes exactly
    that: ~= serial on an idle host, inflated when cores are contended.

    ``pin=True``: BLAS pinned to 1 thread per call, so this is a clean
    16-way concurrency measure instead of 16×32-thread oversubscription
    (see _cpu_probe)."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    mats = [
        np.random.default_rng(i).standard_normal((1200, 1200))
        for i in range(n_threads)
    ]
    runs = []
    with _blas_threads(1 if pin else None):
        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            for _ in range(3):
                t0 = time.perf_counter()
                list(pool.map(lambda a: (a @ a).sum(), mats))
                runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    t_session = time.perf_counter()
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    queries = load_all_operators()
    session_sec = time.perf_counter() - t_session

    # Warm up the JVM (codegen, parquet reader, shuffle machinery) with one
    # untimed pass of the flagship so per-query timings measure the
    # steady-state plan, not first-query initialization.
    queries["flagship_regional_revenue"].fn(spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query runs four times: the first pass pays one-time codegen/JIT
    # for its generated operators; the steady-state number is the MIN of
    # three further runs (min is the noise-robust estimator — ambient load
    # only ever inflates a run, never deflates it, and this host's
    # available CPU swings ±70% between back-to-back identical runs).
    # `value` sums the steady-state minima.
    # Probe the host's available CPU BEFORE the query loop as well as
    # after (below): ambient co-tenant load on this host arrives and
    # leaves WITHIN a single bench run (measured r13: load-avg 0.16 at
    # start, 9.25 six minutes later — the end-of-run probe read 0.238,
    # the fastest ever recorded, while queries mid-run were inflated
    # ~25%). A single-instant probe cannot represent a fluctuating
    # window; recording the WORSE of start/end probes makes the
    # normalization conservative instead of optimistic.
    probe_before, par_probe_before = _cpu_probe(), _cpu_probe_parallel()
    pinned_before = (_cpu_probe(pin=True), _cpu_probe_parallel(pin=True))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINERS:
        q = queries[name]
        # Clear BEFORE the cold run too: the previous query's last steady
        # run leaves its persist()ed frames live, and CacheManager's
        # plan-fragment matching would let them assist this query's cold
        # number (e.g. sibling minhash arms sharing the shingle frame).
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        steady = []
        for _ in range(3):
            # A few operators persist() intermediates (pagerank's edge
            # list, minhash shingles, corpus vocabulary) and Spark's
            # CacheManager matches by LOGICAL PLAN — so without this,
            # runs 2-4 of those queries would read run 1's cache and
            # time a cached scan instead of the pipeline. Clearing
            # between measured runs keeps every run the full pipeline.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            steady.append(time.perf_counter() - t0)
        timings[name] = round(min(steady), 3)
    spark.catalog.clearCache()

    # WOD conversion throughput (the reference's core workload) — same
    # protocol as the headliners above: one cold run (recorded in
    # cold_runs detail) + min of three steady runs, each into a fresh
    # output dir. The previous min-of-2 never reached steady state: the
    # partitioned-writer path (1,652 parquet file creations) takes ~4
    # runs of JVM JIT before its per-file cost bottoms out (measured
    # 8.2 -> 4.5 s over runs 1-5 warm, tools/exp_convert_stages.py), so
    # min-of-2 reported mid-warmup numbers — the r7 driver-vs-warm gap
    # (5.82 vs 3.24 s) was warmup, not plan cost.
    from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask, convert_file

    def _wod_run() -> float:
        out = tempfile.mkdtemp(prefix="bench_wod_")
        try:
            task = FileTask(
                "XBT",
                "OBS",
                "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz",
                out,
                out,
            )
            t0 = time.perf_counter()
            convert_file(spark, task)
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    cold["wod_convert_xbt"] = round(_wod_run(), 3)
    timings["wod_convert_xbt"] = round(min(_wod_run() for _ in range(3)), 3)

    total = round(sum(timings.values()), 3)
    # Self-adjudicating headline (VERDICT r12 #4): the raw `value` total
    # is not round-comparable on its face — the headliner list grows
    # across rounds and the host's available CPU swings up to ~2.7x
    # between driver runs (r12: every unchanged query inflated ~25-30%
    # under ambient load, and the 56.7s-vs-32.4s headline read as a
    # catastrophe that BENCH_DETAIL's bands had to un-explain). Emit in
    # the ONE driver-visible line: the common-subset total (intersection
    # with the previous round's headliners — immune to list growth) and
    # the probe-normalized common total (divided by how much slower this
    # host's fixed CPU probes ran vs the prior round — immune to host
    # weather). A genuine regression moves value_probe_normalized; a
    # loaded host or a new headliner cannot.
    prev, prev_probe, prev_par_probe, prev_pinned = _previous_round()
    probe_after, par_probe_after = _cpu_probe(), _cpu_probe_parallel()
    pinned_after = (_cpu_probe(pin=True), _cpu_probe_parallel(pin=True))
    # worse of (start, end): the load that inflated the queries
    probe_now = max(probe_before, probe_after)
    par_probe_now = max(par_probe_before, par_probe_after)
    pinned_now = (
        max(pinned_before[0], pinned_after[0]),
        max(pinned_before[1], pinned_after[1]),
    )
    common = {n: t for n, t in timings.items() if prev and n in prev}
    # Ratio vs the previous round, SAME probe semantics on both sides:
    # when the previous round recorded BLAS-PINNED probes (r15+), use the
    # pinned series (a true fixed workload — the legacy probes swing 50×
    # with idle core count because OpenBLAS fans the matmul out); against
    # pre-r15 rounds, fall back to the legacy free-threaded probes so the
    # comparison stays like-for-like across the semantics boundary.
    probe_ratio = 1.0
    if prev_pinned and all(prev_pinned) and all(pinned_now):
        probe_ratio = pinned_now[0] / prev_pinned[0]
        probe_ratio = max(probe_ratio, pinned_now[1] / prev_pinned[1])
    else:
        if prev_probe and probe_now:
            probe_ratio = probe_now / prev_probe
        if prev_par_probe and par_probe_now:
            probe_ratio = max(probe_ratio, par_probe_now / prev_par_probe)
        # Legacy-semantics ratios are CLAMPED at 1.0 from below: a
        # free-threaded probe reading FASTER than the prior round proves
        # only that more cores were idle at the probe instants (the same
        # matmul spans 0.005-0.302 s with idle core count) — it cannot
        # license scaling the whole history down (observed: an idle-host
        # run where every query hit its best-ever raw value was flagged
        # "above band" on all 43 because the probe read 5x faster). A
        # SLOWER probe stays meaningful (ambient load slows BLAS and
        # Spark alike), so ratios > 1 pass through — the r12 uniform-
        # inflation case keeps its normalization. Pinned-series ratios
        # (r15+ on both sides) are a real fixed workload and are never
        # clamped.
        probe_ratio = max(probe_ratio, 1.0)
    # The ONE printed line stays compact: the driver captures only the last
    # ~2,000 chars of stdout, and round 3's line (with cold_runs +
    # previous_round + regressions inlined) overflowed that and left
    # BENCH_r03.json unparseable. Everything beyond the essentials goes to
    # BENCH_DETAIL.json next to this script instead.
    out_doc = {
        "metric": "headline_queries_total",
        "value": total,
        "value_common_subset": round(sum(common.values()), 3),
        "value_probe_normalized": round(sum(common.values()) / probe_ratio, 3),
        "common_n": len(common),
        "probe_ratio_vs_prev": round(probe_ratio, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "cpu_probe_sec": probe_now,
        "cpu_probe_par_sec": par_probe_now,
        # BLAS-pinned probe series (r15+): a TRUE fixed workload — the
        # legacy pair above lets OpenBLAS fan out to every idle core and
        # so measures idle capacity, not a constant. Kept alongside
        # (never replacing) the legacy keys; future rounds' ratios use
        # this series once both sides have it.
        "cpu_probe_pinned_sec": pinned_now[0],
        "cpu_probe_par_pinned_sec": pinned_now[1],
    }
    detail = dict(
        out_doc,
        cold_runs=cold,
        # start/end probe pairs behind the recorded max — the spread IS
        # the ambient-volatility measurement for the run's window
        cpu_probe_before_sec=probe_before,
        cpu_probe_after_sec=probe_after,
        cpu_probe_par_before_sec=par_probe_before,
        cpu_probe_par_after_sec=par_probe_after,
        # Probe semantics changed at r13 (ADVICE r13): r12-and-earlier
        # recorded a single END-of-run probe; r13+ records
        # max(start, end). The one asymmetric boundary was r12→r13
        # (conservative direction: r13's max could only make r13 look
        # WORSE); from r14 on, prev and now share max-semantics, and
        # cpu_probe_after_sec above is the end-only probe for anyone
        # re-deriving a like-for-like ratio against pre-r13 rounds.
        probe_semantics=(
            "max(start,end) since r13; end-only before — use "
            "cpu_probe_after_sec for cross-boundary comparisons vs "
            "r12-and-earlier. r15 adds the BLAS-PINNED pair "
            "(cpu_probe_pinned_sec / cpu_probe_par_pinned_sec): the "
            "legacy probes let OpenBLAS fan one matmul out to all idle "
            "cores (measured 0.006-0.302 s for the SAME workload), so "
            "they track idle capacity, not a fixed reference; ratios vs "
            "r15+ rounds use the pinned series, ratios vs pre-r15 keep "
            "the legacy series (same semantics on both sides)"
        ),
        cpu_probe_pinned_before=pinned_before,
        cpu_probe_pinned_after=pinned_after,
        session_startup_sec=round(session_sec, 3),
        # Root cause of the r5→r6 "+11% on unchanged queries" drift:
        # re-measured at r6 HEAD on an idle host, the common-27 sum was
        # 28.17 s (r5 driver: 27.96, r6 driver: 31.07) at an EQUAL
        # single-thread probe — the tree did not regress; the r6 driver
        # run ran under multi-core contention a 1-thread probe cannot
        # see. cpu_probe_par_sec (16 concurrent matmuls) now anchors
        # multi-core availability so future cross-round ratios can be
        # normalized against it.
        drift_note_r6=(
            "r6 +11% on unchanged queries was host multi-core contention "
            "during the driver run, not a code regression: common-27 "
            "re-measured 28.17s at r6 HEAD on idle host vs r5's 27.96s, "
            "equal 1-thread probe. See cpu_probe_par_sec."
        ),
        notes_r8={
            "events_resample_gapfill": (
                "r6 0.29->r7 0.35 root-caused as host noise on an "
                "overhead-dominated query: code unchanged since creation "
                "(git -S), probe-normalized ratio 1.07, scaling exponent "
                "0.101 (sf0.1->sf1 wall time flat). A one-fact-scan rework "
                "(persist the hourly agg, derive bounds/types from it) was "
                "measured SLOWER (0.50->0.69s sf0.1, 0.38->0.68s sf1, "
                "tools/exp_gapfill.py): the materialization barrier costs "
                "more than three column-pruned scans; kept the 3-scan "
                "shape, each scan pruned to 1-3 columns."
            ),
            "dedup_minhash_lsh": (
                "shingle double-compute (SCALE.md r7 note) fixed by "
                "replacing the repartition barrier with persist() on the "
                "(doc_id, sh, sig) frame: per-branch pruning can no longer "
                "split the barrier. Measured 2.1->1.8s sf0.1, 6.2->4.7s "
                "sf1 (tools/exp_minhash_persist.py); applied to all three "
                "_lsh_verified_pairs callers."
            ),
            "wod_convert_xbt": (
                "driver-cold 5.82 vs warm 3.24 gap root-caused as JVM JIT "
                "warmup of the partitioned-writer path, not plan cost: "
                "stage-timed warm runs descend 8.2->4.5s over runs 1-5 "
                "(tools/exp_convert_stages.py; at 1.3x-slow probe). Steady "
                "split: decode 0.9s (noop sink), write job ~3.5s (1,652 "
                "file creations - the layout contract), footer 0.4s, plan "
                "build 0.2s. Codec sweep: snappy best (zstd 2x, none "
                "+20%); dictionary-off and page-size knobs within noise; "
                "16 writer tasks re-confirmed vs 24/32 "
                "(tools/exp_convert_write.py, exp_convert_writer_opts.py). "
                "Fix: bench convert segment now matches the headliner "
                "protocol (1 cold + min-of-3 steady) instead of min-of-2, "
                "which always reported mid-warmup numbers."
            ),
            "clearCache_protocol": (
                "r8 adds spark.catalog.clearCache() between steady runs "
                "(advisor item): r7 steady numbers for persist-bearing "
                "queries timed cached scans, and cached subtrees could "
                "assist other queries sharing plan fragments. Honest "
                "isolated A/B (cache cleared, min of 3-4) re-validated "
                "both r8 persist changes ON the honest protocol: pagerank "
                "persist 2.95s vs repartition 5.09s vs none 5.63s sf0.1 "
                "(6.2/16.5/13.8 sf1, tools/exp_pagerank_barrier.py); "
                "minhash LSH persist 1.72 vs repartition 1.87 sf0.1 "
                "(4.4 vs 7.2 sf1, tools/exp_minhash_honest.py). A "
                "clearCache-vs-not A/B on five non-persisting queries "
                "showed the call itself is neutral (+-5%, "
                "tools/exp_clearcache_ab.py). Expect r8 driver numbers "
                "for pagerank/minhash to sit ABOVE r7's cache-assisted "
                "readings while the honest pipeline got faster."
            ),
        },
        notes_r11={
            "text_quality": (
                "r10 driver 0.418s vs band [0.245,0.315] adjudicated as "
                "ambient host load, not a regression (VERDICT r10 #1): "
                "code unchanged since r6 (git -S over operators/text.py), "
                "plan is a map-only projection over documents (no "
                "shuffle, no persist). Idle A/B at probes matching the "
                "r10 driver host (0.017/0.242 vs driver 0.016/0.249, "
                "tools/exp_text_quality_ab.py): isolated fresh-session "
                "min-of-8 = 0.303s, bench-context (full headliner prefix "
                "executed first) min-of-8 = 0.259s - both WITHIN band. "
                "The isolated arm's early steady runs (0.496, 0.365, "
                "0.343 descending to 0.30x) show this 0.3s-scale query "
                "still JIT-warming through bench's min-of-3 window, so "
                "single-round min-of-3 readings can land mid-warmup "
                "under load; the band history (4 rounds) remains the "
                "right adjudicator."
            ),
        },
    )
    detail["jitter_bands"] = _jitter_bands(
        timings,
        out_doc["cpu_probe_sec"],
        out_doc["cpu_probe_par_sec"],
        pinned=pinned_now,
    )
    detail["jitter_summary"] = {
        v: sorted(
            n for n, b in detail["jitter_bands"].items() if b["verdict"] == v
        )
        for v in ("improved", "above_band", "no_history")
    }
    detail["jitter_summary"]["monotone_up"] = sorted(
        n
        for n, b in detail["jitter_bands"].items()
        if b.get("monotone_up")
    )
    if prev:
        detail["previous_round"] = prev
        # Regression gate, PROBE-NORMALIZED: this host's available CPU
        # swings between rounds, so a raw ratio conflates code changes
        # with host weather. Scale the 1.3x threshold by how much slower
        # the fixed probes ran now vs the prior round — a query is only
        # flagged when it slowed MORE than the host did. The ratio takes
        # the WORSE of the serial and parallel probe ratios (two-sided: a
        # faster host tightens the threshold; multi-core contention —
        # the r6 false alarm — is visible only to the parallel probe);
        # computed once above, shared with the one-line output's
        # value_probe_normalized so the two can never disagree.
        ratio = probe_ratio
        detail["probe_ratio_vs_prev"] = round(ratio, 3)
        detail["regressions"] = {
            name: {
                "now": timings[name],
                "was": prev[name],
                "normalized_x": round(
                    timings[name] / (prev[name] * ratio), 2
                ),
            }
            for name in timings
            if name in prev
            and prev[name] > 0
            and timings[name] > 1.3 * prev[name] * ratio
        }
    here = os.path.dirname(os.path.abspath(__file__))
    # Scale-up evidence (tools/bench_scaling.py: each headliner at sf0.1
    # AND the synthesized sf1, with per-query scaling exponents) is run
    # out-of-band — embedding its latest results keeps the per-round
    # BENCH_DETAIL artifact carrying both SFs.
    try:
        with open(os.path.join(here, "SCALING.json")) as fh:
            detail["scaling"] = json.load(fh)
    except (OSError, ValueError):
        pass
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=2)
    print(json.dumps(out_doc))


def _round_history() -> list[dict]:
    """Every parseable BENCH_r*.json as
    ``{round, queries, probe, par_probe}``, oldest first — the raw
    material for jitter bands."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    out = []
    matched = [
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
    ]
    for rnd, path in sorted(matched):
        try:
            with open(path) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue  # a non-object top level must not kill the report
        parsed = doc.get("parsed", doc)
        if isinstance(parsed, dict) and parsed.get("queries"):
            out.append(
                {
                    "round": rnd,
                    "queries": parsed["queries"],
                    "probe": parsed.get("cpu_probe_sec"),
                    "par_probe": parsed.get("cpu_probe_par_sec"),
                    "pinned": (
                        parsed.get("cpu_probe_pinned_sec"),
                        parsed.get("cpu_probe_par_pinned_sec"),
                    ),
                }
            )
    return out


def _jitter_bands(
    timings: dict[str, float],
    probe: float,
    par_probe: float,
    n_rounds: int = 4,
    pinned: tuple[float, float] | None = None,
) -> dict[str, dict]:
    """Per-query self-classifying deltas (VERDICT r9 #6): every verdict
    round burned space re-adjudicating noise because the serial CPU probe
    varies >2x across round hosts. For each headliner, project the last
    ``n_rounds`` recorded readings onto TODAY'S host (scale each by
    ``max(probe_now/probe_then, par_now/par_then)`` — whichever resource
    got scarcer bounds how much slowdown the host alone explains), take
    the min..max of the projections as the jitter band, and classify the
    current reading against it:

    - ``improved``   — below the band by >10%
    - ``within``     — inside the band (+-10% slack): host weather, drop it
    - ``above_band`` — above by >10% even after probe normalization:
                       a real regression candidate, adjudicate
    - ``monotone_up`` — flagged alongside when the normalized series rises
                       every round (the r9 curation_pipeline_stats shape:
                       each step within jitter, the trend not)
    """
    hist = _round_history()[-n_rounds:]
    bands: dict[str, dict] = {}
    for name, now in timings.items():
        series = []
        for h in hist:
            then = h["queries"].get(name)
            if not then:
                continue
            ratio = 1.0
            # same-semantics rule (see probe_semantics): pinned-to-pinned
            # when this history row has the r15+ pinned pair, else legacy
            h_pinned = h.get("pinned") or (None, None)
            if pinned and all(pinned) and all(h_pinned):
                ratio = pinned[0] / h_pinned[0]
                ratio = max(ratio, pinned[1] / h_pinned[1])
            else:
                if probe and h["probe"]:
                    ratio = probe / h["probe"]
                if par_probe and h["par_probe"]:
                    ratio = max(ratio, par_probe / h["par_probe"])
                # legacy-semantics clamp — same rationale as the
                # probe_ratio clamp in main(): a faster free-threaded
                # probe must not project the band downward
                ratio = max(ratio, 1.0)
            series.append(
                {"round": h["round"], "sec": then,
                 "projected": round(then * ratio, 3)}
            )
        if not series:
            bands[name] = {"now": now, "verdict": "no_history"}
            continue
        lo = min(p["projected"] for p in series)
        hi = max(p["projected"] for p in series)
        if now < 0.9 * lo:
            verdict = "improved"
        elif now <= 1.1 * hi:
            verdict = "within"
        else:
            verdict = "above_band"
        norm = [p["projected"] for p in series] + [now]
        bands[name] = {
            "now": now,
            "band_projected": [round(lo, 3), round(hi, 3)],
            "verdict": verdict,
            "monotone_up": len(norm) >= 3
            and all(a < b for a, b in zip(norm, norm[1:])),
            "history": series,
        }
    return bands


def _previous_round() -> tuple[
    dict[str, float] | None,
    float | None,
    float | None,
    tuple[float | None, float | None] | None,
]:
    """(per-query timings, cpu_probe_sec, cpu_probe_par_sec,
    (pinned, par_pinned)) of the latest parseable BENCH_r*.json — the
    last _round_history() entry, so the two consumers can never
    desynchronize on file shape."""
    hist = _round_history()
    if not hist:
        return None, None, None, None
    last = hist[-1]
    return last["queries"], last["probe"], last["par_probe"], last["pinned"]


if __name__ == "__main__":
    sys.exit(main())
