"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

Headline set:
* flagship — the full span-extraction pipeline (parse + boilerplate
  strip + 17-parameter extraction) over a deterministic synthetic
  corpus sized to the scale factor (the engine's real workload), plus
* representative relational/dedup/similarity queries from
  __spark_entry__ over the driver tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# corpus size scales with the scale factor (sf0.1 → 24000 docs; the
# round-1 8k corpus finished in ~5s at 32 cores — too small to
# amortize per-job overhead into a meaningful docs/s)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1] or "0.1")
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(max(400, int(240_000 * _SF)))))
CORPUS = f"/tmp/spark_graft_bench_corpus_{N_DOCS}.parquet"


def ensure_corpus() -> str:
    from crego_document_extractor_spark import corpus
    if not os.path.exists(CORPUS):
        corpus.write_corpus(CORPUS, N_DOCS, seed=42, big_doc_every=97)
    return CORPUS


def wait_for_quiet(thresh: float, budget_sec: float) -> float:
    """Shared-host load gate (r4 VERDICT #1): if the 1-min loadavg is
    above `thresh` when the bench starts, poll (bounded by
    `budget_sec`) for it to drop BEFORE starting Spark — the old
    behavior ran FEWER flagship samples under load, exactly when
    variance is highest, and recorded a phantom 70% regression in
    BENCH_r04.json.  Returns seconds actually waited."""
    t0 = time.monotonic()
    while (os.getloadavg()[0] >= thresh
           and time.monotonic() - t0 < budget_sec):
        time.sleep(5)
    return round(time.monotonic() - t0, 1)


def main() -> None:
    global LOAD0
    quiet_thresh = float(os.environ.get("SPARK_GRAFT_QUIET_THRESH", "3"))
    waited = wait_for_quiet(
        quiet_thresh, float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "300")))
    LOAD0 = list(os.getloadavg())
    from crego_document_extractor_spark.session import get_spark
    from crego_document_extractor_spark import pipeline
    import __spark_entry__ as entrymod

    from crego_document_extractor_spark.parse import parse_documents

    path = ensure_corpus()
    spark = get_spark(master=f"local[{CPUS}]")
    timings: dict[str, float] = {}
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # warm-run methodology (same as scripts/bench_scaling.py): pin the
    # raw input, warm JVM/JIT + Arrow python workers on a small slice,
    # then take the best of `runs` timed executions — first-run JIT and
    # python-worker startup otherwise dominate and round-over-round
    # comparisons are noise.
    docs_df = (pipeline.ensure_parallelism(spark.read.parquet(path),
                                           min_partitions=CPUS * 4).persist())
    docs_df.count()
    pipeline.extract_from_raw(docs_df.limit(64), n_docs=N_DOCS).count()

    all_runs: dict[str, list[float]] = {}

    def timed(name, fn, n_runs=None):
        fn()  # warm
        best = float("inf")
        walls = []
        for _ in range(n_runs or runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
            best = min(best, walls[-1])
        timings[name] = round(best, 3)
        all_runs[name] = walls

    n_extracted = {}

    # the flagship is the scaling-bench job: one lineage, parse →
    # extract → results count (clean_spans timed separately below)
    def flagship():
        # extract_from_raw: fused parse+retrieval Python stage for the
        # udf engine (one Arrow round-trip), plain parse for sql
        n_extracted["rows"] = pipeline.extract_from_raw(docs_df, n_docs=N_DOCS).count()

    def spans_pass():
        n_extracted["spans"] = pipeline.clean_spans(
            parse_documents(docs_df)).count()

    def flagship_relational():
        from crego_document_extractor_spark.extract.crif import extract_all
        extract_all(parse_documents(docs_df), engine="sql").count()

    # ≥5 runs for the single headline number, and MORE (7) — never
    # fewer — when the host is still loaded after the quiet wait:
    # under noise, extra samples are what lets min() find the clean
    # wall (3 runs under load recorded a phantom 70% regression in
    # r4).  Gate on the PRE-WARMUP load (LOAD0): by this point our
    # own warm-up has pushed the 1-min average over any threshold.
    flagship_runs = 5 if LOAD0[0] < quiet_thresh else max(7, runs)
    timed("flagship_extraction", flagship, n_runs=flagship_runs)
    timed("clean_spans_pass", spans_pass)
    # the pure-JVM relational engine, timed alongside (informational —
    # not part of the headline total; see BENCH/BASELINE.md engine A/B)
    timed("x_relational_engine_info", flagship_relational)
    relational_sec = timings.pop("x_relational_engine_info")

    qs = entrymod.queries()
    for name in ("q_j1_broadcast_dim_join", "q_t1_topk_per_group",
                 "q_a2_threshold_counts", "q_j2_cosine_topk",
                 "q_p3_segmentation", "q_dedup_exact",
                 "q_minhash_bands", "q_text_quality"):
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(N_DOCS / timings["flagship_extraction"], 2)
    from crego_document_extractor_spark.extract.crif import default_engine
    fastest_sec = min(timings["flagship_extraction"], relational_sec)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF,
        "bench_docs": N_DOCS,
        "extraction_docs_per_sec": docs_per_sec,
        "relational_engine_sec": relational_sec,
        # both engines are always timed; the headline uses the SHIPPED
        # default (A/B winner at the 160k design point) and the JSON
        # records which engine was actually faster at THIS corpus size
        # (ENGINE_AB.md; the r3 ~100k crossover where the relational
        # plan won small corpora shifted below 24k with the r4
        # semantics — udf won or tied at every size measured in r4)
        "engine_default": default_engine(N_DOCS),
        "fastest_engine": ("default" if fastest_sec ==
                           timings["flagship_extraction"] else "sql"),
        "fastest_extraction_docs_per_sec": round(N_DOCS / fastest_sec, 2),
        # median alongside min: a polluted min is impossible, a
        # polluted median reveals residual load — together they bound
        # the true wall from both sides
        "flagship_median": round(sorted(
            all_runs["flagship_extraction"])[
                len(all_runs["flagship_extraction"]) // 2], 3),
        "flagship_n_runs": flagship_runs,
        "waited_for_quiet_sec": waited,
        "parallelism": CPUS,
        # shared-host diagnostics: this machine sees external tenant
        # load (loadavg spikes with zero in-container CPU) that can
        # inflate any wall time several-fold.  Per-run walls + the
        # load average bracket make a polluted sample self-evident —
        # see BENCH/BASELINE.md for the harness-reconciliation note.
        "run_walls": all_runs,
        "loadavg_start": LOAD0,
        "loadavg_end": list(os.getloadavg()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
