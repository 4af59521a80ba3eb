"""Kill/rerun idempotency via the lineage manifest anti-join
(north_rule: per-partition checkpointed lineage + metrics; the Spark
form of the reference's parse cache, cache.py:36-125)."""

from crego_document_extractor_spark import lineage, pipeline


def _collect(df):
    return sorted(tuple(r) for r in
                  df.select("doc_id", "param_id", "value_num", "value_bool",
                            "value_str", "source", "confidence", "status")
                  .collect())


def test_interrupted_run_resumes_idempotently(spark, docs_path, tmp_path):
    docs = pipeline.load_documents(spark, docs_path)
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "partial")
    n_buckets = 16

    # uninterrupted run
    m1 = lineage.run_with_lineage(docs, full_dir, n_buckets)
    assert m1["attempt"] == 1
    full = _collect(lineage.read_results(spark, full_dir))
    assert full

    # simulate a run killed after finishing only buckets 0..5
    m2 = lineage.run_with_lineage(docs, part_dir, n_buckets,
                                  buckets_subset=list(range(6)))
    assert m2["buckets_processed"] <= 6
    partial = _collect(lineage.read_results(spark, part_dir))
    assert len(partial) < len(full)

    # resume: only pending buckets are processed, output converges
    m3 = lineage.run_with_lineage(docs, part_dir, n_buckets)
    assert m3["attempt"] == 2
    assert m3["buckets_previously_done"] == m2["buckets_processed"]
    assert m3["buckets_processed"] + m3["buckets_previously_done"] == n_buckets
    resumed = _collect(lineage.read_results(spark, part_dir))
    assert resumed == full

    # a third run is a no-op (everything already done)
    m4 = lineage.run_with_lineage(docs, part_dir, n_buckets)
    assert m4["buckets_processed"] == 0
    assert _collect(lineage.read_results(spark, part_dir)) == full


def test_manifest_metrics(spark, docs_path, tmp_path):
    docs = pipeline.load_documents(spark, docs_path)
    out = str(tmp_path / "m")
    lineage.run_with_lineage(docs, out, 8)
    m = spark.read.parquet(f"{out}/_manifest")
    rows = m.collect()
    assert {r["status"] for r in rows} == {"done"}
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["wall_ms"] >= 0 for r in rows)
