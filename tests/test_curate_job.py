"""jobs/curate_job.py: the end-to-end curation job — funnel report,
kept-set consistency, and the shard sink round-trip."""

import pytest


def test_curate_job_end_to_end(spark, tmp_path):
    from jobs.curate_job import run
    out = str(tmp_path / "shards")
    res = run(spark, "/root/testdata/sf0.001/documents.parquet", out,
              min_chars=100, budget_tokens=512)
    funnel = {r["stage"]: r for r in res["funnel"]}
    # the funnel's final survivors == what the job actually wrote
    last = res["funnel"][-1]
    assert res["shards"]["n_docs"] == last["n_kept"]
    # telescoping + stage order
    assert [r["stage"] for r in res["funnel"]] == [
        "lang", "min_length", "has_stopword", "exact_dedup"]
    for r in res["funnel"]:
        assert r["n_kept"] == r["n_in"] - r["n_dropped"]
    # round-trip: the shard dir holds exactly the kept docs
    back = spark.read.parquet(out)
    assert back.count() == res["shards"]["n_docs"]
    assert back.select("doc_id").distinct().count() == back.count()
    # idempotent re-run: same shard summary
    res2 = run(spark, "/root/testdata/sf0.001/documents.parquet", out,
               min_chars=100, budget_tokens=512)
    assert res2["shards"] == res["shards"]
