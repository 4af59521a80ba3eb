"""spark-submit entry point for the corpus-curation pipeline.

The companion of jobs/extract_job.py for the training-data side of
the engine: run a raw document table through the standard curation
funnel (language gate → length gate → quality gate → exact dedup →
optional benchmark decontamination), write the kept documents as
deterministic training shards, and print the per-stage retention
report plus the shard manifest summary as one JSON line.

    bash scripts/package.sh
    spark-submit --master <cluster> \
        --py-files dist/crego_document_extractor_spark.zip \
        jobs/curate_job.py --input <documents parquet> \
        --output <shard dir> [--eval-input <eval parquet>] \
        [--lang en] [--min-chars 100] [--budget-tokens 2048]

Every stage is the library operator (ops/curation, ops/pack), so the
job inherits their audited scale shapes: gates fuse into the scan,
dedup is one keyed shuffle, decontamination is a broadcast gram join,
and the shard write is hive-partitioned with dynamic overwrite
(idempotent re-run).
"""

from __future__ import annotations

import argparse
import json


def run(spark, input_path: str, output_path: str,
        eval_input: str | None = None, lang: str = "en",
        min_chars: int = 100, budget_tokens: int = 2048,
        text_col: str = "text", id_col: str = "doc_id") -> dict:
    """The whole job as a callable (tests drive this directly)."""
    from pyspark.sql import functions as F

    from crego_document_extractor_spark.ops.curation import (
        curation_funnel)
    from crego_document_extractor_spark.ops.pack import (
        write_training_shards)

    docs = spark.read.parquet(input_path)
    gates = [
        ("lang", f"lang = '{lang}'" if "lang" in docs.columns
         else "true"),
        ("min_length", f"length({text_col}) >= {min_chars}"),
        ("has_stopword", f"lower({text_col}) LIKE '% the %'"),
    ]
    eval_df = spark.read.parquet(eval_input) if eval_input else None
    # ONE funnel evaluation yields both the report and the kept set —
    # the published retention numbers can never desynchronize from
    # the corpus actually written
    funnel, kept = curation_funnel(
        docs, gates, dedup=True, eval_df=eval_df,
        text_col=text_col, id_col=id_col, return_kept=True)
    # persist the kept set: it feeds the packing AND the shard join
    # inside write_training_shards — without the cache the gate scan
    # + dedup window shuffle would re-run per consumer
    kept = kept.persist()
    report = [r.asDict() for r in funnel.collect()]

    manifest = write_training_shards(
        kept, output_path, budget_tokens=budget_tokens,
        id_col=id_col, text_col=text_col)
    kept.unpersist()
    shards = manifest.agg(
        F.count("*").alias("n_shards"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens")).collect()[0].asDict()
    return {"funnel": report, "shards": shards,
            "output": output_path}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-input", default=None)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--budget-tokens", type=int, default=2048)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("crego-curate").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }.items():
        spark.conf.set(k, v)
    print(json.dumps(run(spark, args.input, args.output,
                         args.eval_input, args.lang, args.min_chars,
                         args.budget_tokens)))
    spark.stop()


if __name__ == "__main__":
    main()
