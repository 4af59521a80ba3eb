"""End-to-end extraction pipeline.

``documents(doc_id, spans)`` → (clean_spans, parameter results,
formatted per-document output).  Physical shape (SURVEY.md §7):

* PARSE    one Arrow ``mapInPandas`` stage (narrow, no shuffle)
* EXTRACT  higher-order SQL per document + one retrieval pandas_udf
           (narrow, no shuffle)
* the ONLY wide operation is the optional per-document output
  assembly groupBy (S8) — and the per-doc results explode/re-group can
  be fused away by asking for `formatted_output` directly.

At 100 TB the pipeline is therefore scan → project → write; skew from
heavy-tailed documents affects single-task latency only (one doc is
one row end-to-end), and AQE handles the output groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .parse import parse_documents, load_documents
from .extract.crif import extract_crif, extract_crif_legacy
from .extract.gstr import extract_gstr

__all__ = ["load_documents", "parse_documents", "clean_spans",
           "extract_parameters", "run", "formatted_output"]


def ensure_parallelism(docs: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition CPU-bound small inputs up to the cluster's
    parallelism.  Only for few-file/benchmark inputs: a production
    10^12-document Iceberg table already provides file-level split
    parallelism, and shuffling raw payloads at that scale would be the
    bottleneck — so this is a no-op when the scan is already wide."""
    spark = docs.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism * 2
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def clean_spans(parsed: DataFrame) -> DataFrame:
    """The span-equality deliverable (north_rule invariant)."""
    return parsed.select("doc_id", "clean_spans")


def extract_parameters(parsed: DataFrame, mode: str = "embedding") -> DataFrame:
    """Route by document kind (main.py:66-69) and union the long
    results tables.  mode='embedding' is the reference default
    (config.py:58); mode='legacy' is the direct-parsing path
    (crif_legacy.py)."""
    crif = extract_crif(parsed) if mode == "embedding" else extract_crif_legacy(parsed)
    return crif.unionByName(extract_gstr(parsed))


def run(docs: DataFrame, repartition: bool = True) -> tuple[DataFrame, DataFrame]:
    """Full pipeline: returns (clean_spans_df, results_df)."""
    if repartition:
        docs = ensure_parallelism(docs)
    parsed = parse_documents(docs)
    return clean_spans(parsed), extract_parameters(parsed)


def formatted_output(results: DataFrame) -> DataFrame:
    """S8 sink shape (output_formatter.py:12-43): nested per-document
    struct + overall confidence (formatter variant: mean of positive
    confidences, round 3 — output_formatter.py:46-70)."""
    return (
        results.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.expr(
                    "struct(param_id, struct(value_num, value_bool, value_str, "
                    "value_type, source, confidence, status, similarity_score))"
                ))
            ).alias("parameters"),
            F.round(F.avg(F.when(F.col("confidence") > 0, F.col("confidence"))), 3)
            .alias("overall_confidence_score"),
            F.round(F.avg("confidence"), 2).alias("overall_confidence_api"),
        )
        .withColumn("overall_confidence_score",
                    F.coalesce("overall_confidence_score", F.lit(0.0)))
    )
