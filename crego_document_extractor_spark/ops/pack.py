"""Token-budget sequence packing — training-shard assignment.

A training-data pipeline's last mile: place documents into
fixed-token-budget shards ("sequences") deterministically.  The
naive greedy packer is a sequential scan — a single-partition global
window that dies at corpus scale — so this operator uses the
scalable idiom: VALUE-BASED id ranges (doc_id div range_size) give
deterministic, data-independent partition boundaries; packing runs
per range in parallel (one window partition each), and the global
shard key is (rng, shard).  Offset semantics: a document whose
running token offset starts inside shard k belongs to shard k; an
oversized document occupies its start shard and pushes the next
document forward — deterministic, one pass, no shuffle beyond the
single hash partition by range.

Both the token count (whitespace split) and the packing rule are
DuckDB-expressible, so the driver query q_pack_sequences is
value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pack_sequences(df: DataFrame, budget_tokens: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   range_size: int = 1000) -> DataFrame:
    """(id, text) → (id, n_tokens, rng, shard).

    ``rng`` = id div range_size (value-based → deterministic and
    partition-parallel regardless of cluster size); ``shard`` =
    floor(start_offset / budget) within the range, where start_offset
    is the running token sum of all smaller ids in the range."""
    w = Window.partitionBy("rng").orderBy(id_col)
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size(split({text_col}, ' '))").alias("n_tokens"),
        F.expr(f"CAST(CAST({id_col} AS BIGINT) div {range_size} AS BIGINT)")
        .alias("rng"))
    return (d.withColumn("cum", F.sum("n_tokens").over(w))
            .select("doc_id", "n_tokens", "rng",
                    F.expr(f"CAST(floor((cum - n_tokens) / {budget_tokens}.0d)"
                           " AS BIGINT)").alias("shard")))


def shard_manifest(packed: DataFrame) -> DataFrame:
    """(rng, shard) → docs, tokens, fill ratio — the writer-side view
    (one output file per (rng, shard) in a real pipeline)."""
    return (packed.groupBy("rng", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


def write_training_shards(df: DataFrame, path: str,
                          budget_tokens: int = 2048,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          range_size: int = 1000,
                          fmt: str = "parquet") -> DataFrame:
    """The last-mile SINK: materialize the corpus as deterministic
    training shards on disk — one directory per (rng, shard) via
    ``partitionBy``, so every run, engine, and cluster size produces
    byte-stable shard MEMBERSHIP (the property that makes a training
    run reproducible and a failed write resumable: re-running
    overwrites the same partitions with the same rows).

    Built on `pack_sequences`' value-based ranges — no global sort,
    no sampling-dependent repartitionByRange; the only shuffle is the
    per-range packing window.  Dynamic partition overwrite keeps a
    re-run of a SUBSET of ranges from clobbering the rest (the same
    idempotent-resume contract as cache.py).  Returns the manifest
    (one row per written shard) for lineage recording."""
    packed = pack_sequences(df, budget_tokens, id_col, text_col,
                            range_size).persist()
    out = (df.select(F.col(id_col).alias("doc_id"), text_col)
           .join(packed, "doc_id"))
    try:
        # per-write option, NOT a session-conf flip (r5 ADVICE): two
        # concurrent writers mutating the session-global
        # partitionOverwriteMode could race, one restore flipping the
        # other's in-flight overwrite back to static mid-write
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic").format(fmt)
         .partitionBy("rng", "shard").save(path))
        # manifest off the CACHED packing (shard-count-sized), then
        # cut its lineage so unpersisting below can't trigger a full
        # recompute when the caller finally aggregates it
        manifest = shard_manifest(packed).localCheckpoint()
    finally:
        packed.unpersist()
    return manifest
