"""Explicit skew handling for heavy-tailed documents (north_rule).

The extraction pipeline itself is narrow (one doc = one row), so
document skew only stretches single tasks.  Skew becomes a correctness
-of-scale problem the moment spans/accounts are EXPLODED and
re-aggregated by doc_id — one 10^5-span document then concentrates a
hot key.  This module provides the classic two-phase salted
aggregation for that shape:

    explode → groupBy(doc_id, salt) partial-agg → groupBy(doc_id) final

Catalyst's partial aggregation already combines map-side, but a single
mega-document exploded inside ONE input partition still produces one
giant post-shuffle group; salting splits it across `n_salts` reducers.
AQE skew-join splitting (enabled in session.py) covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_span_stats(docs: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-document span statistics over exploded spans with explicit
    salting: returns (doc_id, n_spans, n_chars, n_media).

    Equivalent to the higher-order per-row computation — used to
    verify the salted plan produces identical results (tests) and as
    the template for any exploded-span aggregation at scale."""
    exploded = docs.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "s"))
    salted = exploded.withColumn("salt", F.pmod(F.col("pos"), F.lit(n_salts)))
    partial = (salted.groupBy("doc_id", "salt")
               .agg(F.count("*").alias("p_spans"),
                    F.sum(F.length("s.text")).alias("p_chars"),
                    F.count(F.when(F.col("s.kind") == "media", 1)).alias("p_media")))
    return (partial.groupBy("doc_id")
            .agg(F.sum("p_spans").cast("int").alias("n_spans"),
                 F.sum("p_chars").cast("bigint").alias("n_chars"),
                 F.sum("p_media").cast("int").alias("n_media")))


def unsalted_span_stats(docs: DataFrame) -> DataFrame:
    """The zero-shuffle higher-order equivalent (ground truth)."""
    return docs.select(
        "doc_id",
        F.expr("size(spans)").alias("n_spans"),
        F.expr("aggregate(spans, 0L, (a, s) -> a + length(s.text))").alias("n_chars"),
        F.expr("size(filter(spans, s -> s.kind = 'media'))").alias("n_media"))


def salted_topk_tokens(docs: DataFrame, k: int = 20,
                       n_salts: int = 16) -> DataFrame:
    """Corpus-level token frequency top-k over exploded span text with
    salting on the token key (hot tokens are the skewed keys here):
    groupBy(token, salt) partial counts → groupBy(token) final → top-k."""
    toks = (docs.select("doc_id", F.posexplode("spans").alias("sp", "s"))
            .where("s.kind IN ('text', 'heading')")
            .select("doc_id", "sp",
                    F.posexplode(F.split("s.text", "\\s+")).alias("tp", "tok"))
            .where("tok != ''"))
    # deterministic per-occurrence salt: hash of the occurrence's
    # stable coordinates (doc, span pos, token pos) — unlike a
    # monotonically_increasing_id-derived salt it is identical across
    # retries/partitionings, so a recomputed map task re-produces the
    # same partial groups
    salted = toks.withColumn(
        "salt", F.pmod(F.abs(F.xxhash64("doc_id", "sp", "tp")), F.lit(n_salts)))
    partial = salted.groupBy("tok", "salt").agg(F.count("*").alias("pc"))
    final = partial.groupBy("tok").agg(F.sum("pc").alias("n"))
    return final.orderBy(F.desc("n"), F.asc("tok")).limit(k)
