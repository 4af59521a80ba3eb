"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract / resize / frame-sample stages are Arrow
``mapInPandas`` operators.  The decode itself is STUBBED (no
image/audio libraries in this container — clearly marked below); the
Spark-side plumbing — schema, batch shape, partition behavior, UDF
signatures — is real and tested.

Schema convention:

    media(doc_id string, media_ref string, media_kind string,
          payload binary, meta map<string,string>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("content_key", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — real deployments decode with PIL/libvips here.  This
    container has no imaging libraries, so dimensions are derived
    deterministically from the payload bytes (fake but stable), which
    keeps the downstream plumbing (schema, batching, partitioning)
    fully exercisable."""
    if not payload:
        raise NotImplementedError("empty media payload")
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _feature_vec(payload: bytes, dim: int = 8) -> list[float]:
    """STUB feature extractor — deterministic byte-histogram features
    standing in for a CNN/CLIP embedding."""
    hist = [0] * dim
    for b in payload:
        hist[b % dim] += 1
    n = max(len(payload), 1)
    return [round(c / n, 6) for c in hist]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "media_ref", "media_kind", "n_bytes",
                               "content_key", "width", "height", "feature")}
        for r in pdf.itertuples(index=False):
            payload = bytes(r.payload or b"")
            w, h = _decode_image(payload) if payload else (0, 0)
            out["doc_id"].append(r.doc_id)
            out["media_ref"].append(r.media_ref)
            out["media_kind"].append(r.media_kind)
            out["n_bytes"].append(len(payload))
            out["content_key"].append(hashlib.sha256(payload).hexdigest())
            out["width"].append(w)
            out["height"].append(h)
            out["feature"].append(_feature_vec(payload))
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature-extract stage (narrow, no
    shuffle; bounded by arrow.maxRecordsPerBatch for large payloads)."""
    return media.mapInPandas(_extract_batches, schema=FEATURES_SCHEMA)


def media_dedup_keys(media: DataFrame) -> DataFrame:
    """Exact media dedup via content hash — JVM-side, payloads never
    reach Python."""
    from pyspark.sql import functions as F
    return (media.groupBy(F.sha2("payload", 256).alias("content_key"))
            .agg(F.count("*").alias("n"),
                 F.collect_list("media_ref").alias("refs"))
            .where("n > 1"))
