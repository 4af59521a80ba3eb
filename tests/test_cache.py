"""Content-addressed parse cache: hits skip the parse, misses append,
admin ops mirror cache.py:151-203."""

from crego_document_extractor_spark import cache, corpus, pipeline


def _spans_map(df):
    return {r["doc_id"]: [s.asDict() for s in r["clean_spans"]]
            for r in df.select("doc_id", "clean_spans").collect()}


def test_cache_hit_miss_and_stats(spark, tmp_path):
    cache_dir = str(tmp_path / "parsed_docs")
    p1 = str(tmp_path / "d1.parquet")
    p2 = str(tmp_path / "d2.parquet")
    corpus.write_corpus(p1, 30, seed=11, big_doc_every=0)
    corpus.write_corpus(p2, 50, seed=11, big_doc_every=0)  # superset: 30 dup

    docs1 = pipeline.load_documents(spark, p1)
    parsed1, m1 = cache.parse_with_cache(docs1, cache_dir)
    assert m1 == {"hits": 0, "misses": 30}
    direct = pipeline.parse_documents(docs1)
    assert _spans_map(parsed1) == _spans_map(direct)

    # second corpus shares the first 30 docs byte-for-byte → 30 hits
    docs2 = pipeline.load_documents(spark, p2)
    parsed2, m2 = cache.parse_with_cache(docs2, cache_dir)
    assert m2 == {"hits": 30, "misses": 20}
    assert parsed2.count() == 50
    assert _spans_map(parsed2) == _spans_map(pipeline.parse_documents(docs2))

    # idempotent re-run: all hits
    _, m3 = cache.parse_with_cache(docs2, cache_dir)
    assert m3 == {"hits": 50, "misses": 0}

    stats = cache.cache_stats(spark, cache_dir)
    assert stats["entries"] == 50

    removed = cache.clear_cache(spark, cache_dir, doc_kind="gstr")
    assert removed == 10  # 20% of 50
    assert cache.cache_stats(spark, cache_dir)["entries"] == 40
    assert cache.clear_cache(spark, cache_dir) == 40
    assert cache.cache_stats(spark, cache_dir)["entries"] == 0


def test_cache_doc_kind_not_leaked_across_kinds(spark, tmp_path):
    """A byte-identical span payload cached under one doc kind must not
    serve its writer's routing kind to a caller of another kind (the
    cache key is content-only; doc_kind comes from the requester)."""
    from crego_document_extractor_spark import parse

    cache_dir = str(tmp_path / "parsed_docs")
    spans = [("text", "same payload", "", 0)]
    df1 = spark.createDataFrame([("crif-000001", spans)],
                                schema=parse.DOCUMENTS_SCHEMA)
    parsed1, m1 = cache.parse_with_cache(df1, cache_dir)
    assert m1 == {"hits": 0, "misses": 1}
    assert parsed1.collect()[0]["doc_kind"] == "crif"

    df2 = spark.createDataFrame([("html-000001", spans)],
                                schema=parse.DOCUMENTS_SCHEMA)
    parsed2, m2 = cache.parse_with_cache(df2, cache_dir)
    assert m2 == {"hits": 1, "misses": 0}  # content hit across kinds
    row = parsed2.collect()[0]
    assert row["doc_kind"] == "html"       # kind of the requester
    assert parsed2.columns == [f.name for f in parse.PARSED_SCHEMA.fields]
