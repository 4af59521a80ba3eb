"""crego_document_extractor_spark — a from-scratch, PySpark-native
re-implementation of the query/data-processing capabilities of
SwastikGoomber/crego-document_extractor (reference, read-only at
/root/reference).

The engine operates on Iceberg-style tables of interleaved text+media
documents::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

and emits, per document, (a) the boilerplate-stripped ordered span
sequence (the correctness invariant: span-sequence equality
``(kind, text, media_ref, order)`` vs the pure-Python oracle that
mirrors the reference semantics), and (b) the reference's typed
extraction parameters ``(value, source, confidence, status,
similarity_score)`` — see ``app/main.py:45-83`` and
``app/utils/output_formatter.py:12-43`` in the reference.

Design: DataFrame/SQL-first.  The only Python-side stages are the
Arrow-batched ``mapInPandas`` parse stage (tokenize + boilerplate
strip + chunk/table rebuild, mirroring ``app/services/parser.py``) and
one vectorized ``pandas_udf`` for deterministic embedding retrieval
(replacing the reference's Ollama HTTP calls,
``app/services/embeddings.py:25-51``).  Everything else — account
parsing, table-signature extraction, DPD aggregation, confidence
ladders — is JVM-side Spark SQL (higher-order array functions, regexp,
CASE), shuffle-free per document.
"""

__version__ = "0.1.0"
