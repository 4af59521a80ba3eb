"""Dev smoke: generate a small corpus, run oracle vs Spark, diff."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crego_document_extractor_spark import corpus, oracle
from crego_document_extractor_spark.session import get_spark
from crego_document_extractor_spark import pipeline

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60

docs = list(corpus.gen_documents(N, seed=42, big_doc_every=29))
expected = [oracle.extract_document(d) for d in docs]

exp_spans = {e["doc_id"]: e["clean_spans"] for e in expected}
exp_rows = {}
for e in expected:
    for r in e["results"]:
        exp_rows[(r["doc_id"], r["param_id"])] = r

with tempfile.TemporaryDirectory() as td:
    path = os.path.join(td, "docs.parquet")
    corpus.write_corpus(path, N, seed=42, big_doc_every=29)
    spark = get_spark(master="local[4]")
    docs_df = pipeline.load_documents(spark, path)
    spans_df, results_df = pipeline.run(docs_df)

    # --- span equality ---
    got_spans = {r["doc_id"]: [s.asDict() for s in r["clean_spans"]]
                 for r in spans_df.collect()}
    n_bad = 0
    for doc_id, exp in exp_spans.items():
        got = got_spans.get(doc_id)
        if got != exp:
            n_bad += 1
            if n_bad <= 2:
                print(f"SPAN MISMATCH {doc_id}")
                for a, b in zip(exp, got or []):
                    if a != b:
                        print("  exp:", a)
                        print("  got:", b)
                        break
    print(f"spans: {len(exp_spans) - n_bad}/{len(exp_spans)} docs equal")

    # --- parameter equality ---
    got_rows = {(r["doc_id"], r["param_id"]): r.asDict()
                for r in results_df.collect()}
    miss = set(exp_rows) - set(got_rows)
    extra = set(got_rows) - set(exp_rows)
    if miss:
        print("missing rows:", list(miss)[:5])
    if extra:
        print("extra rows:", list(extra)[:5])
    n_bad = 0
    for k in sorted(set(exp_rows) & set(got_rows)):
        e, g = exp_rows[k], got_rows[k]
        for f in ("value_num", "value_bool", "value_str", "value_type",
                  "source", "confidence", "status", "similarity_score"):
            ev, gv = e[f], g[f]
            if isinstance(ev, float) and isinstance(gv, float):
                ok = abs(ev - gv) < 1e-12
            else:
                ok = ev == gv
            if not ok:
                n_bad += 1
                if n_bad <= 12:
                    print(f"PARAM MISMATCH {k} field={f} exp={ev!r} got={gv!r}")
                break
    total = len(set(exp_rows) & set(got_rows))
    print(f"params: {total - n_bad}/{total} rows equal")
    spark.stop()
