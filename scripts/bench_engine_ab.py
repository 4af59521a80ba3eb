"""Engine A/B: the relational (sql) vs Arrow-UDF (udf) retrieval plans
at two parallelism levels, interleaved child JVMs, optional per-child
quiet gating (SPARK_GRAFT_QUIET_THRESH).  Usage:
    python scripts/bench_engine_ab.py [n_docs] [invocations]
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEVELS = (8, 32)
ENGINES = ("sql", "udf")


def child(cpus: int, corpus: str) -> None:
    from crego_document_extractor_spark.session import get_spark
    from crego_document_extractor_spark.parse import parse_documents
    from crego_document_extractor_spark import pipeline

    spark = get_spark(master=f"local[{cpus}]")
    docs = pipeline.ensure_parallelism(spark.read.parquet(corpus),
                                       min_partitions=cpus * 4).persist()
    docs.count()
    pipeline.extract_from_raw(docs.limit(64)).count()
    pipeline.extract_from_raw(docs).count()
    best, walls = float("inf"), []
    for _ in range(3):
        t0 = time.perf_counter()
        pipeline.extract_from_raw(docs).count()
        walls.append(round(time.perf_counter() - t0, 3))
        best = min(best, walls[-1])
    from crego_document_extractor_spark.extract.crif import default_engine
    print(json.dumps({"cpus": cpus,
                      "engine": default_engine(),
                      "sec": round(best, 3), "walls": walls,
                      "loadavg": list(os.getloadavg())}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    inv = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus = f"/tmp/spark_graft_bench_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus):
        from crego_document_extractor_spark import corpus as cg
        cg.write_corpus(corpus, n_docs, seed=42, big_doc_every=97)
    thresh = os.environ.get("SPARK_GRAFT_QUIET_THRESH")
    best: dict[tuple, dict] = {}
    for _ in range(inv):
        for engine, cpus in itertools.product(ENGINES, LEVELS):
            if thresh:
                deadline = time.time() + 1800
                while os.getloadavg()[0] >= float(thresh) and time.time() < deadline:
                    time.sleep(60)
            env = dict(os.environ, SPARK_GRAFT_ENGINE=engine)
            line = None
            for attempt in range(2):
                try:
                    out = subprocess.run(
                        [sys.executable, __file__, "--child", str(cpus), corpus],
                        capture_output=True, text=True, cwd=REPO,
                        timeout=900, env=env)
                    cand = [ln for ln in out.stdout.splitlines()
                            if ln.startswith("{")]
                    if cand:
                        line = cand[-1]
                        break
                except subprocess.TimeoutExpired:
                    # sporadic python-worker socket hang observed on
                    # this host — kill and retry once
                    print(json.dumps({"engine": engine, "cpus": cpus,
                                      "timeout_attempt": attempt}), flush=True)
            if line is None:
                continue
            print(line, flush=True)
            r = json.loads(line)
            k = (engine, cpus)
            if k not in best or r["sec"] < best[k]["sec"]:
                best[k] = r
    for engine in ENGINES:
        if (engine, 8) not in best or (engine, 32) not in best:
            continue
        lo, hi = best[(engine, 8)], best[(engine, 32)]
        eff = (n_docs / hi["sec"]) / (n_docs / lo["sec"]) / 4
        print(json.dumps({"engine": engine, "eff_8_32": round(eff, 3),
                          "docs_per_sec_32": round(n_docs / hi["sec"], 1),
                          "docs_per_sec_8": round(n_docs / lo["sec"], 1)}))


if __name__ == "__main__":
    main()
