"""Ad-hoc flagship probe: time extract_from_raw over a pinned corpus.

Same warm-run methodology as bench.py / bench_scaling.py — used for
before/after A-B measurements of flagship plan changes at the 160k
design point without running the whole bench.

Usage: python scripts/probe_flagship.py [corpus_parquet] [cpus] [runs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/spark_graft_bench_corpus_160000.parquet"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from crego_document_extractor_spark.session import get_spark
    from crego_document_extractor_spark import pipeline

    print("loadavg_start:", os.getloadavg())
    spark = get_spark(master=f"local[{cpus}]")
    docs = pipeline.ensure_parallelism(spark.read.parquet(corpus),
                                       min_partitions=cpus * 4).persist()
    n_docs = docs.count()
    pipeline.extract_from_raw(docs.limit(64), n_docs=n_docs).count()
    pipeline.extract_from_raw(docs, n_docs=n_docs).count()  # full warm

    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n_rows = pipeline.extract_from_raw(docs, n_docs=n_docs).count()
        walls.append(round(time.perf_counter() - t0, 3))
        print("run:", walls[-1], "s")
    best = min(walls)
    print(f"n_docs={n_docs} rows={n_rows} min={best} "
          f"median={sorted(walls)[len(walls) // 2]} "
          f"docs_per_sec={round(n_docs / best, 1)} "
          f"loadavg_end={os.getloadavg()}")


if __name__ == "__main__":
    main()
