"""Extra benchmarks (guide §1.4): noop-sink isolation per headline
query + sub-plan breakdowns.  NOT part of the driver contract —
bench.py stays the frozen measurement harness; numbers from here are
cited in OPTIMIZATION_r06.md as isolation evidence only.

Usage: python bench_extra.py [sf_dir] [query_substring ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
ONLY = sys.argv[2:]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=3):
    spark.sparkContext.setJobDescription(name)
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name:45s} {best:8.3f}s")
    return best


def main():
    from crego_document_extractor_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master=f"local[{CPUS}]")
    qs = entrymod.queries()
    names = ["q_j1_broadcast_dim_join", "q_t1_topk_per_group",
             "q_a2_threshold_counts", "q_j2_cosine_topk",
             "q_p3_segmentation", "q_dedup_exact",
             "q_minhash_bands", "q_text_quality"]
    if ONLY:
        names = [n for n in names if any(o in n for o in ONLY)]
    for n in names:
        timed(spark, f"{n} [noop]", lambda n=n: noop(qs[n](spark, SF_DIR)))
    spark.stop()


if __name__ == "__main__":
    main()
