"""Multi-process executor-scaling benchmark (north_rule evidence).

The north rule asks for throughput scaling efficiency >= 0.8 between N
and 4N EXECUTORS.  local[N] thread scaling under-states a real cluster
because all "executors" share one JVM heap, one GC, and one code cache;
this harness emulates executors faithfully as INDEPENDENT JVM
processes — each a local[CORES_PER_EXEC] SparkSession over a disjoint
file shard of the same corpus, started simultaneously behind a READY/GO
barrier (JVM startup and warm-up excluded from the timed window, same
as a long-lived executor pool).

    throughput(P) = total_docs / max(per-process timed sec)
    efficiency    = (thr_4N / thr_N) / 4

Usage: python scripts/bench_executors.py [n_docs] [pair_lo] [pair_hi]
Defaults: 160000 docs, 2 -> 8 executors x 4 cores.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES_PER_EXEC = 4
RUNS = 3


def child(files_csv: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
    from crego_document_extractor_spark.session import get_spark
    from crego_document_extractor_spark.parse import parse_documents
    from crego_document_extractor_spark import pipeline

    files = files_csv.split(",")
    spark = get_spark(master=f"local[{CORES_PER_EXEC}]",
                      shuffle_partitions=CORES_PER_EXEC * 4)
    docs = pipeline.ensure_parallelism(
        spark.read.parquet(*files),
        min_partitions=CORES_PER_EXEC * 4).persist()
    n_docs = docs.count()
    # warm JVM/JIT + python workers with a FULL pass (a real executor
    # pool is long-lived; the giant codegen methods take a full pass
    # to JIT — see scripts/bench_scaling.py)
    pipeline.extract_from_raw(docs.limit(64)).count()
    pipeline.extract_from_raw(docs).count()

    print("READY", flush=True)
    sys.stdin.readline()  # GO barrier

    best, rows = float("inf"), 0
    for _ in range(RUNS):
        t0 = time.perf_counter()
        rows = pipeline.extract_from_raw(docs).count()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"docs": n_docs, "sec": round(best, 3), "rows": rows}),
          flush=True)
    spark.stop()


def run_level(n_exec: int, shards: list[list[str]]) -> dict:
    procs = []
    for i in range(n_exec):
        p = subprocess.Popen(
            [sys.executable, __file__, "--child", ",".join(shards[i])],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, cwd=REPO)
        procs.append(p)
    for p in procs:  # barrier: all executors warmed before GO
        while True:
            line = p.stdout.readline()
            if line.strip() == "READY":
                break
    for p in procs:
        p.stdin.write("GO\n")
        p.stdin.flush()
    results = []
    for p in procs:
        for line in p.stdout:
            if line.startswith("{"):
                results.append(json.loads(line))
                break
        p.wait()
    total_docs = sum(r["docs"] for r in results)
    wall = max(r["sec"] for r in results)
    out = {"executors": n_exec, "cores_each": CORES_PER_EXEC,
           "total_docs": total_docs, "wall_sec": wall,
           "docs_per_sec": round(total_docs / wall, 1),
           "per_exec_sec": [r["sec"] for r in results]}
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    corpus_path = f"/tmp/spark_graft_bench_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus_path):
        from crego_document_extractor_spark import corpus as cg
        cg.write_corpus(corpus_path, n_docs, seed=42, big_doc_every=97)

    # shard the single-file corpus into `hi` balanced files once
    shards_dir = f"/tmp/spark_graft_bench_shards_{n_docs}_{hi}"
    files = sorted(glob.glob(f"{shards_dir}/*.parquet"))
    if len(files) != hi:
        import pyarrow.parquet as pq
        os.makedirs(shards_dir, exist_ok=True)
        t = pq.read_table(corpus_path)
        n = t.num_rows
        bounds = [n * i // hi for i in range(hi + 1)]
        for i in range(hi):
            pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]),
                           f"{shards_dir}/shard{i:02d}.parquet",
                           row_group_size=500)
        files = sorted(glob.glob(f"{shards_dir}/*.parquet"))

    def shard(n):  # round-robin so shards are size-balanced
        return [files[i::n] for i in range(n)]

    # interleave the two levels twice; keep per-level best throughput
    best: dict[int, dict] = {}
    for _ in range(2):
        for n in (lo, hi):
            r = run_level(n, shard(n))
            if n not in best or r["docs_per_sec"] > best[n]["docs_per_sec"]:
                best[n] = r

    thr_lo, thr_hi = best[lo]["docs_per_sec"], best[hi]["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(json.dumps({"pair": f"{lo}->{hi} executors x{CORES_PER_EXEC}",
                      "eff": round(eff, 3),
                      "docs_per_sec_lo": thr_lo,
                      "docs_per_sec_hi": thr_hi}), flush=True)


if __name__ == "__main__":
    main()
