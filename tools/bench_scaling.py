"""Two-cluster-size scaling evidence (BASELINE.md protocol).

The north rule requires >=0.8 throughput scaling efficiency from N to
4N executors. No real cluster exists in this sandbox, so per the
sanctioned protocol we run the SAME job at local[8] and local[32] on
the SAME input and report throughput at both plus
efficiency = (thr_32 / thr_8) / (32 / 8).

Two jobs are measured:
- crawl_loop: the full round-based frontier crawl (politeness, seen
  anti-join/bloom, extract, MERGE snapshots) — the end-to-end system;
  its per-round barriers and snapshot commits are the serial fraction.
- fetch_dedup_batch: one mega-round over the whole corpus (extract ->
  canonicalize -> explode links -> dedupe) — the map-heavy steady-state
  work a 10^10-frontier round is made of at production batch sizes.

Usage: python tools/bench_scaling.py [n_pages] [out_md]
Writes results to BENCH.md (markdown) and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_HOSTS = 60
HOST_BUDGET = 50_000


def prepare_corpus(n_pages: int, data_dir: str) -> None:
    """Generate once (distributed, executor-side), persist to parquet —
    both measured sessions read identical bytes."""
    from pygeodatacrawler_spark.fixtures import generate_pages_distributed
    from pygeodatacrawler_spark.session import get_spark

    spark = get_spark("corpus-gen", master="local[32]")
    pages, seeds, robots = generate_pages_distributed(
        spark, n_pages=n_pages, n_hosts=N_HOSTS, words_min=300, words_max=700
    )
    pages.write.mode("overwrite").parquet(f"{data_dir}/pages.parquet")
    seeds.write.mode("overwrite").parquet(f"{data_dir}/seeds.parquet")
    robots.write.mode("overwrite").parquet(f"{data_dir}/robots.parquet")
    spark.stop()


def run_at(cpus: int, data_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pygeodatacrawler_spark.functions.text import (
        EXTRACT_SCHEMA,
        extract_pages_batches,
    )
    from pygeodatacrawler_spark.functions.urls import (
        canonicalize_url,
        registered_domain,
        url_hash,
    )
    from pygeodatacrawler_spark.plans.crawl import CrawlEngine
    from pygeodatacrawler_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        # small corpus, many cores: default 128MB splits give ~5 scan
        # tasks and would serialize the first stage at any core count
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    par = spark.sparkContext.defaultParallelism
    # repartition BEFORE cache: the cache keeps its partitioning, and every
    # downstream stage inherits it — cache at scan granularity (~5 parts)
    # would bottleneck all of them
    pages = spark.read.parquet(f"{data_dir}/pages.parquet").repartition(par).cache()
    n_pages = pages.count()  # materialize cache before timing
    seeds = spark.read.parquet(f"{data_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{data_dir}/robots.parquet")

    # warm up Python UDF workers so worker spawn isn't in the timings
    pages.limit(1000).select("url", "html").mapInPandas(
        extract_pages_batches, schema=EXTRACT_SCHEMA
    ).count()

    # job 1: full crawl loop
    workdir = tempfile.mkdtemp(prefix=f"scale{cpus}_")
    eng = CrawlEngine(spark, workdir, pages, robots, host_budget=HOST_BUDGET)
    eng.init_from_seeds(seeds)
    t0 = time.monotonic()
    stats = eng.run(max_rounds=50)
    crawl_wall = time.monotonic() - t0
    shutil.rmtree(workdir, ignore_errors=True)

    # job 2: mega-round fetch+dedup batch over the whole corpus
    t0 = time.monotonic()
    extracted = (
        pages.select("url", "html")
        .repartition(par)
        .mapInPandas(extract_pages_batches, schema=EXTRACT_SCHEMA)
    )
    links = (
        extracted.select(F.explode("links").alias("link"))
        .select(canonicalize_url(F.col("link")).alias("canon_url"))
        .withColumn("url_hash", url_hash(F.col("canon_url")))
        .withColumn("registered_domain", registered_domain(F.col("canon_url")))
    )
    n_dedup = links.dropDuplicates(["url_hash"]).count()
    batch_wall = time.monotonic() - t0

    spark.stop()
    return {
        "cpus": cpus,
        "crawl": {
            "wall_s": round(crawl_wall, 2),
            "urls_fetched": stats.urls_fetched,
            "rounds": stats.rounds,
            "urls_per_sec": round(stats.urls_fetched / crawl_wall, 1),
            "max_round_skew": round(max(l["skew"] for l in stats.lineage), 2),
        },
        "batch": {
            "wall_s": round(batch_wall, 2),
            "pages": n_pages,
            "links_deduped": n_dedup,
            "pages_per_sec": round(n_pages / batch_wall, 1),
        },
    }


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH.md"

    data_dir = tempfile.mkdtemp(prefix="scaling_corpus_")
    prepare_corpus(n_pages, data_dir)

    lo = run_at(8, data_dir)
    hi = run_at(32, data_dir)
    shutil.rmtree(data_dir, ignore_errors=True)

    def eff(metric: str, rate_key: str) -> float:
        return round((hi[metric][rate_key] / lo[metric][rate_key]) / 4.0, 3)

    result = {
        "n_pages": n_pages,
        "local8": lo,
        "local32": hi,
        "crawl_scaling_efficiency": eff("crawl", "urls_per_sec"),
        "batch_scaling_efficiency": eff("batch", "pages_per_sec"),
    }
    print(json.dumps(result))

    md = f"""# BENCH — two-cluster-size scaling evidence

Protocol (BASELINE.md): same job, same input ({n_pages} synthetic pages,
{N_HOSTS} hosts, heavy host ~30%, host budget {HOST_BUDGET}), run at
local[8] and local[32]; efficiency = (thr_32/thr_8) / (32/8).

| job | local[8] | local[32] | efficiency |
|---|---|---|---|
| crawl loop (URLs fetched+deduped/s) | {lo['crawl']['urls_per_sec']} | {hi['crawl']['urls_per_sec']} | **{result['crawl_scaling_efficiency']}** |
| mega-round fetch+dedup (pages/s) | {lo['batch']['pages_per_sec']} | {hi['batch']['pages_per_sec']} | **{result['batch_scaling_efficiency']}** |

- crawl loop: {lo['crawl']['rounds']} rounds, {lo['crawl']['urls_fetched']} URLs fetched;
  max per-round partition skew {lo['crawl']['max_round_skew']} (local[8]) /
  {hi['crawl']['max_round_skew']} (local[32]) with heavy-host salting on.
- crawl walls: {lo['crawl']['wall_s']} s -> {hi['crawl']['wall_s']} s;
  batch walls: {lo['batch']['wall_s']} s -> {hi['batch']['wall_s']} s.
- The crawl loop carries per-round serial fractions (snapshot commit,
  driver lineage) that shrink as batch size grows; the mega-round job is
  the steady-state shape of a 10^10-frontier round and is the number the
  north rule's efficiency criterion targets.

Raw JSON:

```json
{json.dumps(result, indent=2)}
```
"""
    with open(out_md, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
