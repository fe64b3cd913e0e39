"""applyInPandasWithState: streaming per-host dedup + budget carries
state across micro-batches."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from pygeodatacrawler_spark.streaming.stateful import dedup_with_budget


def test_dedup_with_budget_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "src").mkdir()

    def write_batch(name: str, rows: list[tuple[str, str, int]]):
        df = spark.createDataFrame(
            rows, "registered_domain string, canon_url string, url_hash long"
        )
        df.coalesce(1).write.mode("overwrite").json(f"{src}/{name}")

    # batch 1: host-a 3 urls (one dup within batch), host-b 1 url
    write_batch(
        "b1",
        [
            ("a.org", "https://a.org/1", 1),
            ("a.org", "https://a.org/2", 2),
            ("a.org", "https://a.org/1", 1),
            ("b.org", "https://b.org/9", 9),
        ],
    )
    stream = spark.readStream.schema(
        "registered_domain string, canon_url string, url_hash long"
    ).json(f"{src}/*")
    out = dedup_with_budget(stream, budget=3)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select count(*) n from dedup_out").collect()[0]["n"] >= 3:
                break
            time.sleep(1)
        # batch 2: re-sends url 1 (dup across batches), adds 3 & 4
        # (4 exceeds host-a's budget of 3)
        write_batch(
            "b2",
            [
                ("a.org", "https://a.org/1", 1),
                ("a.org", "https://a.org/3", 3),
                ("a.org", "https://a.org/4", 4),
            ],
        )
        while time.time() < deadline:
            if spark.sql("select count(*) n from dedup_out").collect()[0]["n"] >= 4:
                break
            time.sleep(1)
    finally:
        q.stop()

    rows = spark.sql("select * from dedup_out").collect()
    got = {(r["registered_domain"], r["url_hash"]): r["rank"] for r in rows}
    assert (("a.org", 1)) in got and got[("a.org", 1)] == 1
    assert got[("a.org", 2)] == 2
    assert got[("b.org", 9)] == 1
    # cross-batch state: url 3 admitted with rank 3; 1 deduped; 4 over budget
    assert got.get(("a.org", 3)) == 3
    assert ("a.org", 4) not in got
    assert len(got) == 4
