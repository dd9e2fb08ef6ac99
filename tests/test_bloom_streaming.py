"""Bloom prefilter exactness + streaming surface + salting."""

import tempfile

import pyspark.sql.functions as F

from linkinator_spark.operators.bloom import (
    BloomFilter, build_bloom, dedup_with_bloom,
)
from linkinator_spark.sources.webgraph import (
    hot_host_salts, synth_frontier, with_salt,
)
from linkinator_spark.streaming.frontier_stream import (
    run_available_now, stream_candidates, stream_fetch_metrics,
)


def test_bloom_no_false_negatives():
    import numpy as np

    bloom = BloomFilter(expected=10_000, fpp=0.01)
    added = np.arange(0, 10_000, dtype=np.int64) * 2_654_435_761
    bloom.add_many(added)
    assert bloom.might_contain(added).all()
    probe = np.arange(1, 20_000, 2, dtype=np.int64) * 40_503 + 7
    fp_rate = bloom.might_contain(probe).mean()
    assert fp_rate < 0.05


def test_dedup_with_bloom_equals_anti_join(spark):
    frontier = synth_frontier(spark, 2000, n_hosts=50)
    seen = frontier.filter(F.col("seq") % 3 == 0).select("url")
    bloom = build_bloom(seen, expected=1000)
    exact = frontier.join(seen, "url", "left_anti")
    via_bloom = dedup_with_bloom(frontier, seen, bloom)
    a = {r["url"] for r in exact.select("url").collect()}
    b = {r["url"] for r in via_bloom.select("url").collect()}
    assert a == b


def test_hot_host_salting(spark):
    frontier = synth_frontier(spark, 20_000, n_hosts=100, skew=5.0)
    salts = hot_host_salts(frontier, threshold=500)
    assert salts.count() >= 1  # skewed generator produces hot hosts
    salted = with_salt(frontier, salts)
    # salting splits hot hosts into multiple stripes
    stripes = (
        salted.join(salts, "host", "semi")
        .select("host", "salt").distinct()
        .groupBy("host").count()
    )
    assert stripes.filter("count > 1").count() >= 1
    # cold hosts keep salt 0
    cold = salted.join(salts, "host", "left_anti").select("salt").distinct().collect()
    assert [r["salt"] for r in cold] == [0]


def test_stream_candidates_dedup(spark):
    with tempfile.TemporaryDirectory() as d:
        rows = [
            ("http://a.test/x#frag", "2024-01-01 00:00:00"),
            ("http://a.test/x", "2024-01-01 00:00:05"),
            ("http://b.test/y", "2024-01-01 00:00:10"),
        ]
        df = spark.createDataFrame(rows, "url string, ts_s string").select(
            "url", F.to_timestamp("ts_s").alias("ts")
        )
        df.write.parquet(f"{d}/in")
        stream = stream_candidates(spark, f"{d}/in")
        run_available_now(stream, f"{d}/ckpt")
        out = spark.sql("select * from stream_out").collect()
        urls = sorted(r["url"] for r in out)
        assert urls == ["http://a.test/x", "http://b.test/y"]
        assert all(r["host"] in ("a.test", "b.test") for r in out)


def test_stream_fetch_metrics(spark):
    with tempfile.TemporaryDirectory() as d:
        rows = [
            ("http://a.test/1", "a.test", 200, "2024-01-01 00:00:10"),
            ("http://a.test/2", "a.test", 404, "2024-01-01 00:00:20"),
            ("http://b.test/1", "b.test", 0, "2024-01-01 00:01:10"),
        ]
        df = spark.createDataFrame(rows, "url string, host string, status int, ts_s string") \
            .select("url", "host", "status", F.to_timestamp("ts_s").alias("ts"))
        df.write.parquet(f"{d}/in")
        stream = stream_fetch_metrics(spark, f"{d}/in")
        # append mode would hold windows open until the watermark passes;
        # complete mode emits the full aggregate on drain
        run_available_now(stream, f"{d}/ckpt", mode="complete")
        out = {(r["host"]): (r["n_fetched"], r["n_broken"])
               for r in spark.sql("select * from stream_out").collect()}
        assert out["a.test"] == (2, 1)
        assert out["b.test"] == (1, 1)


def test_stream_politeness_gate_stateful(spark):
    from linkinator_spark.streaming.frontier_stream import (
        stream_politeness_gate,
    )

    with tempfile.TemporaryDirectory() as d:
        schema = "url string, host string, ts_s string"
        rows = [
            ("http://a.test/1", "a.test", "2024-01-01 00:00:00"),
            ("http://a.test/2", "a.test", "2024-01-01 00:00:00"),
            ("http://a.test/3", "a.test", "2024-01-01 00:00:00"),
            ("http://b.test/1", "b.test", "2024-01-01 00:00:00"),
            ("http://b.test/2", "b.test", "2024-01-01 00:00:00"),
        ]
        spark.createDataFrame(rows, schema).select(
            "url", "host", F.to_timestamp("ts_s").alias("ts")
        ).write.parquet(f"{d}/in")

        def drain():
            # parquet sink (not memory): the stateful query must RESUME
            # from the checkpoint on the second drain, which the
            # non-fault-tolerant memory sink rejects
            cand = spark.readStream.schema(
                "url string, host string, ts timestamp").parquet(f"{d}/in")
            q = (stream_politeness_gate(cand, min_delay_ms=1000)
                 .writeStream.format("parquet")
                 .option("path", f"{d}/out")
                 .option("checkpointLocation", f"{d}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return spark.read.parquet(f"{d}/out").collect()

        out = drain()
        assert len(out) == 5
        by_host = {}
        for r in sorted(out, key=lambda r: (r["host"], r["not_before"])):
            by_host.setdefault(r["host"], []).append(r)
        for host, rs in by_host.items():
            # FIFO by (ts, url) and >= 1s spacing within a host
            assert [r["url"] for r in rs] == sorted(r["url"] for r in rs)
            gaps = [(b["not_before"] - a["not_before"]).total_seconds()
                    for a, b in zip(rs, rs[1:])]
            assert all(g >= 0.999 for g in gaps), gaps
        # hosts are independent: both start at their arrival time
        assert by_host["a.test"][0]["not_before"].second == 0
        assert by_host["b.test"][0]["not_before"].second == 0

        # state survives across drains: a later arrival on a.test must be
        # pushed past the last scheduled slot (00:00:02 + 1s)
        spark.createDataFrame(
            [("http://a.test/4", "a.test", "2024-01-01 00:00:00.5")], schema
        ).select("url", "host", F.to_timestamp("ts_s").alias("ts")
                 ).write.mode("append").parquet(f"{d}/in")
        out2 = drain()
        new = [r for r in out2 if r["url"] == "http://a.test/4"]
        assert len(new) == 1
        assert new[0]["not_before"].second == 3  # 00:00:02 last + 1s


def test_stream_host_health_stateful(spark):
    """State carries across micro-batches/restarts: a host whose outage
    spans two drains trips only once five trailing failures accumulate;
    a recovering host resets; the rate rule needs min_fetches."""
    import tempfile

    from linkinator_spark.streaming.frontier_stream import (
        stream_host_health,
    )

    with tempfile.TemporaryDirectory() as d:
        schema = "url string, host string, ts_s string, failed boolean"

        def write(rows, part):
            spark.createDataFrame(rows, schema).select(
                "url", "host", F.to_timestamp("ts_s").alias("ts"), "failed"
            ).write.parquet(f"{d}/in/{part}")

        def drain():
            src = spark.readStream.schema(
                "url string, host string, ts timestamp, failed boolean"
            ).option("pathGlobFilter", "*.parquet").parquet(f"{d}/in/*")
            q = (stream_host_health(src, rate_micro=500_000,
                                    min_fetches=100, max_trailing=5)
                 .writeStream.format("parquet")
                 .option("path", f"{d}/out")
                 .option("checkpointLocation", f"{d}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return spark.read.parquet(f"{d}/out").collect()

        # batch 1: outage host fails 3x; flaky host fails then recovers
        write([(f"http://o.test/{i}", "o.test",
                f"2024-01-01 00:00:0{i}", True) for i in range(3)]
              + [("http://f.test/1", "f.test", "2024-01-01 00:00:00", True),
                 ("http://f.test/2", "f.test", "2024-01-01 00:00:01", False)],
              "b1")
        out1 = {r["host"]: r.asDict() for r in drain()}
        assert out1["o.test"]["trailing_failures"] == 3
        assert not out1["o.test"]["tripped"]  # not yet 5
        assert out1["f.test"]["trailing_failures"] == 0  # reset by success

        # batch 2: outage continues -> trailing reaches 5 ACROSS batches
        write([(f"http://o.test/x{i}", "o.test",
                f"2024-01-01 00:01:0{i}", True) for i in range(2)], "b2")
        out2 = [r.asDict() for r in drain() if r["host"] == "o.test"]
        latest = max(out2, key=lambda r: r["n_fetches"])
        assert latest["n_fetches"] == 5
        assert latest["trailing_failures"] == 5
        assert latest["trip_reason"] == "trailing_failures"
        # 100% error rate but n < min_fetches=100: rate rule stays quiet
        assert latest["n_errors"] == 5


def test_stream_blocklist_gate(spark):
    """Streaming candidates gate against the broadcast domain blocklist:
    a listed domain blocks itself and every subdomain; others pass."""
    from linkinator_spark.streaming.frontier_stream import (
        stream_blocklist_gate,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [
            ("http://ads.bad.test/x", "2024-01-01 00:00:00"),
            ("http://bad.test/y", "2024-01-01 00:00:01"),
            ("http://notbad.test/z", "2024-01-01 00:00:02"),
            ("http://good.test/w", "2024-01-01 00:00:03"),
        ]
        df = spark.createDataFrame(rows, "url string, ts_s string").select(
            "url", F.to_timestamp("ts_s").alias("ts"))
        df.write.parquet(f"{d}/in")
        rules = spark.createDataFrame([("bad.test",)], "domain string")
        stream = stream_blocklist_gate(
            stream_candidates(spark, f"{d}/in"), rules)
        run_available_now(stream, f"{d}/ckpt")
        out = {r["url"]: r["blocked"]
               for r in spark.sql("select * from stream_out").collect()}
        assert out == {
            "http://ads.bad.test/x": 1,
            "http://bad.test/y": 1,
            "http://notbad.test/z": 0,  # suffix-set, not substring
            "http://good.test/w": 0,
        }
