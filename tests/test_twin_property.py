"""Property checks for the fused gear's python twins against the JVM
expressions they mirror — random inputs, exact agreement required.

These are the two twins whose logic is genuinely re-implemented (not
shared code) between the staged plan and the fully-fused gear:

* robots allow/disallow longest-prefix match: `robots.robots_allowed`
  (python) vs `robots.robots_filter` (JVM aggregate over rule arrays)
* retry-after parsing: `wave_fused.retry_after_seconds_py` vs
  `crawler.retry_after_seconds` (JVM regex/timestamp expressions)
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from linkinator_spark.operators.crawler import retry_after_seconds
from linkinator_spark.operators.robots import robots_allowed, robots_filter
from linkinator_spark.operators.wave_fused import retry_after_seconds_py


def _rand_rule(rng: random.Random) -> str:
    segs = rng.randrange(1, 4)
    r = "".join("/" + rng.choice(["a", "b", "priv", "tmp", "x1", ""])
                for _ in range(segs)) or "/"
    if rng.random() < 0.3:
        r += "*"
    return r


def test_robots_prefix_match_python_vs_jvm(spark):
    rng = random.Random(99)
    hosts = [f"h{i}.test" for i in range(12)]
    rules_rows, rules_map = [], {}
    for h in hosts[:9]:  # 3 hosts have NO rules row (must pass)
        dis = [_rand_rule(rng) for _ in range(rng.randrange(0, 4))]
        allow = [_rand_rule(rng) for _ in range(rng.randrange(0, 3))]
        rules_rows.append((h, dis, allow, None))
        rules_map[h] = (dis, allow)
    host_rules = spark.createDataFrame(
        rules_rows,
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay double")

    frontier_rows = []
    for i in range(400):
        h = rng.choice(hosts)
        path = "".join("/" + rng.choice(["a", "b", "priv", "tmp", "x1", "q"])
                       for _ in range(rng.randrange(1, 4)))
        frontier_rows.append((f"http://{h}{path}", h))
    frontier = spark.createDataFrame(frontier_rows, "url string, host string")

    allowed, disallowed = robots_filter(frontier, host_rules)
    jvm_allowed = {r["url"] for r in allowed.collect()}
    jvm_disallowed = {r["url"] for r in disallowed.collect()}
    assert jvm_allowed | jvm_disallowed == {u for u, _ in frontier_rows}

    import re
    for url, h in set(frontier_rows):
        rules = rules_map.get(h)
        path = re.sub(r"^https?://[^/]+", "", url)
        py_ok = rules is None or robots_allowed(path, rules[0], rules[1])
        assert py_ok == (url in jvm_allowed), (url, rules)


def test_retry_after_parse_python_vs_jvm(spark):
    rng = random.Random(41)
    samples = []
    for _ in range(60):
        n = rng.randrange(0, 120)
        m = rng.randrange(0, 9)
        samples.extend([
            str(n), f"{n}s", f"{m}m{n}s", f"{n}.5",
            f"Thu, 01 Jan 1970 00:{m:02d}:{n % 60:02d} GMT",
            f"Mon, 02 Feb 1970 10:{m:02d}:{n % 60:02d} GMT",
        ])
    samples.extend(["", "garbage", "12x", "m5s", "5m", "-3",
                    "Thu, 32 Jan 1970 00:00:01 GMT", None])
    for clock in (0.0, 7.25):
        df = spark.createDataFrame([(s,) for s in samples], "ra string")
        got = df.select(
            retry_after_seconds(F.col("ra"), clock).alias("d")).collect()
        for s, r in zip(samples, got):
            assert retry_after_seconds_py(s, clock) == r["d"], (s, clock)
