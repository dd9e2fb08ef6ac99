"""Seeded random-input twin fuzz for the session's codegen string
operators: the Spark expression and its DuckDB SQL twin must agree
byte-for-byte on arbitrary adversarial inputs, not just the curated
fixtures — the same discipline the robots/retry-after twins get.

One Spark job per operator (all cases in one DataFrame), exact
agreement required. Generators bias toward the nasty cases: unicode
junk adjacent to ASCII, empty/whitespace-only strings, '?'/'&'/'='
soup in URLs, params that merely LOOK like trackers.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from linkinator_spark.functions import normalize as NM
from linkinator_spark.functions.urls import (
    strip_tracking_params, strip_tracking_sql,
)

_JUNK = ["“", "”", "‘", "’", "—", "–",
         "…", " ", " ", "​", "　", "\t", "\n",
         " ", "\x07", "\x1b", "\x0b", "a", "B", "7", ".", "!", "-",
         "café", "word", "−"]


def _rand_text(rng: random.Random) -> str:
    return "".join(rng.choice(_JUNK)
                   for _ in range(rng.randrange(0, 40)))


def test_clean_text_twin_fuzz(spark):
    rng = random.Random(4242)
    texts = [_rand_text(rng) for _ in range(600)]
    texts += ["", " ", "\n\n\n", "  ", "\x07"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["c"] for r in
           df.select("i", NM.clean_text(F.col("t")).alias("c")).collect()}
    con = duckdb.connect()
    con.register("tt", pd.DataFrame({"i": range(len(texts)), "t": texts}))
    want = dict(con.execute(
        f"select i, {NM.clean_text_sql('t')} from tt").fetchall())
    assert got == want
    # idempotence on every fuzzed output
    df2 = spark.createDataFrame(
        [(i, c) for i, c in got.items()], "i long, t string")
    again = {r["i"]: r["c"] for r in
             df2.select("i", NM.clean_text(F.col("t")).alias("c"))
                .collect()}
    assert again == got


_PARAM_NAMES = ["utm_source", "utm_x", "utmx", "fbclid", "gclid", "id",
                "q", "ref_src", "xref_src", "spm", "spmx", "keep",
                "utm_", "UTM_SOURCE", "_ga", "_gab", "mc_eid"]


def _rand_url(rng: random.Random) -> str:
    base = f"http://h{rng.randrange(5)}.x/p{rng.randrange(9)}"
    if rng.random() < 0.2:
        return base
    n = rng.randrange(0, 5)
    parts = []
    for _ in range(n):
        name = rng.choice(_PARAM_NAMES)
        style = rng.random()
        if style < 0.25:
            parts.append(name)                      # bare name
        elif style < 0.5:
            parts.append(f"{name}=")                # empty value
        else:
            parts.append(f"{name}=v{rng.randrange(100)}")
    if rng.random() < 0.15:
        parts.append("")                            # stray '&'
    return base + "?" + "&".join(parts)


def test_strip_tracking_twin_fuzz(spark):
    rng = random.Random(777)
    urls = [_rand_url(rng) for _ in range(600)]
    urls += ["http://a.x/p?", "http://a.x/p?&", "http://a.x/p?&&",
             "http://a.x/p?utm_source=a&utm_source=b"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, u string")
    got = {r["i"]: r["s"] for r in
           df.select("i", strip_tracking_params("u").alias("s")).collect()}
    con = duckdb.connect()
    con.register("uu", pd.DataFrame({"i": range(len(urls)), "u": urls}))
    want = dict(con.execute(
        f"select i, {strip_tracking_sql('u')} from uu").fetchall())
    assert got == want
    # invariants: base URL never changes; case-sensitive names survive
    for i, u in enumerate(urls):
        assert got[i].split("?")[0] == u.split("?")[0]
        assert "UTM_SOURCE" not in u or "UTM_SOURCE" in got[i]
    # idempotence
    df2 = spark.createDataFrame(
        [(i, s) for i, s in got.items()], "i long, u string")
    again = {r["i"]: r["s"] for r in
             df2.select("i", strip_tracking_params("u").alias("s"))
                .collect()}
    assert again == got
