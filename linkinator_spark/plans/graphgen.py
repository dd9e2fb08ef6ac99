"""Deterministic web-graph derivation from the `documents` test table.

The driver's correctness harness compares Spark queries against DuckDB SQL on
the same parquet — so the crawl queries need a link graph both engines can
derive with identical arithmetic. Node i (doc_id) gets:

    url(i)    = 'http://corpus.test/'           if i == 0 (the seed/root)
                'http://corpus.test/p/{i}'      otherwise
    status(i) = 404 if i>0 and i%17==0
                503 if i>0 and i%23==0 (and not already 404)
                200 otherwise
    links(i)  = {(7i+1)%n, (13i+3)%n, (31i+11)%n}   (n = doc count)

Only 200-status pages have crawlable bodies; a BFS from node 0 with
fetch-once dedup is then expressible both as our wave engine and as a
recursive CTE in DuckDB (`bfs_oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOST = "corpus.test"
ROOT = f"http://{HOST}/"

LINK_MULTS = ((7, 1), (13, 3), (31, 11))


def url_expr(i):
    return F.when(i == 0, F.lit(ROOT)).otherwise(
        F.concat(F.lit(f"{ROOT}p/"), i.cast("string"))
    )


def url_sql(expr: str) -> str:
    return (
        f"case when {expr} = 0 then '{ROOT}' "
        f"else concat('{ROOT}p/', cast({expr} as varchar)) end"
    )


def status_expr(i):
    return (
        F.when((i > 0) & (i % 17 == 0), F.lit(404))
        .when((i > 0) & (i % 23 == 0), F.lit(503))
        .otherwise(F.lit(200))
    )


def status_sql(expr: str) -> str:
    return (
        f"case when {expr} > 0 and {expr} % 17 = 0 then 404 "
        f"when {expr} > 0 and {expr} % 23 = 0 then 503 else 200 end"
    )


def edges_df(documents: DataFrame) -> DataFrame:
    """(src, dst) over doc ids; one row per (node, link slot)."""
    n = documents.count()
    src = F.col("src")
    targets = F.array(*[(src * a + b) % n for a, b in LINK_MULTS])
    return (
        documents.select(F.col("doc_id").alias("src"))
        .select("src", F.explode(targets).alias("dst"))
    )


def edges_sql(n: int, docs_rel: str = "documents") -> str:
    slots = " union all ".join(
        f"select doc_id as src, (doc_id * {a} + {b}) % {n} as dst from {docs_rel}"
        for a, b in LINK_MULTS
    )
    return f"({slots})"


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """Scripted `pages` + span `documents` tables for the crawl engine, built
    entirely with JVM expressions (one pass over the doc table)."""
    n = documents.count()
    i = F.col("doc_id")
    targets = F.array(*[(i * a + b) % n for a, b in LINK_MULTS])
    body_html = F.aggregate(
        targets,
        F.lit(""),
        lambda acc, t: F.concat(
            acc, F.lit('<a href="'),
            F.when(t == 0, F.lit(ROOT)).otherwise(
                F.concat(F.lit(f"{ROOT}p/"), t.cast("string"))
            ),
            F.lit('">l</a>'),
        ),
    )
    base = documents.select(
        url_expr(i).alias("url"),
        status_expr(i).alias("status"),
        body_html.alias("body"),
    )
    docs = base.select(
        F.col("url").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("body").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    pages_one = base.select(
        "url",
        F.lit(HOST).alias("host"),
        F.lit(1).alias("attempt"),
        "status",
        F.create_map(F.lit("content-type"), F.lit("text/html")).alias("headers"),
        F.lit("text/html").alias("content_type"),
        F.when(F.col("status") == 200, F.col("url")).otherwise(F.lit("")).alias("body_doc_id"),
        F.lit(None).cast("string").alias("final_url"),
    )
    pages = pages_one.withColumn("method", F.lit("GET")).unionByName(
        pages_one.withColumn("method", F.lit("HEAD"))
    ).select("url", "host", "method", "attempt", "status", "headers",
             "content_type", "body_doc_id", "final_url")
    return pages, docs


def bfs_oracle_sql(n: int, max_wave: int = 30) -> str:
    """DuckDB recursive-CTE twin of the wave crawl over the derived graph.
    Returns (url, wave, status, state): min-wave reachability where only
    200-status nodes expand; non-200 nodes are reported BROKEN."""
    return f"""
with recursive
  ids as (select doc_id as id from documents),
  edges as (select src, dst from {edges_sql(n)} e),
  reach(id, wave) as (
    select 0, 0
    union
    select e.dst, r.wave + 1
    from reach r
    join edges e on e.src = r.id
    where r.wave < {max_wave}
      and ({status_sql('r.id')}) = 200
  ),
  first_seen as (select id, min(wave) as wave from reach group by id)
select
  {url_sql('id')} as url,
  wave,
  {status_sql('id')} as status,
  case when {status_sql('id')} = 200 then 'OK' else 'BROKEN' end as state
from first_seen
order by wave, url
"""


def redirect_target_sql(expr: str, n: "str | int") -> str:
    # `n` is spliced verbatim into the SQL text: callers pass either an int
    # literal or a SQL snippet (the redirect_resolve oracle passes
    # '(select n from n)'), so this is a string contract, not arithmetic.
    return (
        f"case when {expr} % 25 = 0 then {expr} + 1 "
        f"when {expr} % 125 = 120 then {expr} - 15 "
        f"when {expr} + 5 < {n} then {expr} + 5 else 1 end"
    )


def redirect_pages_from_documents(documents: DataFrame) -> DataFrame:
    """Scripted `pages` table with a deterministic redirect graph over doc
    ids: node i (i>0, i%5==0) 301-redirects to

        i+1    when i%25==0    (chain terminal: lands on a non-redirect)
        i-15   when i%125==120 (back-jump: a 4-cycle that exceeds the
                                reference's 20-redirect cap, index.ts
                                makeRequest loop)
        i+5    otherwise       (+5 chains, max 5 hops per 25-block)

    Non-redirect nodes carry the standard derived status (`status_expr`).
    Both engines (Spark resolver / DuckDB recursive CTE) can follow this
    with identical arithmetic — the S2 redirect machinery's value-checked
    oracle input."""
    n = documents.count()
    i = F.col("doc_id")
    is_redir = (i > 0) & (i % 5 == 0)
    tgt = (
        F.when(i % 25 == 0, i + 1)
        .when(i % 125 == 120, i - 15)
        .when(i + 5 < n, i + 5)
        .otherwise(F.lit(1))
    )
    base = documents.select(
        url_expr(i).alias("url"),
        F.when(is_redir, F.lit(301)).otherwise(status_expr(i)).alias("status"),
        F.when(is_redir, url_expr(tgt)).cast("string").alias("location"),
    )
    pages_one = base.select(
        "url",
        F.lit(HOST).alias("host"),
        F.lit(1).alias("attempt"),
        "status",
        F.when(
            F.col("location").isNotNull(),
            F.create_map(F.lit("content-type"), F.lit("text/html"),
                         F.lit("location"), F.col("location")),
        ).otherwise(
            F.create_map(F.lit("content-type"), F.lit("text/html"))
        ).alias("headers"),
        F.lit("text/html").alias("content_type"),
        F.lit("").alias("body_doc_id"),
        F.lit(None).cast("string").alias("final_url"),
    )
    return pages_one.withColumn("method", F.lit("GET")).unionByName(
        pages_one.withColumn("method", F.lit("HEAD"))
    ).select("url", "host", "method", "attempt", "status", "headers",
             "content_type", "body_doc_id", "final_url")
