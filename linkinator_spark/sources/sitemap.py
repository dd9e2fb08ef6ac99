"""Sitemap ingestion: robots.txt ``Sitemap:`` discovery, sitemapindex
resolution, and urlset parsing into frontier seed rows.

Reference parity: linkinator has no sitemap support — its seeds are CLI
paths/globs (`/root/reference/src/index.ts:241-262`); this is the
crawl-tier extension a web-scale frontier needs. Sitemaps are the
publisher-declared URL inventory (sitemaps.org protocol) and the standard
seeding + recrawl signal; RFC 9309 §2.3 reserves the ``Sitemap:`` line in
robots.txt for exactly this discovery hop.

Spark-first shape (100-TB lens): every stage is a JVM-side map + explode
— `regexp_extract_all` to frame the per-``<url>`` blocks, Hive `xpath_*`
to read fields — so parsing whole-stage-codegens with zero Python and
zero shuffles. The only join is sitemap-URL → sitemap-body during index
resolution: the body table is frontier-METADATA-scale (one row per
sitemap file, ~#hosts × a few), so it broadcasts below the threshold and
degrades to a uniform-key (url) shuffle hash join above it — never a
corpus-sized exchange.

XML handling notes (documented limits, exercised in tests):
- default-namespace declarations (`xmlns="…sitemap/0.9"`) are stripped
  before xpath — XPath 1.0 unprefixed names match only no-namespace
  elements, so the standard sitemap namespace would otherwise hide every
  element;
- a ``<url>`` block missing ``<priority>`` takes the protocol default
  0.5; missing ``<lastmod>`` stays NULL;
- CDATA sections are not unwrapped (rare in sitemaps; a loc inside CDATA
  surfaces verbatim with the markers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# protocol default when a <url> omits <priority> (sitemaps.org §XML format)
DEFAULT_PRIORITY_MICRO = 500_000

_XMLNS_RE = r'\s+xmlns(:[a-zA-Z0-9_-]+)?="[^"]*"'
_URL_BLOCK_RE = r"(?s)<url>.*?</url>"
_ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"


def _stripped(xml: Column) -> Column:
    return F.regexp_replace(xml, _XMLNS_RE, "")


def sitemap_urls_from_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url): every ``Sitemap:`` line in each robots.txt.

    Case-insensitive on the directive (RFC 9309 lines are), one row per
    declared sitemap, duplicates within a host deduplicated. Pure
    map + explode + per-host distinct — codegen end to end.
    """
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(_ROBOTS_SITEMAP_RE), 1)
                )
            ).alias("sitemap_url"),
        )
    )


def parse_urlsets(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml",
) -> DataFrame:
    """Parse ``<urlset>`` bodies → (sitemap_url, loc, lastmod,
    priority_micro).

    Each ``<url>`` block is framed with a non-greedy regexp and read with
    `xpath_string` (the block is a well-formed XML fragment), so field
    alignment is per-entry — a whole-document xpath of ``//url/loc`` vs
    ``//url/priority`` would silently mis-align entries that omit
    optional fields. priority is fixed-point micro (int) so the value
    check is float-free; absent → 0.5 per the protocol.
    """
    from linkinator_spark.functions.partitioning import spread_small_scan

    blk = F.explode(
        F.regexp_extract_all(_stripped(F.col(xml_col)),
                             F.lit(_URL_BLOCK_RE), 0)).alias("_blk")
    # spread the exploded blocks before the per-entry xpath triple: the
    # parallelism of the raw frame is the sitemap FILE count (often a
    # handful), while entries number in the tens of thousands
    raw = spread_small_scan(
        sitemaps.select(F.col(url_col).alias("sitemap_url"), blk))
    loc = F.expr("xpath_string(_blk, 'url/loc')")
    lastmod = F.expr("xpath_string(_blk, 'url/lastmod')")
    pri = F.expr("xpath_string(_blk, 'url/priority')")
    return raw.select(
        "sitemap_url",
        loc.alias("loc"),
        F.nullif(lastmod, F.lit("")).alias("lastmod"),
        F.coalesce(
            F.round(F.nullif(pri, F.lit("")).cast("double") * 1e6)
            .cast("long"),
            F.lit(DEFAULT_PRIORITY_MICRO).cast("long"),
        ).alias("priority_micro"),
    ).filter(F.col("loc") != "")


def parse_index_edges(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml",
) -> DataFrame:
    """Parse ``<sitemapindex>`` bodies → (parent_url, child_url)."""
    children = F.expr(
        "xpath(_x, '//sitemapindex/sitemap/loc/text()')")
    return (
        sitemaps.select(F.col(url_col).alias("parent_url"),
                        _stripped(F.col(xml_col)).alias("_x"))
        .select("parent_url", F.explode(children).alias("child_url"))
    )


def resolve_sitemaps(
    robots: DataFrame, bodies: DataFrame,
    host_col: str = "host", robots_text_col: str = "robots_txt",
    url_col: str = "sitemap_url", xml_col: str = "xml",
    max_index_depth: int = 3,
) -> DataFrame:
    """robots.txt discovery → index resolution → urlset parse, end to end.

    Output: (host, loc, lastmod, priority_micro, sitemap_url) — one row
    per declared page URL, tagged with the urlset file that declared it
    and the host whose robots.txt led there.

    Index files may nest (`sitemapindex` → `sitemapindex`) up to
    `max_index_depth` hops — a driver loop over DataFrame joins, one
    level per hop, matching the bounded-hop discipline of the redirect
    resolver (operators/fetch.py). Bodies the discovery never reaches
    are never parsed; discovered URLs missing from `bodies` drop out
    (an unfetched sitemap contributes nothing).
    """
    bodies = bodies.select(F.col(url_col).alias("_b_url"),
                           F.col(xml_col).alias("_b_xml"))
    # frontier of sitemap URLs to inspect, carrying the discovering host
    seeds = sitemap_urls_from_robots(
        robots, host_col=host_col, text_col=robots_text_col)
    frontier = seeds
    urlset_rows = None
    for _ in range(max_index_depth):
        fetched = frontier.join(
            F.broadcast(bodies),
            frontier["sitemap_url"] == bodies["_b_url"], "inner")
        is_index = F.col("_b_xml").contains("<sitemapindex")
        urlsets = fetched.filter(~is_index).select(
            "host", "sitemap_url", F.col("_b_xml").alias("xml"))
        parsed = parse_urlsets(urlsets, "sitemap_url", "xml").join(
            urlsets.select("host", "sitemap_url").distinct(),
            "sitemap_url")
        urlset_rows = parsed if urlset_rows is None \
            else urlset_rows.unionByName(parsed)
        indexes = fetched.filter(is_index).select(
            "host", "sitemap_url", F.col("_b_xml").alias("xml"))
        nxt = parse_index_edges(indexes, "sitemap_url", "xml").join(
            indexes.select("host", "sitemap_url").withColumnRenamed(
                "sitemap_url", "parent_url").distinct(),
            "parent_url").select(
            "host", F.col("child_url").alias("sitemap_url"))
        frontier = nxt
    return urlset_rows.select(
        "host", "loc", "lastmod", "priority_micro", "sitemap_url")
