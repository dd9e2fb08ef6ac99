"""Local-path mode: glob seed expansion + the static file server as data.

Mirrors the reference's headline `npx linkinator ./docs --recurse` flow:

* `process_local_paths` — glob expansion relative to serverRoot, the
  http/local mix guards, serverRoot inference and syntheticServerRoot
  bookkeeping, and markdown autoscan
  (/root/reference/src/options.ts:58-190).
* `serve_directory` — the static web server's behavior, derived as a
  `pages` + `documents` table pair from a directory tree
  (/root/reference/src/server.ts:34-196): per-file 200s, trailing-slash
  301s for directories, index.html serving, optional directory listings,
  cleanUrls `.html` aliasing, markdown-as-html, and a host-wide 404
  default for anything else (reference `return404`).
* `map_url_expr` — the P6 display mapping back from synthetic URLs to
  local paths (/root/reference/src/index.ts:1148-1176).

Spark-first shape: the tree is scanned with the distributed `binaryFile`
reader (one task per file batch — a 10M-file docs corpus scans in
parallel), and every server behavior is derived with DataFrame ops from
that one scan; nothing is read on the driver.
"""

from __future__ import annotations

import glob as _glob
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from linkinator_spark.config import CheckOptions
from linkinator_spark.functions.urls import url_host_py

# path quoting for synthetic URLs: primary form matches what
# functions.urls.canonicalize produces for a raw link to the same name
# (spaces/% encoded, sub-delims kept); the ALIAS form percent-encodes the
# sub-delims too, modeling the server's decodeURIComponent — a link to
# "funky%2Bpath.html" and one to "funky+path.html" both reach the file
# funky+path.html (reference test/fixtures/urlpatterns,
# src/server.ts:77-80 pathParts decodeURIComponent)
_PRIMARY_SAFE = "/:@!$&'()*+,;=~[]-._"
_ALIAS_SAFE = "/~[]-._"


def _quote_udf(safe: str):
    from urllib.parse import quote

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def q(rel: pd.Series) -> pd.Series:
        return rel.map(lambda r: quote(r, safe=safe))

    return q

# deterministic synthetic origin (the reference binds an ephemeral port on
# 127.0.0.1 and strips it back out of reports via mapUrl; with scripted
# tables the port never exists, so any fixed value works)
STATIC_SERVER_BASE = "http://127.0.0.1:5050"


def server_base(cfg: CheckOptions) -> str:
    """Synthetic static-server origin; honors `cfg.port` (reference
    options.ts:15 — a user-pinned server port appears in every synthetic
    URL exactly as the real bound port would)."""
    return f"http://127.0.0.1:{cfg.port}" if cfg.port else STATIC_SERVER_BASE


def is_url_path(p: str) -> bool:
    return p.startswith("http")


def process_local_paths(cfg: CheckOptions) -> CheckOptions:
    """Expand globs + infer server root, returning an updated copy of `cfg`
    whose `paths` are synthetic URLs (reference src/options.ts:58-190 +
    src/index.ts:223-250). Raises on mixed path types, serverRoot+http,
    empty paths, and globs matching nothing — the reference's messages."""
    import dataclasses

    if not cfg.paths:
        raise ValueError("At least one path must be provided")
    url_flags = {is_url_path(p) for p in cfg.paths}
    if len(url_flags) > 1:
        raise ValueError(
            "Paths cannot be mixed between HTTP and local filesystem paths.")
    if url_flags == {True}:
        if cfg.server_root:
            raise ValueError(
                "'serverRoot' cannot be defined when the 'path' points to an "
                "HTTP endpoint.")
        return cfg

    server_root = os.path.normpath(cfg.server_root) if cfg.server_root else None

    # glob expansion relative to serverRoot (src/options.ts:117-154)
    paths: list[str] = []
    for p in cfg.paths:
        full = os.path.join(server_root, p) if server_root else p
        expanded = sorted(_glob.glob(full, recursive=True))
        if not expanded:
            raise ValueError(
                f'The provided glob "{p}" returned 0 results. The current '
                f'working directory is "{os.getcwd()}".')
        for e in expanded:
            e = os.path.normpath(e)
            if server_root:
                parts = [x for x in e.split(os.sep) if x]
                skip = len([x for x in server_root.split(os.sep) if x])
                paths.append(os.sep.join(parts[skip:]))
            else:
                paths.append(e)

    # markdown autoscan (src/options.ts:156-163)
    markdown = cfg.markdown
    if any(os.path.splitext(p)[1].lower() in (".md", ".mdx") for p in paths):
        markdown = True

    # serverRoot inference (src/options.ts:165-187)
    synthetic_root = cfg.synthetic_server_root
    if not server_root:
        if len(paths) > 1:
            server_root = os.getcwd()
        else:
            only = paths[0]
            if os.path.isfile(only):
                server_root = os.path.dirname(only) or "."
                paths = [os.path.basename(only)]
            else:
                server_root = only
                paths = ["/"]
            synthetic_root = server_root

    # path -> synthetic URL (src/index.ts:240-246), quoted like a raw link
    # to the same name would canonicalize
    from urllib.parse import quote

    base = server_base(cfg)
    urls = [
        base + "/"
        + quote(p.replace(os.sep, "/").lstrip("/"), safe=_PRIMARY_SAFE)
        for p in paths
    ]
    return dataclasses.replace(
        cfg,
        paths=urls,
        markdown=markdown,
        server_root=server_root,
        synthetic_server_root=synthetic_root,
        static_http_server_host=base + "/",
    )


_EXT_KIND = {"html": "html", "htm": "html", "md": "markdown",
             "mdx": "markdown", "markdown": "markdown", "css": "css"}
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "css": "text/css",
    "md": "text/markdown", "mdx": "text/markdown",
    "markdown": "text/markdown", "txt": "text/plain", "json":
    "application/json", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "png": "image/png", "gif": "image/gif", "svg": "image/svg+xml",
    "js": "text/javascript", "pdf": "application/pdf",
}


def serve_directory(
    spark: SparkSession, server_root: str, cfg: CheckOptions,
) -> tuple[DataFrame, DataFrame]:
    """(pages, documents) scripted tables for the static server over
    `server_root` — the reference server's behaviors as data
    (src/server.ts:71-196). Distributed: one binaryFile scan, everything
    else is column ops + small aggregations."""
    root_abs = os.path.abspath(server_root)
    base = server_base(cfg)
    host = url_host_py(base + "/")

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root_abs)
        .select("path", "content")
    )
    marker = root_abs.rstrip("/") + "/"
    rel = F.col("path").substr(
        F.locate(marker, F.col("path")) + F.lit(len(marker)),
        F.lit(1 << 20),
    )
    ext = F.lower(F.regexp_extract(rel, r"\.([A-Za-z0-9]+)$", 1))
    kind = _map_lookup(ext, _EXT_KIND, default=None)
    mime = _map_lookup(ext, _EXT_MIME, default="application/octet-stream")
    # markdown option: .md served as rendered html (src/server.ts:147-165);
    # the crawler's markdown spans handle the rendering (E11)
    serve_kind = kind
    serve_mime = mime
    if cfg.markdown:
        is_md = kind == F.lit("markdown")
        serve_mime = F.when(is_md, F.lit("text/html; charset=UTF-8")).otherwise(mime)

    _q = _quote_udf(_PRIMARY_SAFE)
    _qa = _quote_udf(_ALIAS_SAFE)
    f = files.select(
        rel.alias("rel"),
        F.concat(F.lit(base + "/"), _q(rel)).alias("url"),
        F.concat(F.lit(base + "/"), _qa(rel)).alias("url_alias"),
        serve_kind.alias("kind"),
        serve_mime.alias("ct"),
        F.col("content").cast("string").alias("text"),
    ).localCheckpoint(eager=True)

    # ---- documents: one doc per text-kind file
    file_docs = f.filter(F.col("kind").isNotNull()).select(
        F.col("url").alias("doc_id"),
        F.array(F.struct(
            F.col("kind").alias("kind"), F.col("text").alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
        )).alias("spans"),
    )

    # ---- per-file 200 rows (plus the encoded-alias spelling when distinct)
    def _file_rows(url_col):
        return f.select(
            F.col(url_col).alias("url"),
            F.col("ct").alias("content_type"),
            F.when(F.col("kind").isNotNull(), F.col("url"))
            .otherwise(F.lit("")).alias("body_doc_id"),
            F.lit(200).alias("status"),
            F.lit(None).cast("string").alias("location"),
        )

    file_pages = _file_rows("url").unionByName(
        f.filter(F.col("url_alias") != F.col("url"))
        .select("url_alias", "ct", "kind", "url")
        .select(
            F.col("url_alias").alias("url"),
            F.col("ct").alias("content_type"),
            F.when(F.col("kind").isNotNull(), F.col("url"))
            .otherwise(F.lit("")).alias("body_doc_id"),
            F.lit(200).alias("status"),
            F.lit(None).cast("string").alias("location"),
        )
    )

    # ---- (dir, child) pairs at every depth; dirs include "" (the root)
    segs = F.split(F.col("rel"), "/")
    pairs = (
        f.select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size(segs)),
            lambda k: F.struct(
                F.array_join(F.slice(segs, 1, k - 1), "/").alias("dir"),
                F.element_at(segs, k).alias("child"),
            ),
        )).alias("p"))
        .select("p.dir", "p.child").distinct()
    )
    dirs = pairs.select("dir").distinct()

    # trailing-slash 301 for every non-root directory (src/server.ts:100-116)
    redirect_pages = dirs.filter(F.col("dir") != "").select(
        F.concat(F.lit(base + "/"), _q(F.col("dir"))).alias("url"),
        F.lit("").alias("content_type"),
        F.lit("").alias("body_doc_id"),
        F.lit(301).alias("status"),
        F.concat(F.lit(base + "/"), _q(F.col("dir")), F.lit("/"))
        .alias("location"),
    )

    # directory-slash URLs: index.html > listing (if enabled) > 404
    dir_url = F.when(F.col("dir") == "", F.lit(base + "/")).otherwise(
        F.concat(F.lit(base + "/"), _q(F.col("dir")), F.lit("/")))
    index_rel = F.when(F.col("dir") == "", F.lit("index.html")).otherwise(
        F.concat(F.col("dir"), F.lit("/index.html")))
    with_index = dirs.join(
        f.select(F.col("rel").alias("_ir"), F.col("url").alias("_idoc")),
        index_rel == F.col("_ir"), "left",
    )
    indexed = with_index.filter(F.col("_idoc").isNotNull()).select(
        dir_url.alias("url"),
        F.lit("text/html").alias("content_type"),
        F.col("_idoc").alias("body_doc_id"),
        F.lit(200).alias("status"),
        F.lit(None).cast("string").alias("location"),
    )
    unindexed = with_index.filter(F.col("_idoc").isNull()).select("dir")
    if cfg.directory_listing:
        # <li><a> listing of readdir entries (src/server.ts:172-184)
        listing_html = F.concat(
            F.lit("<html><body><ul>"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list("child")),
                lambda c: F.concat(F.lit('<li><a href="'), c, F.lit('">'),
                                   c, F.lit("</a></li>")),
            ), "\r\n"),
            F.lit("</ul></body></html>"),
        )
        listings = (
            unindexed.join(pairs, "dir")
            .groupBy("dir").agg(listing_html.alias("html"))
            .select(
                dir_url.alias("url"),
                F.lit("text/html").alias("ct"),
                F.col("html"),
            )
        )
        listing_docs = listings.select(
            F.col("url").alias("doc_id"),
            F.array(F.struct(
                F.lit("html").alias("kind"), F.col("html").alias("text"),
                F.lit("").alias("media_ref"), F.lit(0).alias("offset"),
            )).alias("spans"),
        )
        listing_pages = listings.select(
            "url", F.col("ct").alias("content_type"),
            F.col("url").alias("body_doc_id"),
            F.lit(200).alias("status"),
            F.lit(None).cast("string").alias("location"),
        )
    else:
        # a bare directory URL with no index 404s (src/server.ts:139-142)
        listing_docs = None
        listing_pages = unindexed.select(
            dir_url.alias("url"),
            F.lit("text/plain; charset=UTF-8").alias("content_type"),
            F.lit("").alias("body_doc_id"),
            F.lit(404).alias("status"),
            F.lit(None).cast("string").alias("location"),
        )

    parts = [file_pages, redirect_pages, indexed, listing_pages]

    # cleanUrls: extensionless alias of every .html file unless a real
    # file/dir claims the name (src/server.ts:118-143)
    if cfg.clean_urls:
        clean = (
            f.filter(F.col("rel").endswith(".html"))
            .select(
                F.expr("substring(rel, 1, length(rel) - 5)").alias("crel"),
                F.col("url").alias("doc"),
            )
            .join(f.select(F.col("rel").alias("crel")), "crel", "left_anti")
            .join(dirs.select(F.col("dir").alias("crel")), "crel", "left_anti")
            .select(
                F.concat(F.lit(base + "/"), _q(F.col("crel"))).alias("url"),
                F.lit("text/html; charset=UTF-8").alias("content_type"),
                F.col("doc").alias("body_doc_id"),
                F.lit(200).alias("status"),
                F.lit(None).cast("string").alias("location"),
            )
        )
        parts.append(clean)

    behaviors = parts[0]
    for p in parts[1:]:
        behaviors = behaviors.unionByName(p)

    pages = (
        behaviors
        .select(
            "url",
            F.lit(host).alias("host"),
            F.explode(F.array(F.lit("GET"), F.lit("HEAD"))).alias("method"),
            F.lit(1).alias("attempt"),
            "status",
            F.when(
                F.col("location").isNotNull(),
                F.create_map(F.lit("content-type"), F.col("content_type"),
                             F.lit("location"), F.col("location")),
            ).otherwise(
                F.create_map(F.lit("content-type"), F.col("content_type"))
            ).alias("headers"),
            "content_type",
            "body_doc_id",
            F.lit(None).cast("string").alias("final_url"),
        )
    )
    documents = file_docs if listing_docs is None else file_docs.unionByName(
        listing_docs)
    return (pages.localCheckpoint(eager=True),
            documents.localCheckpoint(eager=True))


def host_defaults_for(spark: SparkSession, cfg: CheckOptions) -> DataFrame | None:
    """One (host, 404) default row when a local static server is modeled:
    any un-scripted URL on the server host is a 404, not a network error
    (reference return404, src/server.ts:191-196)."""
    if not cfg.static_http_server_host:
        return None
    return spark.createDataFrame(
        [(url_host_py(cfg.static_http_server_host),
          404, "text/plain; charset=UTF-8")],
        "host string, d_status int, d_content_type string",
    )


def map_url_expr(col: Column, cfg: CheckOptions) -> Column:
    """P6 mapUrl (reference src/index.ts:1148-1176): strip the synthetic
    server origin and re-join the original filesystem root for display."""
    basep = cfg.static_http_server_host
    if not basep:
        return col
    stripped = col.substr(F.lit(len(basep) + 1), F.lit(1 << 20))
    if cfg.synthetic_server_root:
        root = cfg.synthetic_server_root.rstrip("/")
        mapped = F.concat(F.lit(root + "/"), stripped)
        # path.join collapses the trailing separator when the remainder is
        # empty: the root page displays as the root itself
        mapped = F.when(stripped == "", F.lit(root)).otherwise(mapped)
    else:
        mapped = F.when(stripped == "", F.lit("./")).otherwise(stripped)
    return F.when(col.startswith(basep), mapped).otherwise(col)


def _map_lookup(col: Column, table: dict, default):
    expr = F.lit(default).cast("string")
    out = None
    for k, v in table.items():
        branch = (col == F.lit(k), F.lit(v))
        out = F.when(*branch) if out is None else out.when(*branch)
    return out.otherwise(expr)
