"""CLI — mirrors the reference's flag surface (src/cli.ts:18-176) in
test/offline mode: the web is a scripted pages+documents parquet pair
instead of the live network.

    python -m linkinator_spark.cli http://seed/ \
        --pages pages.parquet --documents docs.parquet \
        --recurse --format csv --output out/

Config-file merge semantics follow the reference (CLI wins,
src/config.ts:38-61).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="linkinator-spark")
    p.add_argument("paths", nargs="+",
                   help="seed URLs, or local paths/globs (served like the "
                        "reference's static server)")
    p.add_argument("--pages", help="scripted pages parquet (URL seeds only)")
    p.add_argument("--documents", help="span documents parquet (URL seeds only)")
    p.add_argument("--server-root", default=None,
                   help="root dir for local-path mode (reference --server-root)")
    p.add_argument("--directory-listing", action="store_true", default=None)
    p.add_argument("--clean-urls", action="store_true", default=None)
    p.add_argument("--config", help="JSON config file (CLI flags win)")
    p.add_argument("--concurrency", type=int, default=100)
    p.add_argument("--recurse", "-r", action="store_true", default=None)
    p.add_argument("--skip", "-s", action="append", default=None,
                   help="regex of URLs to skip (repeatable / space-comma split)")
    p.add_argument("--fragments-to-skip", action="append", default=None)
    p.add_argument("--timeout", type=int, default=None)
    p.add_argument("--retry", action="store_true", default=None)
    p.add_argument("--retry-errors", action="store_true", default=None)
    p.add_argument("--retry-errors-count", type=int, default=None)
    p.add_argument("--retry-errors-jitter", type=int, default=None)
    p.add_argument("--redirects", choices=["allow", "warn", "error"], default=None)
    p.add_argument("--require-https", choices=["off", "warn", "error"], default=None)
    p.add_argument("--check-css", action="store_true", default=None)
    p.add_argument("--check-fragments", action="store_true", default=None)
    p.add_argument("--status-codes", action="append", default=None,
                   help="CODE:ACTION pairs, e.g. 404:skip 4xx:warn")
    p.add_argument("--url-rewrite-search", default=None)
    p.add_argument("--url-rewrite-replace", default=None)
    p.add_argument("--markdown", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--allow-insecure-certs", action="store_true", default=None)
    p.add_argument("--header", action="append", default=None,
                   help='extra request header, "Name: value" (repeatable)')
    p.add_argument("--port", type=int, default=None,
                   help="pin the modeled static-server port")
    p.add_argument("--silent", action="store_true")
    p.add_argument("--format", choices=["text", "json", "csv"], default="text")
    p.add_argument("--output", help="output dir for csv/json formats")
    p.add_argument("--verbosity", default=None,
                   choices=["DEBUG", "INFO", "WARNING", "ERROR", "NONE"])
    p.add_argument("--respect-robots", action="store_true", default=None)
    p.add_argument("--user-agent", default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None)
    return p


def _split_list(values: list[str] | None) -> list[str] | None:
    """Reference splits skip values on whitespace/comma (src/cli.ts:363-390)."""
    if values is None:
        return None
    import re

    out: list[str] = []
    for v in values:
        out.extend(x for x in re.split(r"[\s,]+", v) if x)
    return out


def _parse_status_codes(values: list[str] | None) -> dict:
    """CODE:ACTION parsing (src/cli.ts:401-437)."""
    out: dict[str, str] = {}
    for v in values or []:
        for pair in v.split(","):
            pair = pair.strip()
            if not pair:
                continue
            code, _, action = pair.partition(":")
            if action not in ("ok", "warn", "skip", "error"):
                raise SystemExit(f"invalid status code action: {pair}")
            out[code.strip()] = action
    return out


def _parse_headers(values: list[str] | None) -> dict | None:
    """--header "Name: value" pairs (reference src/cli.ts:220-233)."""
    if not values:
        return None
    out: dict[str, str] = {}
    for item in values:
        name, colon, value = item.partition(":")
        # empty name or empty value are rejected like the reference
        # (test/test.cli.ts header validation); a colon IN the value is
        # fine — only the first one splits
        if not colon or not name.strip() or not value.strip():
            raise SystemExit(
                f'Invalid header format: "{item}". '
                'Use "Header-Name:value" format.')
        out[name.strip()] = value.strip()
    return out


def resolve_verbosity(args: argparse.Namespace) -> str:
    """--silent is verbosity=ERROR; mixing both is an error
    (reference src/cli.ts:607-620)."""
    if args.silent and args.verbosity:
        raise SystemExit(
            "The SILENT and VERBOSITY flags cannot both be defined. "
            "Please consider using VERBOSITY only.")
    if args.silent:
        return "ERROR"
    return args.verbosity or "WARNING"


def merge_config(args: argparse.Namespace) -> dict:
    """config file ⊕ CLI, CLI wins (src/config.ts:50-60)."""
    cfg: dict = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
    cli = {
        "concurrency": args.concurrency,
        "recurse": args.recurse,
        "links_to_skip": _split_list(args.skip),
        "fragments_to_skip": _split_list(args.fragments_to_skip),
        "retry": args.retry,
        "retry_errors": args.retry_errors,
        "retry_errors_count": args.retry_errors_count,
        "retry_errors_jitter": args.retry_errors_jitter,
        "redirects": args.redirects,
        "require_https": args.require_https,
        "check_css": args.check_css,
        "check_fragments": args.check_fragments,
        "status_codes": _parse_status_codes(args.status_codes) or None,
        "respect_robots": args.respect_robots,
        "user_agent": args.user_agent,
        "checkpoint_dir": args.checkpoint_dir,
        "server_root": args.server_root,
        "directory_listing": args.directory_listing,
        "clean_urls": args.clean_urls,
        "markdown": args.markdown,
        "insecure": args.allow_insecure_certs,
        "headers": _parse_headers(args.header),
        "port": args.port,
        "timeout": args.timeout,
    }
    for k, v in cli.items():
        if v is not None:
            cfg[k] = v
    if args.url_rewrite_search and args.url_rewrite_replace:
        cfg["url_rewrite"] = [(args.url_rewrite_search, args.url_rewrite_replace)]
    return cfg


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from linkinator_spark.config import CheckOptions
    from linkinator_spark.operators.crawler import LinkChecker
    from linkinator_spark.session import get_spark
    from linkinator_spark.sources import sinks

    cfg_dict = merge_config(args)
    cfg_dict.pop("concurrency", None)  # parallelism comes from the cluster
    cfg = CheckOptions(paths=args.paths, **{
        k: v for k, v in cfg_dict.items()
        if k in CheckOptions.__dataclass_fields__
    })

    verbosity = resolve_verbosity(args)  # flag conflicts fail before work
    spark = get_spark(app_name="linkinator-spark-cli", master=args.master)

    t0 = time.time()
    if args.pages:
        pages = spark.read.parquet(args.pages)
        documents = spark.read.parquet(args.documents)
        result = LinkChecker(spark).check(cfg, pages, documents,
                                          resume=args.resume)
    elif all(p.startswith("http") for p in args.paths):
        # URL seeds without scripted tables: live-HTTP crawl
        # (reference `linkinator https://...`)
        from linkinator_spark.operators.crawler import check_live

        result = check_live(spark, cfg, resume=args.resume)
    else:
        # local-path mode: model the static server from the directory tree
        from linkinator_spark.operators.crawler import check_local

        result = check_local(spark, cfg, resume=args.resume)
    elapsed = time.time() - t0
    if args.format == "csv":
        sinks.write_csv(result.results, args.output, verbosity)
    elif args.format == "json":
        sinks.write_json(result.results, args.output, verbosity)
    else:
        print(sinks.text_report(result.results, verbosity, elapsed))

    # exit code semantics: passed ? 0 : 1 (src/cli.ts:446,578,589)
    return 0 if result.passed else 1


if __name__ == "__main__":
    sys.exit(main())
