"""Link-state classification as a whole-stage-codegen CASE chain.

Re-creates the reference's classification precedence exactly
(/root/reference/src/index.ts:482-604):

  1. custom statusCodes action (exact pattern beats 4xx/5xx wildcard,
     index.ts:1339-1361)
  2. 999 bot-protection -> SKIPPED (index.ts:515-516)
  3. 403 + cf-mitigated header -> SKIPPED (index.ts:517-523)
  4. redirects='error' && 3xx -> BROKEN (index.ts:524-540)
  5. redirects='warn' -> warn event; 2xx OK; non-standard followed
     redirect with body OK (index.ts:541-567)
  6. default: 2xx OK; followed 3xx with body OK; else BROKEN (index.ts:569-576)
  7. requireHttps error/warn overlay for http:// URLs, local static server
     exempt (index.ts:578-604)

Everything here is built-in Spark expressions — no Python in the hot path, so
Catalyst folds the config into the generated code and the classifier costs a
single projection over the fetched-frontier table at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from linkinator_spark.config import CheckOptions, LinkState

# columns this module expects on the fetched-frontier DataFrame:
#   status INT (0 = network error / no response)
#   has_response BOOLEAN
#   has_body BOOLEAN
#   has_location BOOLEAN
#   final_url STRING (nullable; post-redirect URL)
#   cf_mitigated BOOLEAN
#   url STRING (original requested URL)


def _is_redirect(status: Column) -> Column:
    return (status >= 300) & (status < 400)


def _was_followed(status: Column, url: Column, final_url: Column, has_body: Column) -> Column:
    """detectRedirect.wasFollowed (index.ts:1370-1395)."""
    url_changed = final_url.isNotNull() & (final_url != url)
    return url_changed | (_is_redirect(status) & has_body)


def status_code_action(status: Column, status_codes: dict[str, str]) -> Column:
    """CASE chain from the statusCodes config map: exact keys first, then
    'Nxx' wildcards (matchesStatusCodePattern, index.ts:1314-1361)."""
    if not status_codes:
        return F.lit(None).cast("string")
    expr = F.lit(None).cast("string")
    # wildcards evaluated after every exact key (reference checks all exact
    # entries first via direct map lookup)
    for pattern, action in status_codes.items():
        if pattern.endswith("xx") and len(pattern) == 3:
            cond = F.floor(status / 100) == int(pattern[0])
            expr = F.when(expr.isNotNull(), expr).otherwise(
                F.when(cond, F.lit(action)).otherwise(F.lit(None))
            )
    exact = F.lit(None).cast("string")
    for pattern, action in status_codes.items():
        if not (pattern.endswith("xx") and len(pattern) == 3):
            exact = F.when(status == int(pattern), F.lit(action)).otherwise(exact)
    return F.coalesce(exact, expr)


def classify(df, cfg: CheckOptions):
    """Append `state`, `failure_detail`, and event-flag columns."""
    status = F.col("status")
    has_response = F.col("has_response")
    has_body = F.col("has_body")
    url = F.col("url")
    final_url = F.col("final_url")
    is_2xx = (status >= 200) & (status < 300)
    is_redir = _is_redirect(status)
    followed = _was_followed(status, url, final_url, has_body)
    action = status_code_action(status, cfg.status_codes)

    ok = F.lit(LinkState.OK)
    broken = F.lit(LinkState.BROKEN)
    skipped = F.lit(LinkState.SKIPPED)

    nonstandard_ok = is_redir & followed & has_body

    if cfg.redirects == "error":
        mode_state = F.when(is_redir, broken).otherwise(
            F.when(is_2xx, ok).otherwise(F.when(nonstandard_ok, ok).otherwise(broken))
        )
    else:  # 'warn' and 'allow' share success logic (index.ts:554-576)
        mode_state = F.when(is_2xx, ok).otherwise(
            F.when(nonstandard_ok, ok).otherwise(broken)
        )

    state = (
        F.when(action == "ok", ok)
        .when(action == "warn", ok)
        .when(action == "skip", skipped)
        .when(action == "error", broken)
        .when(status == 999, skipped)
        .when((status == 403) & F.col("cf_mitigated"), skipped)
        .otherwise(mode_state)
    )

    # requireHttps overlay (index.ts:578-604)
    is_http = url.startswith("http://")
    if cfg.static_http_server_host:
        is_http = is_http & ~url.startswith(cfg.static_http_server_host)
    if cfg.require_https == "error":
        state = F.when(is_http, broken).otherwise(state)

    if cfg.require_https == "error":
        https_detail = F.when(
            is_http,
            F.concat(F.lit("Error: HTTP link detected ("), url, F.lit(") but HTTPS is required")),
        ).otherwise(F.lit(None).cast("string"))
    else:
        https_detail = F.lit(None).cast("string")
    redirect_err_detail = F.when(
        F.lit(cfg.redirects == "error") & is_redir,
        F.concat(
            F.lit("Error: Redirect detected ("),
            url,
            F.when(F.col("location").isNotNull(), F.concat(F.lit(" to "), F.col("location"))).otherwise(F.lit("")),
            F.lit(") but redirects are disabled"),
        ),
    ).otherwise(F.lit(None).cast("string"))
    response_detail = F.when(
        (state == LinkState.BROKEN) & has_response,
        F.concat(F.lit("HttpResponse(status="), status.cast("string"), F.lit(")")),
    ).otherwise(F.lit(None).cast("string"))

    # fetch_failures is already ARRAY<STRING> (exceptions from the fetch stage)
    details = F.concat(
        F.coalesce(F.col("fetch_failures"), F.array().cast("array<string>")),
        F.array_compact(F.array(redirect_err_detail, response_detail, https_detail)),
    )

    return (
        df.withColumn("state", state)
        .withColumn("failure_details", details)
        .withColumn("event_status_warn", action == "warn")
        .withColumn(
            "event_redirect",
            F.lit(cfg.redirects == "warn") & (is_redir | followed),
        )
        .withColumn(
            "event_http_insecure",
            F.lit(cfg.require_https == "warn") & is_http,
        )
    )
