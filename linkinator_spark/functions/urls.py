"""URL canonicalization + hashing.

Re-creates the reference's WHATWG-URL-based link parsing (parseLink,
/root/reference/src/links.ts:220-232): resolve against a base, keep the
fragment-bearing form, split + percent-decode the fragment, and canonicalize
(lowercase scheme/host, drop default port, root path for empty http(s) path).
The fragmentless canonical href is the dedup key — the reference dedups its
URL-seen cache on `url.href` after `url.hash=''` (src/index.ts:813-817).

Driver/UDF side: plain-Python `parse_link` used inside Arrow-batched
extraction UDFs (vectorized at batch level — never a row-at-a-time Spark UDF).
Engine side: `url_hash` / `url_host` column helpers stay JVM-built-in.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}
# WHATWG strips ASCII tab/newline anywhere, and leading/trailing C0-or-space.
_CTRL_WS = re.compile(r"[\t\n\r]")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z\d+\-.]*:")
_WIN_PATH_RE = re.compile(r"^[a-zA-Z]:\\")


def is_absolute_url(url: str) -> bool:
    """RFC 3986 scheme test, excluding Windows drive paths.

    Reference: /root/reference/src/links.ts:193-202.
    """
    if _WIN_PATH_RE.match(url):
        return False
    return bool(_SCHEME_RE.match(url))


def _clean(raw: str) -> str:
    return _CTRL_WS.sub("", raw.strip())


def _ipv4_part(p: str):
    """WHATWG IPv4-number parser: decimal, 0x-hex, or leading-0 octal."""
    if re.fullmatch(r"0[xX][0-9a-fA-F]*", p):
        return int(p[2:] or "0", 16)
    if re.fullmatch(r"0[0-7]*", p):
        return int(p, 8)
    if re.fullmatch(r"[1-9][0-9]*", p):
        return int(p)
    return None


def _maybe_ipv4(host: str) -> str | None:
    """WHATWG IPv4 normalization: `0x7f.1` → 127.0.0.1, `2130706433` →
    127.0.0.1, `0177.0.0.1` → 127.0.0.1, `192.168.257` → 192.168.1.1
    (trailing part carries into the remaining bytes). Returns the dotted
    quad, or None when `host` is not a valid numeric IPv4 form (left
    as a domain then — verified against Node)."""
    parts = host.split(".")
    if parts and parts[-1] == "":
        parts = parts[:-1]
    if not parts or len(parts) > 4:
        return None
    vals = [_ipv4_part(p) for p in parts]
    if any(v is None for v in vals):
        return None
    addr = 0
    for v in vals[:-1]:
        if v > 255:
            return None
        addr = (addr << 8) + v
    rest_bytes = 4 - (len(vals) - 1)
    if vals[-1] >= 1 << (8 * rest_bytes):
        return None
    addr = (addr << (8 * rest_bytes)) + vals[-1]
    return ".".join(str((addr >> s) & 0xFF) for s in (24, 16, 8, 0))


def _idna_host(host: str) -> str:
    """WHATWG host parsing punycodes unicode hostnames (`new URL
    ('http://bücher.example/')` → ``xn--bcher-kva.example``, UTS #46
    non-transitional — verified against Node). Without this, the unicode
    and punycode spellings of one host would count as DIFFERENT URLs in
    the seen set, breaking URL-seen parity with the reference. ASCII
    hosts pass through untouched; per-label raw punycode is the fallback
    for labels UTS 46 rejects but WHATWG still encodes (emoji domains);
    a label that cannot be encoded at all is kept verbatim."""
    if host.isascii():
        return host
    try:
        import idna

        return idna.encode(host, uts46=True).decode("ascii")
    except Exception:
        out = []
        for label in host.split("."):
            if label.isascii():
                out.append(label)
            else:
                try:
                    out.append(
                        "xn--" + label.encode("punycode").decode("ascii"))
                except Exception:
                    out.append(label)
        return ".".join(out)


_SPECIAL_SCHEMES = ("http", "https", "ws", "wss", "ftp")


def _slash_backslashes(s: str) -> str:
    """WHATWG treats '\\' as '/' during path parsing of special URLs —
    but NOT inside the query or fragment (verified against Node)."""
    cut = len(s)
    for ch in "?#":
        p = s.find(ch)
        if p != -1:
            cut = min(cut, p)
    return s[:cut].replace("\\", "/") + s[cut:]


def _pre_normalize(url: str) -> str:
    """WHATWG pre-parse for special schemes: backslashes count as
    slashes up to the query/fragment, and ANY run of slashes after the
    scheme introduces the authority (`http:foo.com/x` and
    `http:////a.x/` both parse a host — verified against Node)."""
    m = re.match(r"([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", url, re.S)
    if not m or m.group(1).lower() not in _SPECIAL_SCHEMES:
        return url
    scheme, rest = m.group(1).lower(), _slash_backslashes(m.group(2))
    cut = len(rest)
    for ch in "?#":
        p = rest.find(ch)
        if p != -1:
            cut = min(cut, p)
    head, tail = rest[:cut], rest[cut:]
    return f"{scheme}://{head.lstrip('/')}{tail}"


def _seg_dots(seg: str):
    """'.' / '..' equivalence incl. %2e spellings (WHATWG path state)."""
    s = seg.lower().replace("%2e", ".")
    return s if s in (".", "..") else None


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 / WHATWG path shortening: '..' pops (clamped at
    root), '.' drops; a trailing dot segment keeps the directory slash
    ('/a/..' → '/', '/./b/.' → '/b/')."""
    if not path.startswith("/"):
        return path
    out: list[str] = [""]
    segs = path.split("/")
    for seg in segs[1:]:
        d = _seg_dots(seg)
        if d == ".":
            continue
        if d == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if segs and _seg_dots(segs[-1]) is not None:
        out.append("")
    if len(out) == 1:
        out.append("")
    return "/".join(out)


def _normalize_host(host: str) -> str:
    """WHATWG host normalization subset (each rule verified against
    Node's `new URL`): lowercase; IPv6 literals keep their brackets
    (urlsplit.hostname strips them — re-wrap, else the rebuilt netloc
    is invalid); percent-encoded domain bytes decode (`ex%61mple.com` →
    example.com); unicode domains punycode (see `_idna_host`); numeric
    IPv4 forms normalize to the dotted quad (see `_maybe_ipv4`)."""
    host = host.lower()
    if ":" in host:  # IPv6 literal (hostname comes bracket-stripped)
        return f"[{host}]"
    if "%" in host:
        host = unquote(host)
    host = _idna_host(host)
    return _maybe_ipv4(host) or host


@lru_cache(maxsize=1 << 17)
def canonicalize(href: str) -> str:
    """Normalize an absolute URL the way `new URL(x).href` would (subset):
    lowercase scheme + host, strip default port, '' path -> '/' for special
    schemes, encode spaces in path/query. Fragment is preserved if present.

    Pure string -> string; memoized (bounded LRU) because crawl waves
    resolve many links to the SAME target URL — the fused driver loop and
    the Arrow extraction workers both hit the cache heavily.
    """
    pre = _pre_normalize(_clean(href))
    parts = urlsplit(pre)
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    host = _normalize_host(parts.hostname or "")
    port = parts.port
    userinfo = ""
    if "@" in netloc:
        userinfo = netloc.rsplit("@", 1)[0] + "@"
    if port is not None and _DEFAULT_PORTS.get(scheme) == str(port):
        port = None
    netloc = userinfo + host + (f":{port}" if port is not None else "")
    path = parts.path
    if scheme in ("http", "https", "ws", "wss", "ftp"):
        if not path:
            path = "/"
    if netloc:
        path = _remove_dot_segments(path)
    # WHATWG percent-encodes spaces (and a few others) in paths; cover the
    # common cases the fixtures exercise without re-encoding existing escapes.
    path = quote(path, safe="/%:@!$&'()*+,;=~[]-._")
    # WHATWG's query percent-encode set excludes backslash (it is only
    # slash-converted in PATH states), so it stays raw here
    query = quote(parts.query, safe="=&%:@!$'()*+,;/?~[]-._\\")
    out = urlunsplit((scheme, netloc, path, query, parts.fragment))
    # WHATWG href keeps a bare '?' / '#' (new URL('http://a.x/p?').href
    # is 'http://a.x/p?'); urlunsplit drops empty markers, so restore
    # them — the reference's URL-seen Set keys on href, where
    # '/p?' and '/p' are distinct entries
    frag_pos = pre.find("#")
    if not parts.fragment and frag_pos != -1:
        out += "#"
    if not parts.query and "?" in (
            pre if frag_pos == -1 else pre[:frag_pos]):
        i = out.find("#") if "#" in out else len(out)
        out = out[:i] + "?" + out[i:]
    return out


def parse_link(link: str, base: str | None) -> dict:
    """Resolve `link` against `base`; mirror ParsedUrl
    (/root/reference/src/links.ts:43-49,220-232).

    Returns dict(raw_link, resolved_url, url_with_fragment, fragment,
    parse_error) where resolved_url is canonical and fragmentless.
    """
    out = {
        "raw_link": link,
        "resolved_url": None,
        "url_with_fragment": None,
        "fragment": None,
        "parse_error": None,
    }
    try:
        cleaned = _clean(link)
        if base and not _SCHEME_RE.match(cleaned) and _base_is_special(base):
            # relative path parsing against a special base also treats
            # backslashes as slashes (new URL('b\\c', base) → .../b/c)
            cleaned = _slash_backslashes(cleaned)
        resolved = urljoin(base, cleaned) if base else cleaned
        resolved = _pre_normalize(resolved)
        if not _SCHEME_RE.match(resolved):
            raise ValueError(f"cannot resolve relative URL without base: {link!r}")
        parts = urlsplit(resolved)
        scheme = parts.scheme.lower()
        if scheme in ("http", "https", "ws", "wss", "ftp"):
            if not parts.netloc or not parts.hostname:
                raise ValueError(f"missing host in URL: {link!r}")
        full = canonicalize(resolved)
        # fragment == everything after the FIRST '#' (what urlsplit
        # returns for an absolute URL) — string split, no re-parse
        fragment = full.split("#", 1)[1] if "#" in full else None
        fragment = fragment or None
        # strip the fragment TEXTUALLY (the reference sets url.hash = ''
        # on the WHATWG object): a bare trailing '?' must survive into
        # the seen key, which a urlunsplit rebuild would drop
        fragmentless = full.split("#", 1)[0]
        out["resolved_url"] = fragmentless
        out["url_with_fragment"] = full
        # reference decodes the fragment (decodeURIComponent, links.ts:224-226)
        out["fragment"] = unquote(fragment) if fragment else None
    except Exception as e:  # noqa: BLE001 - parse failure is a data value here
        out["parse_error"] = f"{type(e).__name__}: {e}"
    return out


@lru_cache(maxsize=1 << 17)
def _base_is_special(base: str) -> bool:
    """Memoized `urlsplit(base).scheme in special` — every link of a page
    probes the same base."""
    try:
        return urlsplit(base).scheme.lower() in _SPECIAL_SCHEMES
    except ValueError:
        return False


@lru_cache(maxsize=1 << 17)
def url_host_py(url: str) -> str:
    """WHATWG `.host` — lowercase hostname incl. non-default port
    (the reference keys its per-host delay cache on this, src/index.ts:326).
    Pure + memoized: the politeness twins call it per frontier row."""
    try:
        parts = urlsplit(url)
        host = (parts.hostname or "").lower()
        port = parts.port
        if port is not None and _DEFAULT_PORTS.get(parts.scheme.lower()) != str(port):
            return f"{host}:{port}"
        return host
    except ValueError:
        return ""


def url_protocol_py(url: str) -> str:
    """Scheme with trailing ':' like WHATWG url.protocol."""
    m = _SCHEME_RE.match(url or "")
    return m.group(0).lower() if m else ""


# ---------------------------------------------------------------------------
# JVM-side column helpers (whole-stage-codegen friendly; no Python in the
# engine hot path — these run on canonical URLs produced by the extraction
# stage).
# ---------------------------------------------------------------------------

def url_hash(col: Column | str) -> Column:
    """64-bit dedup key over the canonical fragmentless URL (J2 anti-join key)."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


def url_host(col: Column | str) -> Column:
    """Host column for politeness partitioning. parse_url is JVM built-in;
    ports are part of the key (WHATWG .host semantics), so fall back to a
    regex capture that keeps `host:port`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z\d+\-.]*://(?:[^/@?#]*@)?([^/?#]+)", 1))


def is_http_protocol(col: Column | str) -> Column:
    """Reference skips non-http(s) protocols (src/index.ts:941-944)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^https?://")


# ---------------------------------------------------------------------------
# Tracking-parameter stripping — crawl-side URL dedup beyond RFC 3986.
#
# Canonicalization (parse_link/canonicalize above) is strictly
# syntactic; real frontiers additionally fold analytics/click-id query
# parameters (utm_*, fbclid, gclid, ...) because they multiply one
# resource into unbounded URL aliases — the single biggest contributor
# to avoidable refetch volume in public crawls. The reference has no
# such pass (one-shot tool); at 10^10-URL scale it's table stakes.
# ---------------------------------------------------------------------------

# well-known cross-site trackers (public lists: utm family, major ad /
# social click ids, analytics session ids). Param NAMES only — values
# never matter. Kept as one regex alternation so both engines share it.
TRACKING_PARAM_RE = (
    "^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|yclid|igshid|mc_eid|mc_cid|"
    "_ga|_gl|s_kwcid|vero_id|wickedid|oly_enc_id|oly_anon_id|ref_src|"
    "spm|sck)(=|$)")


def strip_tracking_params(col: Column | str) -> Column:
    """Remove tracking query parameters from a fragment-free URL —
    pure codegen (split + higher-order filter + rejoin). Parameter
    ORDER of the survivors is preserved (this is dedup folding, not
    SURT sorting); an emptied query drops its ``?``."""
    u = F.col(col) if isinstance(col, str) else col
    base = F.split_part(u, F.lit("?"), F.lit(1))
    qpos = F.locate("?", u)
    query = F.when(qpos > 0, F.substring(u, qpos + 1, 1 << 24)).otherwise(
        F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    return F.when(
        (qpos > 0) & (F.size(kept) > 0),
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def strip_tracking_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_tracking_params` — same regex
    constant, list_filter mirror."""
    base = f"split_part({expr}, '?', 1)"
    query = (f"case when strpos({expr}, '?') > 0 then "
             f"substr({expr}, strpos({expr}, '?') + 1) else '' end")
    kept = (f"list_filter(string_split({query}, '&'), "
            f"p -> p <> '' and not regexp_matches(p, "
            f"'{TRACKING_PARAM_RE}'))")
    return (f"(case when strpos({expr}, '?') > 0 and len({kept}) > 0 "
            f"then {base} || '?' || array_to_string({kept}, '&') "
            f"else {base} end)")
