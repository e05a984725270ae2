"""URL canonicalization & resolution (SURVEY.md §2.4, U1-U9).

Reimplements the semantics of reference src/Urls.hs:33-103 in pure Python,
exposed to Spark as Arrow-batched pandas UDFs (never per-row Python UDFs).

Semantics replicated:
- U1 canonicalise: parse as *absolute* URI (reject otherwise), then
  RFC-3986 normalization: lowercase scheme+host, uppercase %-escapes and
  decode unreserved octets, collapse ./.. path segments
  (src/Urls.hs:33-41, `normalizeCase . normalizeEscape .
  normalizePathSegments`).
- U2 default-port strip: drop :80 iff http, :443 iff https; other ports
  kept (src/Urls.hs:25-31).
- U3 fragment discard: everything from '#' onward, applied both pre-parse
  and on raw hrefs (src/Urls.hs:45-47,87-88; discardFragments=True,
  src/Settings.hs:24-25).
- U4 space encoding on raw hrefs: literal ' ' → %20 (src/Urls.hs:90-91).
- U5/U6 derelativise: mailto → warning; already-absolute → canonicalise;
  else resolve against the page URL then normalize; parse failures →
  error rows (src/Urls.hs:55-98).
- U7 getDomain: the bytes between the first '//' and the next '/' —
  i.e. `[userinfo@]host[:port]`, NOT just the hostname (src/Urls.hs:100-103).
  Spark's parse_url(url,'HOST') drops port+userinfo, so domain extraction
  stays in this module.
- U9 hashing is NOT done here: URL/host hashes are `F.xxhash64` JVM-side.

Documented deviation from the reference (SURVEY.md §7 "what's hard"):
Haskell Network.URI's normalizeCase lowercases only the scheme; we also
lowercase the host per RFC 3986 §6.2.2.1. The oracle simulator
(crawler_spark/simulator.py) uses *this* canonicalizer, so
engine-vs-simulator equivalence is exact and well-defined.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pandas as pd

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
# characters legal in a URI (RFC 3986); anything else ⇒ parse failure, like
# Network.URI's parser rejecting e.g. raw '<', '>' or control characters
_URI_ILLEGAL_RE = re.compile("[\\x00-\\x20<>\"{}|\\\\^`\\x7f-\\U0010ffff]")
# a '%' not followed by two hex digits ⇒ invalid escape ⇒ parse failure
# (Network.URI rejects these; urllib would silently pass them through)
_BAD_ESCAPE_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")
# RFC 3986 §4.2: a relative reference's first path segment must not
# contain ':' (it would be read as a scheme); Network.URI rejects these
_REL_COLON_RE = re.compile(r"^[^/?#]*:")


def _normalize_escapes(s: str) -> str:
    """RFC 3986 §6.2.2.2: uppercase escape hex; decode unreserved octets."""

    def repl(m: re.Match) -> str:
        octet = int(m.group(1), 16)
        ch = chr(octet)
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                out.append(buf)
                buf = ""
            else:
                out.append(buf[:i])
                buf = buf[i:]
    return "".join(out)


def _sanitise_href(raw: str) -> str:
    """U3+U4 on raw hrefs: drop fragment, encode literal spaces
    (src/Urls.hs:85-91)."""
    s = raw.split("#", 1)[0]
    return s.replace(" ", "%20")


def canonicalize(raw: str) -> tuple[str | None, str | None, str | None]:
    """U1-U3: canonicalize an absolute URL.

    Returns (canonical_url, domain, error). domain is `[user@]host[:port]`
    per U7. error is None on success.
    """
    if raw is None:
        return None, None, "null URL"
    # identity fast path — same language as the vectorized wrapper
    # (_FAST_CANON_RE below); normalization is provably a no-op there.
    # _canonicalize_slow is the unshortcut kernel (tests compare the two)
    if _FAST_CANON_RE.match(raw) and "/." not in raw:
        return raw, raw.split("://", 1)[1].split("/", 1)[0], None
    return _canonicalize_slow(raw)


def _canonicalize_slow(raw: str) -> tuple[str | None, str | None, str | None]:
    s = raw.split("#", 1)[0]  # discard fragments pre-parse (src/Urls.hs:45-47)
    if not s or not _SCHEME_RE.match(s):
        return None, None, "not an absolute URI"
    if _URI_ILLEGAL_RE.search(s) or _BAD_ESCAPE_RE.search(s):
        return None, None, "illegal character in URI"
    try:
        parts = urlsplit(s)
    except ValueError:
        return None, None, "could not parse URL"
    scheme = parts.scheme.lower()
    if not scheme:
        return None, None, "not an absolute URI"

    netloc = parts.netloc
    # lowercase host but preserve userinfo verbatim
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
        userinfo += "@"
    else:
        userinfo, hostport = "", netloc
    # lowercase the host portion, keep an explicit non-default port (U2)
    if hostport.startswith("["):  # ipv6 literal [::1]:8080
        close = hostport.find("]")
        host, port = hostport[: close + 1].lower(), hostport[close + 1 :]
    elif ":" in hostport:
        h, _, p = hostport.rpartition(":")
        host, port = h.lower(), ":" + p
    else:
        host, port = hostport.lower(), ""
    if (scheme == "http" and port == ":80") or (scheme == "https" and port == ":443"):
        port = ""
    netloc = userinfo + host + port

    path = _remove_dot_segments(_normalize_escapes(parts.path))
    query = _normalize_escapes(parts.query)

    url = scheme + ":"
    if netloc or s[len(scheme) + 1 :].startswith("//"):
        url += "//" + netloc
    url += path
    if query:
        url += "?" + query
    domain = netloc if netloc else None
    return url, domain, None


# Fast resolve paths (the decide stage's hot loop — resolve keys are
# mostly distinct, so memoization alone doesn't help):
# - absolute href already in the canonical identity language (see
#   _FAST_CANON_RE) → returned as-is with a regex host extract;
# - root-relative href over identity-safe chars against a base in the
#   identity language → scheme://host of the base + href verbatim, which
#   equals canonicalize(urljoin(base, href)) because the join replaces
#   the whole path and the combined URL is back in the identity language.
# Everything else falls to the full kernel. test_urls locks equivalence.
# first char after '/' must not be another '/': '//host/path' is a
# protocol-relative reference (RFC 3986 §4.2 network-path), not a path
_FAST_REL_RE = re.compile(r"^/(?:[A-Za-z0-9_\-~.][A-Za-z0-9/_\-~.]*)?\Z")
_FAST_BASE_MEMO: dict = {}


def _fast_base_prefix(base: str):
    """(scheme://host, host) for identity-language bases, else None."""
    r = _FAST_BASE_MEMO.get(base)
    if r is None:
        if base is not None and _FAST_CANON_RE.match(base) and "/." not in base:
            scheme, rest = base.split("://", 1)
            host = rest.split("/", 1)[0]
            r = (scheme + "://" + host, host)
        else:
            r = False
        if len(_FAST_BASE_MEMO) >= _MEMO_CAP:
            _FAST_BASE_MEMO.clear()
        _FAST_BASE_MEMO[base] = r
    return r or None


def resolve(base: str, raw_href: str) -> tuple[str | None, str | None, str | None, str | None]:
    """U5/U6 derelativise: resolve a raw href against the page URL.

    Returns (canonical_url, domain, kind, message) where kind is one of
    ok | warning | error (mailto ⇒ warning, parse failure ⇒ error),
    mirroring Either Loggable CanonicalUrl (src/Urls.hs:72-98).
    """
    if raw_href is None:
        return None, None, "error", "null href"
    href = _sanitise_href(raw_href.strip())
    if href.startswith("mailto:"):
        return None, None, "warning", "Found an email " + href
    if href.startswith("/") and _FAST_REL_RE.match(href) and "/." not in href:
        pre = _fast_base_prefix(base)
        if pre is not None:
            return pre[0] + href, pre[1], "ok", None
    if _SCHEME_RE.match(href):
        url, dom, err = canonicalize(href)  # has its own identity fast path
        if err is not None:
            return None, None, "error", "Could not parse URL: " + href
        return url, dom, "ok", None
    if base is None:
        return None, None, "error", "Couldn't derelativise left side: <no base>"
    if not href:
        # empty href resolves to the base itself (urljoin semantics;
        # Network.URI relativeTo does the same for the empty reference)
        url, dom, err = canonicalize(base)
        if err is not None:
            return None, None, "error", "Couldn't derelativise left side: " + base
        return url, dom, "ok", None
    if _URI_ILLEGAL_RE.search(href) or _BAD_ESCAPE_RE.search(href) or _REL_COLON_RE.match(href):
        return None, None, "error", "Couldn't derelativise right side: " + href
    base_url, _, base_err = canonicalize(base)
    if base_err is not None:
        return None, None, "error", "Couldn't derelativise left side: " + str(base)
    try:
        joined = urljoin(base_url, href)
    except ValueError:
        return None, None, "error", "Couldn't derelativise right side: " + href
    url, dom, err = canonicalize(joined)
    if err is not None:
        return None, None, "error", "Couldn't derelativise right side: " + href
    return url, dom, "ok", None


# ---------------------------------------------------------------------------
# Vectorized (Arrow-batched) wrappers. Inside each batch we dedupe values
# before calling the scalar kernel, so the Python cost is O(distinct), and
# the batch transfer is Arrow — no per-row Python UDFs anywhere.
# ---------------------------------------------------------------------------


# Worker-lifetime memos: Python workers are reused across batches, stages,
# and rounds, and the same URLs recur heavily (frontier re-reads, repeated
# link targets). canonicalize is pure, so cross-call caching is always
# safe; bounded by a wholesale clear to cap worker memory.
_CANON_MEMO: dict = {}
_RESOLVE_MEMO: dict = {}
_MEMO_CAP = 2_000_000

# Already-canonical fast path: for URLs in this language, `canonicalize`
# is provably the identity with host = the netloc group — lowercase
# http(s) scheme (no case change), lowercase host, no userinfo/port (no
# strip), a '/'-led path over chars needing no escape normalization, no
# '%' (no escapes), no '?'/'#' (no query/fragment handling), and the
# extra `/.`-free check rules out every dot-segment form. Everything else
# falls through to the scalar kernel. test_urls locks the equivalence
# over this language's samples.
_FAST_CANON_RE = re.compile(r"^https?://[a-z0-9][a-z0-9.\-]*(/[A-Za-z0-9/_\-~.]*)?\Z")


def canonicalize_series(urls: pd.Series) -> pd.DataFrame:
    s = urls.astype("object")
    notnull = s.notna()
    fast = (
        notnull
        & s.str.match(_FAST_CANON_RE, na=False)
        & ~s.str.contains("/.", regex=False, na=False)
    )
    # host = between '//' and the next '/'; path may be absent entirely
    hosts = s[fast].str.extract(r"^https?://([^/]*)", expand=False)

    out_url = pd.Series([None] * len(s), dtype="object", index=s.index)
    out_host = pd.Series([None] * len(s), dtype="object", index=s.index)
    out_err = pd.Series([None] * len(s), dtype="object", index=s.index)
    out_url[fast] = s[fast]
    out_host[fast] = hosts
    out_err[~notnull] = "null URL"

    slow_idx = notnull & ~fast
    if slow_idx.any():
        memo = _CANON_MEMO
        uniq: dict = {}
        for u in pd.unique(s[slow_idx]):
            r = memo.get(u)
            if r is None:
                r = canonicalize(u)
                if len(memo) >= _MEMO_CAP:
                    memo.clear()
                memo[u] = r
            uniq[u] = r
        slow_rows = [uniq[u] for u in s[slow_idx]]
        out_url[slow_idx] = [r[0] for r in slow_rows]
        out_host[slow_idx] = [r[1] for r in slow_rows]
        out_err[slow_idx] = [r[2] for r in slow_rows]
    return pd.DataFrame({"url": out_url, "host": out_host, "error": out_err})


def resolve_series(bases: pd.Series, hrefs: pd.Series) -> pd.DataFrame:
    memo = _RESOLVE_MEMO
    out = []
    for b, h in zip(bases, hrefs):
        key = (b, h)
        r = memo.get(key)
        if r is None:
            r = resolve(b, h)
            if len(memo) >= _MEMO_CAP:
                memo.clear()
            memo[key] = r
        out.append(r)
    return pd.DataFrame(out, columns=["url", "host", "kind", "message"])


def register_udfs():
    """Build the pandas UDF objects (deferred import so pure-Python tests
    don't need a JVM)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType, StructField, StructType

    canon_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("error", StringType()),
        ]
    )
    resolve_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("kind", StringType()),
            StructField("message", StringType()),
        ]
    )

    @pandas_udf(canon_schema)
    def canonicalize_urls(urls: pd.Series) -> pd.DataFrame:
        return canonicalize_series(urls)

    @pandas_udf(resolve_schema)
    def resolve_links(bases: pd.Series, hrefs: pd.Series) -> pd.DataFrame:
        return resolve_series(bases, hrefs)

    return canonicalize_urls, resolve_links
