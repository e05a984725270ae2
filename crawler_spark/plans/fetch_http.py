"""Optional real-HTTP fetch stage (the S9/A1 real path).

Schema-compatible drop-in for the fetch-simulate joins in
`plans/round.py:fetch_and_branch`: consumes the hop state
(rank, scheduled_url, current_url, hops, chain_cookies) and emits the
decide-stage input rows (+ final, visited, aborted, too_big, spans) by
doing real sockets instead of joining the synthetic-web tables:

- manual 3xx following bounded at max_redirects, canonicalizing every
  Location per hop and accumulating the visited list exactly like the
  closure/simulator (src/Fetch.hs:29-70, src/Settings.hs:17-18);
- cookie jar + chain-local cookies and the reference's custom UA on
  every request (src/Request.hs:15-44, src/Settings.hs:30-31);
- optional proxy — requests carry the absolute URL to the proxy address,
  exactly http-client's addProxy (src/Initialisation.hs:121-136) — and
  ignore-bad-certs (src/Settings.hs:14-15) actually consumed;
- Content-Length precheck + hard body cap (src/HttpUtil.hs:20-25,
  src/Fetch.hs:35-37) applied to WIRE bytes at 8x the span cap (JSON
  framing inflates the wire size, so the transport bound must sit above
  the content bound or near-limit docs would fail here that fetch-sim
  stores), plus the simulator's span-size bound — the binding one — so
  traces match fetch-sim on the same web; docs whose JSON overhead
  exceeds 8x are cut by the transport bound (documented divergence).

Bodies are the span-document JSON the synthetic-web fixture serves
(tests/http_fixture.py); a production deployment would put its
HTML→spans converter at the marked seam — same schema out, nothing
downstream changes.

Executed as one `mapInPandas` stage: Arrow batches in, a thread pool
fans the I/O-bound requests out per batch (the Python-side analog of
the reference's 20 green threads, src/Settings.hs:8-9), rows come back
in input order so the plan stays deterministic.
"""

from __future__ import annotations

import json
import ssl
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

# decide-stage input schema = hop state + fetch outcome (must line up with
# the fetch-sim join output in round.fetch_and_branch)
HTTP_FETCH_SCHEMA = (
    "rank bigint, scheduled_url string, current_url string, hops int, "
    "chain_cookies array<string>, final string, visited array<string>, "
    "aborted boolean, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "too_big boolean"
)

# src/Settings.hs:30-31
USER_AGENT = "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:44.0) Gecko/20100101 Crawler/0.1"


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """http-client's redirectCount=0 (src/Request.hs:36): 3xx responses
    surface as HTTPError so the stage can follow them manually."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


def _build_opener(proxy: str | None, ignore_bad_certs: bool):
    handlers: list = [_NoRedirect()]
    if proxy:
        handlers.append(
            urllib.request.ProxyHandler({"http": f"http://{proxy}", "https": f"http://{proxy}"})
        )
    else:
        handlers.append(urllib.request.ProxyHandler({}))
    if ignore_bad_certs:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        handlers.append(urllib.request.HTTPSHandler(context=ctx))
    return urllib.request.build_opener(*handlers)


def _doc_size(spans) -> int:
    return sum(len(s.get("text") or "") + len(s.get("media_ref") or "") for s in spans)


def _validate_spans(obj):
    """Coerce server-supplied JSON into the span schema, or None on any
    mismatch. json.loads accepts ANY valid JSON; without this, a hostile
    or buggy server returning wrong-typed span fields (e.g.
    {"kind": 123, "offset": "zero"}) would crash the mapInPandas Arrow
    conversion against HTTP_FETCH_SCHEMA and abort the whole fetch stage
    — schema violations must stay row-local failed fetches."""
    if not isinstance(obj, list):
        return None
    out = []
    for s in obj:
        if not isinstance(s, dict):
            return None
        kind, text = s.get("kind"), s.get("text")
        media_ref, offset = s.get("media_ref"), s.get("offset")
        if kind is not None and not isinstance(kind, str):
            return None
        if text is not None and not isinstance(text, str):
            return None
        if media_ref is not None and not isinstance(media_ref, str):
            return None
        if offset is not None and (isinstance(offset, bool) or not isinstance(offset, int)):
            return None
        out.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
    return out


def make_http_fetch(config, cookie_jar: frozenset, max_workers: int = 32, timeout: float = 30.0):
    """Returns a mapInPandas function over hop-state batches.

    Captures the round-start jar (like the reference reading the cookie
    TVar before each fetch, src/Crawl.hs:108); chain-local cookies ride
    in on each row and are appended to the Cookie header.
    """
    from crawler_spark import crawl_logic as cl
    from crawler_spark.functions.urls import canonicalize

    max_redirects = config.max_redirects
    max_bytes = config.max_content_bytes
    wire_cap = max_bytes * 8 + 4096  # transport bound over the JSON framing
    proxy = config.proxy
    ignore_bad = config.ignore_bad_https_certs
    jar = sorted(cookie_jar)

    def fetch_one(opener, row):
        requested = row.current_url
        chain_cs = list(row.chain_cookies or [])
        cookies = jar + [c for c in chain_cs if c not in cookie_jar]
        headers = {"User-Agent": USER_AGENT}
        if cookies:
            headers["Cookie"] = "; ".join(f"{c}=1" for c in cookies)
        visited = [requested]
        current = requested
        hops_left = max_redirects
        first = True
        while True:
            # POST fetch keys (action\x00body): send a real urlencoded body
            # to the action URL — urlEncodedBody (DownloadRequest.hs:27-33);
            # redirect hops after the first request are plain GETs
            if first and cl.POST_KEY_SEP in current:
                action, body = current.split(cl.POST_KEY_SEP, 1)
                base_url = action  # Location resolves against the request
                # URI, which is the action — never the NUL-carrying key
                req = urllib.request.Request(
                    action,
                    data=body.encode(),
                    headers={**headers, "Content-Type": "application/x-www-form-urlencoded"},
                    method="POST",
                )
            else:
                base_url = current
                req = urllib.request.Request(current, headers=headers, method="GET")
            first = False
            try:
                resp = opener.open(req, timeout=timeout)
            except urllib.error.HTTPError as e:
                if 300 <= e.code < 400 and e.headers.get("Location"):
                    if hops_left == 0:
                        # src/Fetch.hs:52 aborts the worker; ours flags the row
                        return (current, visited, True, None, False)
                    nxt, _, err = canonicalize(
                        urllib.parse.urljoin(base_url, e.headers["Location"])
                    )
                    if err is not None:
                        return (current, visited, False, None, False)
                    # unconditional append — cycles repeat in the traversal
                    # list exactly like the simulator's _follow_redirects
                    visited.append(nxt)
                    current = nxt
                    hops_left -= 1
                    continue
                return (current, visited, False, None, False)  # 4xx/5xx = fetch failed
            except Exception:
                return (current, visited, False, None, False)  # conn refused/timeout
            # Server-controlled data must never escape as a stage failure:
            # every post-open step (malformed Content-Length, a read that
            # stalls or truncates, JSON that isn't a span list) degrades to
            # the same failed-fetch row the 4xx path produces.
            try:
                # Content-Length precheck (src/HttpUtil.hs:20-25)
                clen = resp.headers.get("Content-Length")
                if clen is not None and int(clen) > wire_cap:
                    return (current, visited, False, None, True)
                body = resp.read(wire_cap + 1)
                if len(body) > wire_cap:
                    # oversized body with no Content-Length header: same
                    # "Content too large" disposition as the precheck —
                    # parsing the truncated JSON would demote this to a
                    # generic fetch failure and diverge from fetch-sim
                    return (current, visited, False, None, True)
                # === production seam: HTML → spans conversion goes here ===
                # (html_to_spans handles text/html; the fixture serves
                # span-document JSON directly)
                ctype = (resp.headers.get("Content-Type") or "").split(";")[0].strip().lower()
                if ctype == "text/html":
                    from crawler_spark.html_spans import html_to_spans

                    spans = html_to_spans(body.decode("utf-8", errors="replace"))
                else:
                    spans = _validate_spans(json.loads(body))
                if spans is None:
                    return (current, visited, False, None, False)
                # simulator's span-size bound — the BINDING content cap, so
                # HTTP traces match fetch-sim
                return (current, visited, False, spans, _doc_size(spans) > max_bytes)
            except Exception:
                return (current, visited, False, None, False)
            finally:
                resp.close()

    def http_fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        opener = _build_opener(proxy, ignore_bad)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            with ThreadPoolExecutor(max_workers=min(max_workers, max(1, len(pdf)))) as pool:
                results = list(pool.map(lambda r: fetch_one(opener, r), pdf.itertuples()))
            out = pdf.copy()
            out["final"] = [r[0] for r in results]
            out["visited"] = [r[1] for r in results]
            out["aborted"] = [r[2] for r in results]
            out["spans"] = [r[3] for r in results]
            out["too_big"] = [r[4] for r in results]
            yield out

    return http_fetch
