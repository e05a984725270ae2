"""Vectorized parse/extract stage (H1–H5, §2.6 branches 1–3, A1 failures).

ONE `mapInPandas` stage per interaction hop — the only Python in the
round, the analog of the reference's tagsoup parse (src/Crawl.hs:120). It
consumes fetch-join output rows and emits, per row, the full disposition:

  failed      — redirect abort / missing doc / body-size cap
                (src/Fetch.hs:49-70, src/HttpUtil.hs:20-25)
  direction   — href-direction refetch target    (src/Crawl.hs:123-129)
  meta        — meta-refresh target, checkNotDone gate applied by the
                round plan right after                (src/Crawl.hs:130-143)
  meta_error  — unresolvable meta target ⇒ row dropped
  form        — form-submission refetch target    (src/Crawl.hs:146-152)
  store_pass  — stored: final URL passed the include filter; `links`
                carries the resolved link candidates (src/Crawl.hs:153-162)
  store_drop  — include filter failed at store time ⇒ nothing stored,
                no completion marks, no links          (src/Crawl.hs:156-157)

All semantics come from crawl_logic.py, shared verbatim with the oracle
simulator, so engine-vs-simulator equivalence is by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from crawler_spark import crawl_logic as cl
from crawler_spark.functions.urls import canonicalize, resolve

DECISION_SCHEMA = (
    "rank bigint, scheduled_url string, final_url string, "
    "decision string, next_url string, hops int, visited array<string>, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "links array<struct<url:string,host:string,kind:string,message:string,ord:int>>, "
    "errors array<struct<kind:string,url:string,message:string>>, "
    "cookies array<string>, chain_cookies array<string>"
)

_COLS = [
    "rank",
    "scheduled_url",
    "final_url",
    "decision",
    "next_url",
    "hops",
    "visited",
    "spans",
    "links",
    "errors",
    "cookies",
    "chain_cookies",
]


def make_decide(config, directions, form_instructions, branch_acc=None, cookie_jar=frozenset()):
    """mapInPandas over fetch-join rows
    (rank, scheduled_url, current_url, hops, final, visited, aborted,
    too_big, spans?) → full per-row disposition.

    branch_acc: optional Spark accumulator bumped once per row whose
    decision re-enters the hop loop (direction/meta/form) — lets the
    driver's loop-exit test ride the checkpoint job instead of running a
    separate count.

    cookie_jar: the session jar as of round start (A5, round-boundary
    semantics — see schema.SESSION_STATE). Gates 'require_cookie' docs and
    is NOT mutated mid-round."""
    url_patterns = list(config.url_include_patterns)
    domain_patterns = list(config.domain_include_patterns)
    max_hops = config.max_interaction_hops

    def decide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-lifetime memo caches: the same raw href resolves against
        # the same base many times across a crawl (Python workers are
        # reused across batches, so these amortize across rounds too)
        resolve_memo: dict[tuple, tuple] = {}
        host_memo: dict[str, str | None] = {}

        def resolve_c(base, raw):
            key = (base, raw)
            r = resolve_memo.get(key)
            if r is None:
                r = resolve(base, raw)
                resolve_memo[key] = r
            return r

        def host_c(u):
            if u not in host_memo:
                host_memo[u] = canonicalize(u)[1]
            return host_memo[u]

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                # POST fetch keys carry the urlencoded body behind a NUL
                # (DownloadRequest.hs:27-33); the doc lookup already used
                # the full key — everything from here on (chains, marks,
                # errors, store attribution) sees the plain action URL
                visited = [cl.strip_post_key(u) for u in row.visited]
                errors: list[dict] = []
                # A1 failure dispositions first (simulator order)
                if row.aborted:
                    errors.append(
                        {"kind": "CrawlError", "url": row.scheduled_url,
                         "message": f"Too many redirects from {cl.strip_post_key(row.current_url)}"}
                    )
                    out.append((row.rank, row.scheduled_url, None, "failed", None,
                                row.hops, visited, None, None, errors, None, None))
                    continue
                final = cl.strip_post_key(row.final)
                if row.spans is None or isinstance(row.spans, float):  # null → None/NaN
                    errors.append(
                        {"kind": "CrawlError", "url": row.scheduled_url,
                         "message": f"Fetch failed: {final}"}
                    )
                    out.append((row.rank, row.scheduled_url, final, "failed", None,
                                row.hops, visited, None, None, errors, None, None))
                    continue
                if row.too_big:
                    errors.append(
                        {"kind": "CrawlError", "url": row.scheduled_url,
                         "message": f"Content too large: {final}"}
                    )
                    out.append((row.rank, row.scheduled_url, final, "failed", None,
                                row.hops, visited, None, None, errors, None, None))
                    continue

                spans = list(row.spans)
                chain_prev = list(row.chain_cookies or [])
                # session gate (A5): cookie-gated doc without its cookie in
                # the round-start jar OR set earlier in this chain
                # (src/Fetch.hs cookie threading) = auth failure
                req = cl.required_cookie(spans)
                if req is not None and req not in cookie_jar and req not in chain_prev:
                    errors.append(
                        {"kind": "CrawlError", "url": row.scheduled_url,
                         "message": f"Unauthorized (cookie required): {final}"}
                    )
                    out.append((row.rank, row.scheduled_url, final, "failed", None,
                                row.hops, visited, None, None, errors, None, None))
                    continue
                doc_cs = cl.doc_cookies(spans)
                # responseCookies \\ cookiesSent (src/Crawl.hs:159): the
                # final hop's cookies minus those already sent on its fetch
                # (set earlier in this chain); the round-start jar is
                # subtracted downstream (broadcast anti-join in round.py)
                new_cookies = [c for c in doc_cs if c not in chain_prev] or None
                chain_next = (chain_prev + [c for c in doc_cs if c not in chain_prev]) or None
                decision, next_url = "store", None
                if row.hops < max_hops:
                    target = cl.find_direction(final, spans, directions)
                    if target is not None:
                        decision, next_url = "direction", target
                    else:
                        raw_meta = cl.find_meta_refresh(spans)
                        if raw_meta is not None:
                            t, _, kind, msg = resolve_c(row.scheduled_url, raw_meta)
                            if kind != "ok":
                                decision = "meta_error"
                                errors.append(
                                    {"kind": "CrawlError", "url": row.scheduled_url,
                                     "message": f"Meta refresh resolve failed: {msg}"}
                                )
                            else:
                                decision, next_url = "meta", t
                        else:
                            submit, _label, form_errors = cl.select_form(
                                final, spans, form_instructions
                            )
                            errors.extend(
                                {"kind": "GeneralError", "url": final, "message": m}
                                for m in form_errors
                            )
                            if submit is not None:
                                decision, next_url = "form", submit

                links = None
                if decision == "store":
                    # F1 at store time on the final redirect target
                    # (src/Crawl.hs:157); failure drops marks+store+links
                    final_host = host_c(final)
                    if cl.include_match(final, final_host, url_patterns, domain_patterns):
                        decision = "store_pass"
                        links = []
                        for i, raw in enumerate(cl.extract_raw_links(spans)):
                            url, host, kind, msg = resolve_c(final, raw)
                            links.append(
                                {"url": url, "host": host, "kind": kind, "message": msg, "ord": i}
                            )
                    else:
                        decision = "store_drop"
                # cookies column = the SHARE set, emitted only at store time
                # with the include filter passed (src/Crawl.hs:157-163):
                # intermediate-hop and store_drop rows share nothing — their
                # cookies stay chain-local via chain_next
                out.append((row.rank, row.scheduled_url, final, decision, next_url,
                            row.hops, visited, spans if decision == "store_pass" else None,
                            links, errors,
                            new_cookies if decision == "store_pass" else None,
                            chain_next))
            if branch_acc is not None:
                n_branch = sum(1 for r in out if r[3] in ("direction", "meta", "form"))
                if n_branch:
                    branch_acc.add(n_branch)
            yield pd.DataFrame(out, columns=_COLS)

    return decide
