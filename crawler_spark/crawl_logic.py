"""Pure crawl semantics shared by the Spark engine and the oracle simulator.

Everything here is plain Python over span lists / small rule lists — the
engine calls these inside Arrow-batched pandas UDF stages (per fetched doc,
bounded per round), the simulator calls them directly. One implementation
⇒ engine-vs-simulator trace equivalence is exact by construction
(SURVEY.md §3.4).

Reference semantics mapped (file:line in /root/reference/src):
- body text = raw page bytes (Types.hs:20) → concatenated 'text' spans
- direction match: first rule whose UrlRegex matches the *final* URL and
  whose HrefRegex's first capture group hits the body and derelativises
  (Directions.hs:20-43; first-rule-wins via headMay:30)
- meta refresh: first meta_refresh span; target resolved against the
  *originally scheduled* URL, not the final one (Crawl.hs:130-131 passes
  nextUrl — a reference quirk we replicate)
- forms: spans in page order; first form with an applicable instruction
  wins (Forms.hs:56-69); discovered inputs Map.fromList (later dup wins),
  supplied params override, overriding a non-discovered key is an error
  (Forms.hs:83-97); merged params emitted in ascending key order
  (M.toList, Forms.hs:75)
- robots (north_rule addition, absent in reference): longest-prefix-match
  wins; equal length ⇒ allow; no match ⇒ allow
"""

from __future__ import annotations

import json
import re
from urllib.parse import quote

from crawler_spark.functions.urls import resolve


def sorted_spans(spans) -> list:
    return sorted(spans, key=lambda s: s["offset"] if isinstance(s, dict) else s.offset)


def _get(span, field):
    return span[field] if isinstance(span, dict) else getattr(span, field)


def body_text(spans) -> str:
    """Concatenated text spans in offset order (the engine's analog of the
    raw body bytes handed to regexes at Directions.hs:37)."""
    return "\n".join(_get(s, "text") or "" for s in sorted_spans(spans) if _get(s, "kind") == "text")


def extract_raw_links(spans) -> list[str]:
    """Link candidates in offset order: 'link' spans carry raw hrefs
    (trimmed, Parse.hs:50 `trim . snd`), 'media' spans contribute their
    media_ref (SURVEY.md H2)."""
    out = []
    for s in sorted_spans(spans):
        k = _get(s, "kind")
        if k == "link" and _get(s, "text") is not None:
            out.append(_get(s, "text").strip())
        elif k == "media" and _get(s, "media_ref") is not None:
            out.append(_get(s, "media_ref").strip())
    return out


def find_meta_refresh(spans) -> str | None:
    """First meta_refresh span's raw target (Parse.hs:22-38: first
    qualifying <meta> wins)."""
    for s in sorted_spans(spans):
        if _get(s, "kind") == "meta_refresh" and _get(s, "text"):
            return _get(s, "text")
    return None


def find_direction(final_url: str, spans, directions) -> str | None:
    """First direction rule (config order) whose url_regex matches the
    final URL and whose href_regex captures something in the body that
    derelativises OK (Directions.hs:26-43). Returns canonical URL."""
    if not directions:
        return None
    body = None
    for d in directions:
        if not re.search(d.url_regex, final_url):
            continue
        if body is None:
            body = body_text(spans)
        m = re.search(d.href_regex, body)
        if not m or m.lastindex is None or not m.group(1):
            continue
        url, _, kind, _ = resolve(final_url, m.group(1))
        if kind == "ok":
            return url
    return None


def parse_form_spans(spans) -> list[dict]:
    """Forms in page order from 'form' spans (JSON-encoded per
    FIXTURES.md). Malformed JSON ⇒ span skipped (reference tagsoup never
    fails; our structured encoding can)."""
    out = []
    for s in sorted_spans(spans):
        if _get(s, "kind") != "form" or not _get(s, "text"):
            continue
        try:
            f = json.loads(_get(s, "text"))
        except (ValueError, TypeError):
            continue
        if isinstance(f, dict):
            out.append(
                {
                    "method": str(f.get("method", "GET")).upper(),
                    "action": str(f.get("action", "")),
                    "inputs": [
                        {"key": str(i.get("key", "")), "value": None if i.get("value") is None else str(i["value"])}
                        for i in f.get("inputs", [])
                        if isinstance(i, dict)
                    ],
                }
            )
    return out


def merge_form_params(discovered: list[dict], supplied: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Forms.hs:71-97: discovered inputs → Map (later duplicate wins;
    missing value ⇒ ''), supplied overrides in order; overriding a
    non-discovered key raises KeyError; result in ascending key order."""
    m: dict[str, str] = {}
    for i in discovered:
        m[i["key"]] = i["value"] if i["value"] is not None else ""
    for k, v in supplied:
        if k not in m:
            raise KeyError(k)
        m[k] = v
    return sorted(m.items())


# POST fetch keys (DownloadRequest.hs:27-33): a POST sends the action URL
# with an urlencoded BODY, so the URL that enters the redirect chain and
# the completed set is the plain action URL — unlike GET's query string.
# The fetch-sim models the request as `action\x00body` (NUL can never
# appear in a canonical URL), looked up verbatim against the synthetic
# web; everything user-visible strips the body part back off.
POST_KEY_SEP = "\x00"


def encode_params(params: list[tuple[str, str]]) -> str:
    """The urlencoded pair list both GET query strings and POST bodies
    use (urlEncodedBody / setQueryString share the same encoding)."""
    return "&".join(f"{k}={quote(v, safe='')}" for k, v in params)


def post_key(action_url: str, params: list[tuple[str, str]]) -> str:
    return action_url + POST_KEY_SEP + encode_params(params)


def strip_post_key(url: str | None) -> str | None:
    """Request key → the URL the reference would record (chain head,
    completed marks, store attribution = plain action URL for POST)."""
    if url is None:
        return None
    i = url.find(POST_KEY_SEP)
    return url if i < 0 else url[:i]


def form_submit_url(action_url: str, params: list[tuple[str, str]], method: str = "GET") -> str:
    """The fetch-sim request key for a submitted form
    (DownloadRequest.hs:27-33): POST ⇒ urlencoded body riding behind the
    NUL separator; anything else ⇒ query string appended."""
    qs = encode_params(params)
    if method.upper() == "POST":
        return post_key(action_url, params)
    sep = "&" if "?" in action_url else "?"
    return action_url + sep + qs if qs else action_url


def select_form(final_url: str, spans, instructions) -> tuple[str | None, str | None, list[str]]:
    """First form (page order) matched by the first applicable instruction
    (label order — Haskell M.toList, Forms.hs:99-104 under a Map).

    Returns (submit_url, label, error_messages). A failed override
    (non-discovered key) logs an error and skips that form (the reference
    crashes the worker thread — Forms.hs:87; documented deviation)."""
    errors: list[str] = []
    if not instructions:
        return None, None, errors
    insts = sorted(instructions, key=lambda i: i.label)
    for form in parse_form_spans(spans):
        target, _, kind, _ = resolve(final_url, form["action"])
        if kind != "ok" or target is None:
            errors.append(f"Could not resolve form action: {form['action']}")
            continue
        for inst in insts:
            if re.search(inst.url_regex, final_url) and re.search(inst.form_action_regex, target):
                try:
                    params = merge_form_params(form["inputs"], list(inst.params))
                except KeyError as e:
                    errors.append(f"Trying to override non-existing key: {e.args[0]}")
                    break
                return form_submit_url(target, params, form["method"]), inst.label, errors
    return None, None, errors


def doc_cookies(spans) -> list[str]:
    """Response cookies of a fetched doc: 'set_cookie' span texts in offset
    order (the fetch-sim analog of Set-Cookie headers; Crawl.hs:164-167
    shares every response cookie — shareCookie = const True)."""
    return [
        _get(s, "text")
        for s in sorted_spans(spans)
        if _get(s, "kind") == "set_cookie" and _get(s, "text")
    ]


def required_cookie(spans) -> str | None:
    """Login gate of a doc: first 'require_cookie' span's text, or None.
    A gated doc fetched without that cookie in the session jar behaves as
    an auth failure (the fetch-sim analog of a 403; the reference would
    surface it as a failed fetch on its dead urlsFailed path)."""
    for s in sorted_spans(spans):
        if _get(s, "kind") == "require_cookie" and _get(s, "text"):
            return _get(s, "text")
    return None


def robots_allowed(url: str, host: str, allow_prefixes, disallow_prefixes) -> bool:
    """Longest-prefix-match over the path(+query): longest matching rule
    wins; tie ⇒ allow; no match ⇒ allow."""
    idx = url.find(host)
    path = url[idx + len(host) :] if idx >= 0 else url
    if not path:
        path = "/"
    best_allow = max((len(p) for p in (allow_prefixes or []) if p and path.startswith(p)), default=-1)
    best_dis = max((len(p) for p in (disallow_prefixes or []) if p and path.startswith(p)), default=-1)
    return best_allow >= best_dis


def host_budget(per_host_budget: int, crawl_delay: float | None) -> int:
    """Per-host fetches per round: robots crawl_delay divides the budget
    (round-based generalization of 'one in flight per host', SURVEY.md P7)."""
    if crawl_delay is not None and crawl_delay > 1.0:
        return max(1, int(per_host_budget / crawl_delay))
    return max(1, per_host_budget)


# -- virtual-time politeness (scheduler_mode="timing", SURVEY.md P7+) -------
# The round window is per_host_budget seconds of virtual time; the r-th
# fetch on a host departs at (r-1)*delay seconds and is admitted iff its
# departure falls inside the window. Global fetch order is by departure
# time — the order a wall-clock scheduler would actually issue requests.
# Shared by the engine (plans/round.schedule) and the simulator so trace
# equivalence is exact by construction.

def host_delay_s(crawl_delay: float | None) -> float:
    """Effective per-fetch delay: robots crawl_delay when > 1s, else the
    1-fetch-per-virtual-second default (mirrors host_budget's gate)."""
    if crawl_delay is not None and crawl_delay == crawl_delay and crawl_delay > 1.0:
        return float(crawl_delay)
    return 1.0


def timing_eta_ms(host_rank: int, crawl_delay: float | None) -> int:
    """Virtual departure timestamp of a host's r-th fetch (1-based).
    Same double arithmetic order as the engine column
    ((r-1) * delay * 1000, truncating cast) so values match bit-exactly."""
    return int((host_rank - 1) * host_delay_s(crawl_delay) * 1000)


def include_match(url: str, host: str | None, url_patterns, domain_patterns) -> bool:
    """F1 (Crawl.hs:214-228): any url-pattern substring of the URL OR any
    domain-pattern substring of the domain; empty pattern sets ⇒ False."""
    if any(p in url for p in url_patterns):
        return True
    if host and any(p in host for p in domain_patterns):
        return True
    return False
