"""Run configuration (replaces CLI + TVar settings of the reference).

Maps src/Initialisation.hs:38-55 option handling and src/Settings.hs
constants. A run is configured once, immutably, and stored with the run
checkpoint — the reference's runtime-mutable TVars (src/Types.hs:40-46)
have no engine analog except re-running with a new config.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # seeds in input order — admission order matters (src/Initialisation.hs:113-119)
    seeds: tuple[str, ...] = ()
    # include patterns: substring semantics, empty set rejects everything
    # (src/Crawl.hs:214-228)
    url_include_patterns: tuple[str, ...] = ()
    domain_include_patterns: tuple[str, ...] = ()
    # quota (src/Initialisation.hs:66-68); None = unlimited
    crawl_limit: int | None = None
    # politeness: per-host fetches per round (round analog of domain-exclusive
    # ownership, src/PoliteQueue.hs:34-64); robots crawl_delay divides it
    per_host_budget: int = 1
    # fetch-sim bounds (src/Settings.hs:17-21)
    max_redirects: int = 20
    max_content_bytes: int = 20 * 1024 * 1024
    # interaction branches (directions → meta-refresh → forms,
    # src/Crawl.hs:117-152); bounded, unlike the reference's open recursion
    max_interaction_hops: int = 5
    # scheduler skew handling (SURVEY.md P6): two-phase salted window
    scheduler_salts: int = 8
    # P7+: "budget" = per-host count truncation (host_budget); "timing" =
    # virtual-time politeness — the r-th fetch on a host departs at
    # (r-1)*crawl_delay seconds of virtual round time, only departures
    # inside the round window are admitted, and the GLOBAL fetch order is
    # by departure time (crawl_logic.timing_eta_ms; the green
    # schedule_timing query's semantics wired into the round loop)
    scheduler_mode: str = "budget"
    # timing-mode round window; None = per_host_budget seconds
    round_window_ms: int | None = None
    max_rounds: int = 1000
    # robots evaluation is a north_rule addition (absent in reference)
    respect_robots: bool = True
    # S6 (-p addr:port, src/Initialisation.hs:121-136): fetch-simulate
    # ignores it; the real-socket stage (plans/fetch_http.py) routes every
    # request through it — http-client addProxy semantics
    proxy: str | None = None
    # src/Settings.hs:14-15; consumed by the real-socket stage's TLS
    # context, ignored by fetch-simulate. DELIBERATE DEVIATION: the
    # reference hardcodes True, but disabling certificate verification is
    # not a sane zero-config default for a network path — set True
    # explicitly to restore reference behavior
    ignore_bad_https_certs: bool = False
    # interaction hops > 0 carry only the rows that branched; when that
    # count (known exactly from the hop accumulator) is at most this, the
    # fetch join switches to a point-lookup path: collect the keys and
    # push an IN filter to the parquet scans (row-group skipping) instead
    # of streaming the whole web again. 0 disables. Kept O(100): beyond
    # that a broadcast semi-join beats a driver collect + giant IN
    # literal (plan bloat), and branch hops are almost always tiny.
    point_lookup_threshold: int = 256
    # JVM fast path for the decide stage (plans/extract.py): rows with no
    # interaction/cookie spans and all hrefs in the fast resolve language
    # are decided entirely by Catalyst expressions — the span payload
    # never crosses Arrow into Python. False = every row through the
    # Python decide loop (the two paths are value-identical; the flag
    # exists so the trace suite can prove it).
    vectorized_extract: bool = True
    # span-free hop-0 fast path (plans/doc_index.py): precompute per-doc
    # (size, route, resolved links) once per corpus so the round's fetch
    # joins move narrow columns only and spans are re-joined exactly once
    # at the crawled_docs write. Requires vectorized_extract; ignored on
    # the http_fetch path (no docs table to re-join). False = legacy
    # span-carrying hop (value-identical; flag exists for the trace suite
    # to prove it and for A/B).
    use_doc_index: bool = True
    # priority propagation (engine addition; the reference has a single
    # FIFO). When True, a discovered link inherits priority = discovering
    # page's priority + 1 (BFS depth), and the scheduler's (priority, seq)
    # order fetches shallow pages first within each host's budget. First
    # discovery fixes a URL's priority. False = all 0 (pure FIFO parity).
    depth_priority: bool = False

    def to_json(self) -> str:
        d = {k: list(v) if isinstance(v, tuple) else v for k, v in self.__dict__.items()}
        return json.dumps(d, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "CrawlConfig":
        d = json.loads(s)
        for k in ("seeds", "url_include_patterns", "domain_include_patterns"):
            d[k] = tuple(d[k])
        return CrawlConfig(**d)


@dataclass(frozen=True)
class FormInstruction:
    """One supplied form action (src/Types.hs:94-95): params override
    discovered inputs; overriding a non-discovered key is an error
    (src/Forms.hs:83-90)."""

    label: str
    url_regex: str
    form_action_regex: str
    params: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class HrefDirection:
    """Regex-driven next-link rule (src/Types.hs:99-100); first matching
    rule wins (src/Directions.hs:30)."""

    label: str
    url_regex: str
    href_regex: str


@dataclass
class WebConfig:
    """Static inputs of a crawl: the synthetic web + rule tables."""

    form_instructions: list[FormInstruction] = field(default_factory=list)
    href_directions: list[HrefDirection] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Config-file parsers (S4/S5) — same stanza formats as the reference's
# eg/form_instructions.cfg and eg/direction_instructions.cfg.
# ---------------------------------------------------------------------------
def parse_form_instructions(text: str) -> list[FormInstruction]:
    """Blank-line-separated chunks of key=value lines
    (src/Initialisation.hs:138-178). Keys: Label, UrlRegex,
    FormActionRegex; all other keys are form parameters (URL-unescaped)."""
    from urllib.parse import unquote

    out = []
    for chunk in re.split(r"\n\s*\n", text.strip()):
        if not chunk.strip():
            continue
        kv: list[tuple[str, str]] = []
        meta: dict[str, str] = {}
        for line in chunk.splitlines():
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, _, v = line.partition("=")
            k, v = k.strip(), unquote(v.strip())
            if k in ("Label", "UrlRegex", "FormActionRegex"):
                meta[k] = v
            else:
                kv.append((k, v))
        if {"Label", "UrlRegex", "FormActionRegex"} <= meta.keys():
            out.append(
                FormInstruction(
                    label=meta["Label"],
                    url_regex=meta["UrlRegex"],
                    form_action_regex=meta["FormActionRegex"],
                    params=tuple(kv),
                )
            )
    return out


_DIRECTION_RE = re.compile(
    r"\s*HrefDirection\s*=\s*(?P<label>[^\r\n]*)\r?\n"
    r"\s*UrlRegex\s*=\s*(?P<url>[^\r\n]*)\r?\n"
    r"\s*HrefRegex\s*=\s*(?P<href>[^\r\n]*)"
)


def parse_href_directions(text: str) -> list[HrefDirection]:
    """Stanza parser for direction files (src/Directions.hs:45-66).

    Like the reference's attoparsec parser, a malformed stanza (e.g. the
    deliberate `refDirection` typo in
    /root/reference/eg/direction_instructions.cfg:5-7) stops the parse:
    stanzas after the malformed one are not returned. Unlike the reference
    (which calls `error`), we return what parsed and report the remainder.
    """
    out = []
    pos = 0
    text = text or ""
    while pos < len(text) and text[pos:].strip():
        m = _DIRECTION_RE.match(text, pos)
        if not m:
            break
        out.append(
            HrefDirection(
                label=m.group("label").strip(),
                url_regex=m.group("url").strip(),
                href_regex=m.group("href").strip(),
            )
        )
        pos = m.end()
    return out
