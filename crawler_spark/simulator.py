"""Single-threaded reference simulator — the crawl-order oracle.

SURVEY.md §3.4: the Haskell reference's output order is nondeterministic
(20 racing threads). The deterministic kernel its polite-queue discipline
binds to is re-specified as round-based BFS:

  Round r:
    admitted(host) = the host's pending URLs ordered by (priority, seq),
                     truncated to host_budget(per_host_budget, crawl_delay)
    rank           = global (priority, seq) order over all admitted URLs
    each admitted URL is fetched (redirect-following ≤ max_redirects),
    interaction branches run in reference order — direction → meta-refresh
    → form (Crawl.hs:117-152) — then the store/extract/enqueue pipeline
    (Crawl.hs:153-162). Links discovered in round r enter the frontier in
    (discovering rank, extraction order) and become fetchable in round r+1.

Reference quirks replicated exactly (see crawl_logic.py for citations):
meta-refresh resolves against the originally scheduled URL; only the FINAL
fetch's redirect chain is marked completed (a direction hop leaves the
original URL un-completed and re-discoverable); a gated meta-refresh drops
the row entirely (nothing stored); include-filter failure at store time
drops everything including link extraction; quota gates only the store,
not completion marking or link extraction.

The Spark engine (plans/round.py) must reproduce this simulator's fetch
order (round, rank), final url_seen set, and stored-doc span sequences
exactly. Both sides share crawl_logic.py + functions/urls.py, so
equivalence is by construction; tests/test_trace_equivalence.py checks it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawler_spark import crawl_logic as cl
from crawler_spark.config import CrawlConfig
from crawler_spark.functions.urls import canonicalize, resolve


def _nub(xs: list[str]) -> list[str]:
    """Order-preserving dedup (Haskell nub)."""
    out: list[str] = []
    for x in xs:
        if x not in out:
            out.append(x)
    return out


@dataclass
class SimResult:
    fetch_order: list[tuple[int, int, str]] = field(default_factory=list)  # (round, rank, url)
    url_seen: dict[str, str] = field(default_factory=dict)  # url -> completed|failed
    stored: list[dict] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)
    frontier_remaining: list[dict] = field(default_factory=list)
    session_state: list[dict] = field(default_factory=list)  # cookie/url/round (A5)
    rounds_run: int = 0


class Simulator:
    def __init__(self, web: dict, config: CrawlConfig):
        docs = web["documents"]
        self.documents = {r["doc_id"]: r["spans"] for r in docs.to_dict("records")}
        self.redirect_map = {
            r["src_url"]: r["dst_url"] for r in web["redirects"].to_dict("records")
        } if len(web["redirects"]) else {}
        self.robots = {
            r["host"]: r for r in web["robots_rules"].to_dict("records")
        } if len(web["robots_rules"]) else {}
        self.url_patterns = list(config.url_include_patterns)
        self.domain_patterns = list(config.domain_include_patterns)
        self.directions = list(web.get("href_directions") or [])
        self.form_instructions = list(web.get("form_instructions") or [])
        self.cfg = config

        self.completed: set[str] = set()
        self.failed: set[str] = set()
        self.frontier: list[dict] = []  # pending rows
        self.seq = 0
        self.stored_count = 0
        # A5 cookie jar (getCookieList, Types.hs:32): deterministic
        # round-boundary re-spec — cookies observed in round r enter the
        # jar for round r+1 (the reference shares them mid-flight across
        # racing threads, which is exactly the nondeterminism §3.4 removes)
        self.jar: set[str] = set()
        self.round_cookies: list[tuple[str, str]] = []  # (cookie, setter url)
        self.res = SimResult()

    # -- helpers --------------------------------------------------------------
    def _error(self, kind: str, url: str | None, message: str, round_: int) -> None:
        self.res.errors.append({"kind": kind, "url": url, "message": message, "round": round_})

    def _robots_ok(self, url: str, host: str) -> bool:
        if not self.cfg.respect_robots:
            return True
        rule = self.robots.get(host)
        if rule is None:
            return True
        return cl.robots_allowed(url, host, rule.get("allow_prefixes"), rule.get("disallow_prefixes"))

    def _budget(self, host: str) -> int:
        delay = None
        rule = self.robots.get(host)
        if rule is not None:
            delay = rule.get("crawl_delay")
            if delay is not None and delay != delay:  # NaN from parquet
                delay = None
        return cl.host_budget(self.cfg.per_host_budget, delay)

    def _enqueue(self, url: str, host: str | None, round_: int, pending_urls: set[str], prio: int = 0) -> bool:
        """D3/D2 pipeline: include-filter → robots → checkNotDone → insert."""
        if not cl.include_match(url, host, self.url_patterns, self.domain_patterns):
            return False  # result ignored silently (Crawl.hs:162 mapM_)
        if host is None:
            # PoliteQueue.writeQueue domain-extraction failure: URL dropped
            self._error("GeneralError", url, "Could not get domain from url", round_)
            return False
        if not self._robots_ok(url, host):
            return False
        if url in self.completed or url in self.failed or url in pending_urls:
            return False
        self.frontier.append(
            {"url": url, "host": host, "priority": prio, "seq": self.seq, "discovered_round": round_}
        )
        pending_urls.add(url)
        self.seq += 1
        return True

    # -- seeding (S1/S2: Initialisation.hs:113-119, input order) --------------
    def seed(self, seed_urls: list[str]) -> None:
        pending = {f["url"] for f in self.frontier}
        for raw in seed_urls:
            url, host, err = canonicalize(raw.strip())
            if err is not None:
                self._error("GeneralError", raw, f"Could not canonicalise seed: {err}", 0)
                continue
            self._enqueue(url, host, 0, pending)

    # -- fetch-sim (A1: Fetch.hs:29-70) ----------------------------------------
    def _follow_redirects(self, requested: str) -> tuple[list[str] | None, list[str]]:
        """Returns (chain head-first | None on abort, traversed urls)."""
        visited = [requested]
        cur = requested
        hops = 0
        while cur in self.redirect_map:
            hops += 1
            if hops > self.cfg.max_redirects:
                return None, visited
            cur = self.redirect_map[cur]
            visited.append(cur)
        # nub(reverse-accumulated ++ [requested]) — head = final (Fetch.hs:40-43)
        chain: list[str] = []
        for u in reversed(visited):
            if u not in chain:
                chain.append(u)
        return chain, visited

    def _doc_size(self, spans) -> int:
        return sum(len(s.get("text") or "") + len(s.get("media_ref") or "") for s in spans)

    def _fetch_and_interact(self, scheduled_url: str, round_: int, gate_set: set[str]):
        """One scheduled URL through redirects + interaction branches.

        Returns ('doc', chain, spans, new_cookies) | ('failed', urls)
        | ('dropped',) — new_cookies = the final hop's cookies minus those
        already sent on its fetch (responseCookies \\ chain-sent,
        src/Crawl.hs:159); the caller shares them only after the store-time
        include filter passes (src/Crawl.hs:157-163).
        """
        current = scheduled_url
        hops = 0
        # chain-local cookie accumulation (src/Fetch.hs cookie threading):
        # cookies set by docs earlier in THIS interaction chain are sent
        # on the chain's later fetches, before any round-boundary sharing
        chain_cookies: set[str] = set()
        while True:
            chain, visited = self._follow_redirects(current)
            # POST fetch keys carry the urlencoded body behind a NUL
            # (DownloadRequest.hs:27-33); the doc lookup uses the full key,
            # but everything recorded (chains, marks, errors) sees the
            # plain action URL — mirror of the decide stage's strip
            final_key = chain[0] if chain is not None else None
            visited = _nub([cl.strip_post_key(u) for u in visited])
            if chain is None:
                self._error("CrawlError", scheduled_url,
                            f"Too many redirects from {cl.strip_post_key(current)}", round_)
                return ("failed", visited)
            chain = _nub([cl.strip_post_key(u) for u in chain])
            final = chain[0]
            spans = self.documents.get(final_key)
            if spans is None:
                self._error("CrawlError", scheduled_url, f"Fetch failed: {final}", round_)
                return ("failed", visited)
            if self._doc_size(spans) > self.cfg.max_content_bytes:
                self._error("CrawlError", scheduled_url, f"Content too large: {final}", round_)
                return ("failed", visited)
            # session gate: a cookie-gated doc without its cookie in the
            # round-start jar is an auth failure; spans never parsed
            req = cl.required_cookie(spans)
            if req is not None and req not in self.jar and req not in chain_cookies:
                self._error("CrawlError", scheduled_url, f"Unauthorized (cookie required): {final}", round_)
                return ("failed", visited)
            # chain-local accumulation only: cookies are NOT shared here —
            # sharing happens solely at store time with the include filter
            # passed (src/Crawl.hs:157-163); intermediate-hop and dropped
            # docs' cookies stay chain-local
            doc_cs = cl.doc_cookies(spans)
            new_cookies = [c for c in doc_cs if c not in chain_cookies]
            chain_cookies.update(doc_cs)
            if hops < self.cfg.max_interaction_hops:
                # branch 1: href direction (Crawl.hs:123-129)
                direction = cl.find_direction(final, spans, self.directions)
                if direction is not None:
                    current = direction
                    hops += 1
                    continue
                # branch 2: meta refresh, resolved against the *scheduled* URL
                # and gated through checkNotDone (Crawl.hs:130-143)
                raw_meta = cl.find_meta_refresh(spans)
                if raw_meta is not None:
                    target, _, kind, msg = resolve(scheduled_url, raw_meta)
                    if kind != "ok":
                        self._error("CrawlError", scheduled_url, f"Meta refresh resolve failed: {msg}", round_)
                        return ("dropped",)
                    if target in self.completed or target in self.failed or target in gate_set:
                        return ("dropped",)  # gated ⇒ nothing stored (Crawl.hs:138-140)
                    current = target
                    hops += 1
                    continue
                # branch 3: form submission (Crawl.hs:146-152)
                submit, _label, form_errors = cl.select_form(final, spans, self.form_instructions)
                for msg in form_errors:
                    self._error("GeneralError", final, msg, round_)
                if submit is not None:
                    current = submit
                    hops += 1
                    continue
            return ("doc", chain, spans, new_cookies)

    # -- the round loop --------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> SimResult:
        max_rounds = max_rounds if max_rounds is not None else self.cfg.max_rounds
        round_ = 0
        while round_ < max_rounds and self.frontier:
            if self.cfg.crawl_limit is not None and self.stored_count >= self.cfg.crawl_limit:
                break
            self._run_round(round_)
            round_ += 1
        self.res.rounds_run = round_
        self.res.frontier_remaining = list(self.frontier)
        return self.res

    def _host_delay(self, host: str) -> float | None:
        rule = self.robots.get(host)
        if rule is None:
            return None
        delay = rule.get("crawl_delay")
        if delay is not None and delay != delay:  # NaN from parquet
            delay = None
        return delay

    def _run_round(self, round_: int) -> None:
        # P2/P3: per-host FIFO truncation to budget, then global rank;
        # scheduler_mode="timing" admits by virtual departure time inside
        # the round window and orders globally by departure
        # (crawl_logic.timing_eta_ms — shared with plans/round.schedule)
        timing = getattr(self.cfg, "scheduler_mode", "budget") == "timing"
        window_ms = self.cfg.round_window_ms or self.cfg.per_host_budget * 1000
        by_host: dict[str, list[dict]] = {}
        for row in self.frontier:
            by_host.setdefault(row["host"], []).append(row)
        admitted: list[dict] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r["priority"], r["seq"]))
            if timing:
                delay = self._host_delay(host)
                for i, r in enumerate(rows, start=1):
                    eta = cl.timing_eta_ms(i, delay)
                    if eta >= window_ms:
                        break
                    admitted.append(dict(r, _eta=eta))
            else:
                admitted.extend(rows[: self._budget(host)])
        if timing:
            admitted.sort(key=lambda r: (r["_eta"], r["priority"], r["seq"]))
        else:
            admitted.sort(key=lambda r: (r["priority"], r["seq"]))

        admitted_urls = {r["url"] for r in admitted}
        pending_at_start = {r["url"] for r in self.frontier}
        # batch semantics (§3.4 re-specification): the meta-refresh
        # checkNotDone gate evaluates against ROUND-START state — url_seen
        # snapshot + pending frontier + this round's admitted set — so the
        # engine's one-job-per-round plan can reproduce it exactly
        gate_set = self.completed | self.failed | pending_at_start | admitted_urls

        # consume admitted rows from the frontier
        self.frontier = [r for r in self.frontier if r["url"] not in admitted_urls]
        pending_urls = {r["url"] for r in self.frontier}

        # link candidates are collected during the round and admitted at the
        # END of the round (batch semantics): dedup against end-of-round
        # url_seen + remaining pending, first discovery wins, ordered by
        # (discovering rank, extraction order)
        candidates: list[tuple[str, str | None, int]] = []

        for rank, row in enumerate(admitted, start=1):
            url = row["url"]
            self.res.fetch_order.append((round_, rank, url))
            result = self._fetch_and_interact(url, round_, gate_set)
            if result[0] == "failed":
                for u in result[1]:
                    if u not in self.completed:
                        self.failed.add(u)
                continue
            if result[0] == "dropped":
                continue
            _, chain, spans, new_cookies = result
            final = chain[0]
            # F1 at store time, on the final redirect target (Crawl.hs:157)
            _, final_host, _ = canonicalize(final)
            if not cl.include_match(final, final_host, self.url_patterns, self.domain_patterns):
                continue  # nothing: no marks, no store, no links, no cookie share (Crawl.hs:156-162)
            # A5: shareCookies(responseCookies \\ cookiesSent) — only now,
            # include-passed (Crawl.hs:159); first setter wins attribution
            for c in new_cookies:
                self.round_cookies.append((c, final))
            # D4: mark every chain member completed (Crawl.hs:173-174)
            for u in chain:
                self.completed.add(u)
                self.failed.discard(u)
            # F4 quota gates only the store (Crawl.hs:178-183)
            if self.cfg.crawl_limit is None or self.stored_count < self.cfg.crawl_limit:
                self.res.stored.append(
                    {
                        "url": url,
                        "final_url": final,
                        "redirect_chain": chain,
                        "spans": spans,
                        "round": round_,
                        "rank_in_round": rank,
                    }
                )
                self.stored_count += 1
            # link extraction (H2/U6), extraction order; admission deferred.
            # Under depth_priority a link inherits the discovering page's
            # priority + 1 (BFS depth; first discovery fixes it)
            prio = (row["priority"] + 1) if self.cfg.depth_priority else 0
            for raw in cl.extract_raw_links(spans):
                link, lhost, kind, msg = resolve(final, raw)
                if kind == "warning":
                    self._error("CrawlWarning", final, msg, round_)
                    continue
                if kind == "error":
                    self._error("CrawlError", final, msg, round_)
                    continue
                candidates.append((link, lhost, prio))

        # end-of-round admission (D1-D3 as one batch)
        for link, lhost, prio in candidates:
            if link in self.completed or link in self.failed:
                continue
            self._enqueue(link, lhost, round_, pending_urls, prio)

        # D6/A5: new cookies (responseCookies \\ jar) committed for the
        # next round; first setter in (rank, hop) order wins attribution
        for cookie, setter in self.round_cookies:
            if cookie not in self.jar:
                self.jar.add(cookie)
                self.res.session_state.append({"cookie": cookie, "url": setter, "round": round_})
        self.round_cookies = []

        for url, state in (
            [(u, "completed") for u in self.completed] + [(u, "failed") for u in self.failed]
        ):
            self.res.url_seen[url] = state
