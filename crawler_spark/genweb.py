"""Deterministic synthetic-web generator (FIXTURES.md; SURVEY.md §7 step 1).

Generates the crawl input tables — documents (interleaved text/media spans
per BASELINE.json:input_hint), redirects, robots_rules, seeds, config
fixtures — as pandas DataFrames from a fixed seed. Both the reference
simulator and the Spark engine consume the same generated tables, so trace
equivalence is well-defined.

Exercised reference behaviors:
- relative/absolute/messy/malformed/mailto/fragment/space hrefs
  (src/Urls.hs:72-98 error paths, 74, 87-91)
- redirect chains incl. a >20-hop abort chain (src/Settings.hs:17-18)
- meta-refresh spans (src/Parse.hs:22-38)
- form spans + instructions (src/Forms.hs:22-104)
- href-direction pages (src/Directions.hs:20-43)
- hot-host skew (scheduler salting, SURVEY.md P6)
- /private subtrees + robots rules (north_rule addition)
"""

from __future__ import annotations

import json
import os
import random
from urllib.parse import quote

import pandas as pd

from crawler_spark import crawl_logic as _cl
from crawler_spark.config import FormInstruction, HrefDirection


def _span(kind: str, text: str | None = None, media_ref: str | None = None, offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)


def generate(
    n_docs: int = 500,
    n_hosts: int = 50,
    seed: int = 42,
    hot_host_frac: float = 0.25,
    links_per_doc: int = 6,
    relative_rate: float = 0.35,
    messy_rate: float = 0.15,
    malformed_rate: float = 0.04,
    mailto_rate: float = 0.03,
    space_rate: float = 0.02,
    media_rate: float = 0.10,
    meta_refresh_rate: float = 0.02,
    form_rate: float = 0.02,
    direction_rate: float = 0.02,
    private_rate: float = 0.05,
    cookie_gate_rate: float = 0.03,
    n_redirects: int = 30,
    long_chain: bool = True,
) -> dict[str, object]:
    rng = random.Random(seed)
    # independent stream for session-cookie features so enabling them does
    # not shift the randomness of the rest of the web
    rng_cookie = random.Random(seed ^ 0x5EED)
    hosts = [f"host{i}.example.org" for i in range(n_hosts)]

    # --- URL universe: hot host gets hot_host_frac of all pages -------------
    doc_urls: list[str] = []
    host_of: dict[str, str] = {}
    per_host_pages: dict[str, list[str]] = {h: [] for h in hosts}
    for i in range(n_docs):
        if rng.random() < hot_host_frac:
            h = hosts[0]
        else:
            h = hosts[1 + rng.randrange(n_hosts - 1)] if n_hosts > 1 else hosts[0]
        private = rng.random() < private_rate
        path = f"/private/p{len(per_host_pages[h])}" if private else f"/p{len(per_host_pages[h])}"
        url = f"http://{h}{path}"
        doc_urls.append(url)
        host_of[url] = h
        per_host_pages[h].append(url)

    # --- redirect edge table (src/Fetch.hs:46-70) ----------------------------
    redirect_rows: list[dict] = []
    redirect_srcs: list[str] = []
    for j in range(n_redirects):
        h = hosts[rng.randrange(n_hosts)]
        dst = doc_urls[rng.randrange(len(doc_urls))]
        hops = rng.randint(1, 3)
        src = f"http://{h}/r{j}"
        redirect_srcs.append(src)
        cur = src
        for k in range(hops - 1):
            nxt = f"http://{h}/r{j}x{k}"
            redirect_rows.append({"src_url": cur, "dst_url": nxt, "status_code": 301})
            cur = nxt
        redirect_rows.append({"src_url": cur, "dst_url": dst, "status_code": 302})
    if long_chain:
        # >20 hops — exercises the maxRedirects abort (src/Settings.hs:17-18)
        h = hosts[0]
        cur = f"http://{h}/rlong"
        redirect_srcs.append(cur)
        for k in range(25):
            nxt = f"http://{h}/rlongx{k}"
            redirect_rows.append({"src_url": cur, "dst_url": nxt, "status_code": 301})
            cur = nxt
        redirect_rows.append({"src_url": cur, "dst_url": doc_urls[0], "status_code": 302})

    # --- href formatting variants -------------------------------------------
    def format_href(target: str, on_url: str) -> str:
        r = rng.random()
        t_host = host_of.get(target)
        on_host = host_of.get(on_url)
        path = target.split(t_host, 1)[1] if t_host and t_host in target else target
        if r < malformed_rate:
            return rng.choice(["ht!tp://%", "http://bad domain/\x01", "://nothing"])
        r -= malformed_rate
        if r < mailto_rate:
            return f"mailto:user{rng.randrange(99)}@example.org"
        r -= mailto_rate
        if r < space_rate and t_host:
            return f"http://{t_host}{path} "  # trailing space → trimmed by parse
        r -= space_rate
        if r < relative_rate and t_host == on_host:
            rr = rng.random()
            if rr < 0.4:
                return path  # root-relative? no: "/p3" IS root-relative
            if rr < 0.7:
                return path[1:]  # relative to host root dir ("p3")
            return path + "#frag" + str(rng.randrange(9))
        if rng.random() < messy_rate and t_host:
            variant = rng.random()
            if variant < 0.4:
                return f"HTTP://{t_host.upper()}{path}"
            if variant < 0.7:
                return f"http://{t_host}:80{path}"
            return f"http://{t_host}{path}#sec{rng.randrange(9)}"
        return target

    # --- direction rules (src/Directions.hs) ---------------------------------
    direction_pages = [u for u in doc_urls if rng.random() < direction_rate]
    href_directions = [
        HrefDirection(label="follow-next", url_regex="/p[0-9]+$", href_regex="NEXT:([A-Za-z0-9/._-]+)")
    ]

    # --- form instructions (src/Forms.hs, eg/form_instructions.cfg) ---------
    form_instructions = [
        FormInstruction(
            label="login",
            url_regex="/p[0-9]+$",
            form_action_regex="/login$",
            params=(("user", "admin"), ("pass", "hunter2")),
        )
    ]

    # --- documents with interleaved spans ------------------------------------
    docs: list[dict] = []
    extra_docs: list[dict] = []
    seen_extra: set[str] = set()
    for url in doc_urls:
        h = host_of[url]
        spans: list[dict] = []
        off = 0
        n_text = rng.randint(1, 3)
        is_direction = url in direction_pages
        for t in range(n_text):
            words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(5, 15)))
            if is_direction and t == 0:
                # body carries the direction target for HrefRegex capture
                target_path = per_host_pages[h][rng.randrange(len(per_host_pages[h]))]
                rel = target_path.split(h, 1)[1]
                words += f" NEXT:{rel} trailing"
            spans.append(_span("text", text=words, offset=off))
            off += 1
        n_links = rng.randint(1, links_per_doc)
        for _ in range(n_links):
            if redirect_srcs and rng.random() < 0.06:
                target = redirect_srcs[rng.randrange(len(redirect_srcs))]
            else:
                # 50% same-host bias
                if rng.random() < 0.5 and len(per_host_pages[h]) > 1:
                    target = per_host_pages[h][rng.randrange(len(per_host_pages[h]))]
                else:
                    target = doc_urls[rng.randrange(len(doc_urls))]
            spans.append(_span("link", text=format_href(target, url), offset=off))
            off += 1
        if rng.random() < media_rate:
            spans.append(_span("media", media_ref=f"http://{h}/media/m{rng.randrange(999)}.bin", offset=off))
            off += 1
        if rng.random() < meta_refresh_rate:
            target = doc_urls[rng.randrange(len(doc_urls))]
            t_host = host_of[target]
            raw = target.split(t_host, 1)[1] if t_host == h else target
            spans.append(_span("meta_refresh", text=raw, offset=off))
            off += 1
        if rng.random() < form_rate:
            inputs = [
                {"key": "user", "value": ""},
                {"key": "pass", "value": ""},
                {"key": "csrf", "value": f"tok{rng.randrange(9999)}"},
            ]
            form = {"method": "POST", "action": "/login", "inputs": inputs}
            spans.append(_span("form", text=json.dumps(form, sort_keys=True), offset=off))
            off += 1
            # materialize the form-submission result page under the POST
            # fetch key (action URL + NUL + urlencoded body — the form is
            # method=POST, so the body never shows in the recorded URLs,
            # matching DownloadRequest.hs:27-33)
            merged = {"user": "admin", "pass": "hunter2", "csrf": inputs[2]["value"]}
            submit_url = _cl.post_key(f"http://{h}/login", sorted(merged.items()))
            if submit_url not in seen_extra:
                seen_extra.add(submit_url)
                # login response sets the host's session cookie (A5)
                extra_docs.append(
                    {
                        "doc_id": submit_url,
                        "spans": [
                            _span("text", text="welcome back " + h, offset=0),
                            _span("set_cookie", text=f"session-{h}", offset=1),
                        ],
                    }
                )
        # cookie-gated pages: fetchable only once the host's login cookie
        # is in the session jar (a later round than the form submission)
        if rng_cookie.random() < cookie_gate_rate:
            spans.append(_span("require_cookie", text=f"session-{h}", offset=off))
            off += 1
        docs.append({"doc_id": url, "spans": spans})
    docs.extend(extra_docs)

    # --- robots rules (north_rule addition) ----------------------------------
    robots_rows = []
    for i, h in enumerate(hosts):
        if i % 3 == 0:
            robots_rows.append(
                {
                    "host": h,
                    "allow_prefixes": ["/private/p1"] if i % 6 == 0 else [],
                    "disallow_prefixes": ["/private"],
                    "crawl_delay": 2.0 if i % 5 == 0 else None,
                }
            )

    # --- seeds (input order matters, src/Initialisation.hs:113-119) ----------
    seed_urls: list[str] = []
    for h in hosts[: min(5, n_hosts)]:
        if per_host_pages[h]:
            seed_urls.append(per_host_pages[h][0])
    if redirect_srcs:
        seed_urls.append(redirect_srcs[0])
    seeds = pd.DataFrame({"seq": range(len(seed_urls)), "url": seed_urls})

    include_patterns = pd.DataFrame([{"pattern": "example.org", "scope": "domain"}])

    return {
        "documents": pd.DataFrame(docs),
        "redirects": pd.DataFrame(redirect_rows, columns=["src_url", "dst_url", "status_code"]),
        "robots_rules": pd.DataFrame(
            robots_rows, columns=["host", "allow_prefixes", "disallow_prefixes", "crawl_delay"]
        ),
        "seeds": seeds,
        "include_patterns": include_patterns,
        "form_instructions": form_instructions,
        "href_directions": href_directions,
    }


def write_fixture(out_dir: str, **kwargs) -> dict[str, object]:
    """Materialize a generated web to parquet (idempotent, seeded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = generate(**kwargs)
    os.makedirs(out_dir, exist_ok=True)
    span_type = pa.list_(
        pa.struct(
            [
                pa.field("kind", pa.string(), nullable=False),
                pa.field("text", pa.string()),
                pa.field("media_ref", pa.string()),
                pa.field("offset", pa.int32(), nullable=False),
            ]
        )
    )
    schemas = {
        "documents": pa.schema([pa.field("doc_id", pa.string(), nullable=False), pa.field("spans", span_type)]),
        "redirects": pa.schema(
            [
                pa.field("src_url", pa.string(), nullable=False),
                pa.field("dst_url", pa.string(), nullable=False),
                pa.field("status_code", pa.int32(), nullable=False),
            ]
        ),
        "robots_rules": pa.schema(
            [
                pa.field("host", pa.string(), nullable=False),
                pa.field("allow_prefixes", pa.list_(pa.string())),
                pa.field("disallow_prefixes", pa.list_(pa.string())),
                pa.field("crawl_delay", pa.float64()),
            ]
        ),
        "seeds": pa.schema([pa.field("seq", pa.int32(), nullable=False), pa.field("url", pa.string(), nullable=False)]),
        "include_patterns": pa.schema([pa.field("pattern", pa.string()), pa.field("scope", pa.string())]),
    }
    for name in ("documents", "redirects", "robots_rules", "seeds", "include_patterns"):
        df = data[name]
        table = pa.Table.from_pandas(df, schema=schemas[name], preserve_index=False)
        # small row groups keep the file splittable: Spark parallelism on a
        # parquet scan is bounded by row-group granularity (a single-row-
        # group file serializes every downstream fused stage onto one task)
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=32768)
    # config fixtures as JSON sidecars
    with open(os.path.join(out_dir, "config_fixtures.json"), "w") as f:
        json.dump(
            {
                "form_instructions": [fi.__dict__ | {"params": list(map(list, fi.params))} for fi in data["form_instructions"]],
                "href_directions": [hd.__dict__ for hd in data["href_directions"]],
            },
            f,
            default=str,
        )
    return data
