"""Vectorized parse/extract stages (H1–H5, §2.6 branches 1–3).

Both stages are `mapInPandas` over Arrow batches — the only Python in the
round, and it runs exactly once per fetched document per interaction hop
(the analog of the reference's tagsoup parse, src/Crawl.hs:120). The
actual semantics live in crawl_logic.py, shared verbatim with the oracle
simulator, so engine-vs-simulator equivalence is by construction.

Branch order per row replicates processResult (src/Crawl.hs:117-153):
direction → meta-refresh → form → store. The meta-refresh checkNotDone
gate (src/Crawl.hs:134-140) is NOT applied here — it needs the round-start
seen/pending sets, which the round plan applies as a join right after.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from crawler_spark import crawl_logic as cl
from crawler_spark.functions.urls import canonicalize, resolve

ERROR_STRUCT = "array<struct<kind:string,url:string,message:string>>"

DECISION_SCHEMA = (
    "rank bigint, scheduled_url string, final_url string, final_host string, "
    "decision string, next_url string, hops int, visited array<string>, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    f"errors {ERROR_STRUCT}"
)

LINKS_SCHEMA = (
    "rank bigint, extraction_order int, final_url string, "
    "url string, host string, kind string, message string"
)


def make_decide_branches(directions, form_instructions, max_interaction_hops: int):
    """Returns a mapInPandas function over rows
    (rank, scheduled_url, final_url, hops, visited, spans). `visited` is
    the redirect traversal of THIS hop's fetch, passed through untouched —
    store rows derive their completed chain from it (src/Fetch.hs:40-43)."""

    def decide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                spans = list(row.spans)
                final = row.final_url
                errors: list[dict] = []
                decision, next_url = "store", None
                if row.hops < max_interaction_hops:
                    target = cl.find_direction(final, spans, directions)
                    if target is not None:
                        decision, next_url = "direction", target
                    else:
                        raw_meta = cl.find_meta_refresh(spans)
                        if raw_meta is not None:
                            t, _, kind, msg = resolve(row.scheduled_url, raw_meta)
                            if kind != "ok":
                                decision = "meta_error"
                                errors.append(
                                    {
                                        "kind": "CrawlError",
                                        "url": row.scheduled_url,
                                        "message": f"Meta refresh resolve failed: {msg}",
                                    }
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
                final_host = canonicalize(final)[1] if decision == "store" else None
                out.append(
                    (
                        row.rank,
                        row.scheduled_url,
                        final,
                        final_host,
                        decision,
                        next_url,
                        row.hops,
                        list(row.visited),
                        spans if decision == "store" else None,
                        errors,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "rank",
                    "scheduled_url",
                    "final_url",
                    "final_host",
                    "decision",
                    "next_url",
                    "hops",
                    "visited",
                    "spans",
                    "errors",
                ],
            )

    return decide


def extract_links(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas over (rank, final_url, spans): one output row per raw
    link candidate (H2: 'link' spans + 'media' media_refs, offset order),
    resolved against the final URL (U5/U6). kind ∈ ok|warning|error."""
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            for i, raw in enumerate(cl.extract_raw_links(list(row.spans))):
                url, host, kind, msg = resolve(row.final_url, raw)
                out.append((row.rank, i, row.final_url, url, host, kind, msg))
        yield pd.DataFrame(
            out,
            columns=["rank", "extraction_order", "final_url", "url", "host", "kind", "message"],
        )
