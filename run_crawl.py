"""CLI driver: `spark-submit [--py-files engine.zip] run_crawl.py --config run.json`
(SURVEY.md §3.1 — the engine analog of the reference's `main`,
src/Main.hs:22-68 + src/Initialisation.hs:38-55).

Config JSON:
{
  "state_dir": "...",                crawl state tables root
  "documents": ".../documents.parquet",
  "redirects": ".../redirects.parquet",       (optional)
  "robots_rules": ".../robots_rules.parquet", (optional)
  "seeds": ["http://...", ...],               (S1: -u)
  "seed_file": ".../seeds.txt",               (S2: -uf, one URL per line)
  "url_include_patterns": [...],              (S3: -i/-if)
  "domain_include_patterns": [...],           (S3: -d)
  "form_instructions_file": "...",            (S4: -ff, reference format)
  "href_directions_file": "...",              (S5: -df, reference format)
  "crawl_limit": 1000,                        (S7: -l)
  "per_host_budget": 1, "max_rounds": 100, "resume": false,
  "scheduler_mode": "budget",                 (P7+: "timing" = virtual-time
      politeness: admit by departure eta inside the round window, fetch
      order by departure time)
  "round_window_ms": null,                    (timing mode; default =
      per_host_budget seconds)
  "warc_out": ".../warc",                     (S8/S11: -wf, optional export)
  "http_fetch": false,                        (S9 real path: real sockets)
  "seen_filter": "bloom",                     (D1 sidecar: "bloom" | "cuckoo";
      cuckoo supports recrawl deletion — see crawler_spark/cuckoo.py)
  "cuckoo_entries_per_bucket": 16384,         (cuckoo sizing; see the
      sizing note in cuckoo.py — keep distinct URLs per partition under
      ~0.84 * entries * 4)
  "proxy": "addr:port",                       (S6: -p; real path only)
  "ignore_bad_https_certs": false             (Settings.hs:14-15; the
      reference hardcodes True — set true explicitly for parity; the CLI
      defaults to certificate verification ON, matching CrawlConfig)
}

With "http_fetch": true the documents/redirects tables are not read —
the crawl fetches over the network (optionally through "proxy") via
crawler_spark/plans/fetch_http.py; bodies must be span-document JSON
(production: put an HTML→spans converter at the marked seam).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    args = ap.parse_args()
    with open(args.config) as f:
        conf = json.load(f)

    from crawler_spark.config import (
        CrawlConfig,
        parse_form_instructions,
        parse_href_directions,
    )
    from crawler_spark.driver import CrawlRun
    from crawler_spark.session import build_session

    spark = SparkSession.getActiveSession() or build_session(app_name="crawler_spark")

    seeds = list(conf.get("seeds", []))
    if conf.get("seed_file"):
        with open(conf["seed_file"]) as f:  # S2: split lines, trim, drop blanks
            seeds += [ln.strip() for ln in f if ln.strip()]

    directions, forms = [], []
    if conf.get("href_directions_file"):
        with open(conf["href_directions_file"]) as f:
            directions = parse_href_directions(f.read())
    if conf.get("form_instructions_file"):
        with open(conf["form_instructions_file"]) as f:
            forms = parse_form_instructions(f.read())

    http_fetch = bool(conf.get("http_fetch", False))
    cfg = CrawlConfig(
        seeds=tuple(seeds),
        url_include_patterns=tuple(conf.get("url_include_patterns", [])),
        domain_include_patterns=tuple(conf.get("domain_include_patterns", [])),
        crawl_limit=conf.get("crawl_limit"),
        per_host_budget=int(conf.get("per_host_budget", 1)),
        max_rounds=int(conf.get("max_rounds", 1000)),
        respect_robots=bool(conf.get("respect_robots", True)),
        scheduler_mode=str(conf.get("scheduler_mode", "budget")),
        round_window_ms=conf.get("round_window_ms"),
        proxy=conf.get("proxy"),
        ignore_bad_https_certs=bool(conf.get("ignore_bad_https_certs", False)),
    )

    empty_redirects = spark.createDataFrame([], "src_url string, dst_url string, status_code int")
    if http_fetch:
        documents = spark.createDataFrame([], "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        redirects = empty_redirects
    else:
        documents = spark.read.parquet(conf["documents"])
        redirects = spark.read.parquet(conf["redirects"]) if conf.get("redirects") else empty_redirects
    robots = spark.read.parquet(conf["robots_rules"]) if conf.get("robots_rules") else None

    run = CrawlRun(
        spark, cfg, conf["state_dir"], documents, redirects, robots,
        directions=directions, form_instructions=forms, http_fetch=http_fetch,
        seen_filter=str(conf.get("seen_filter", "bloom")),
        cuckoo_entries_per_bucket=int(conf.get("cuckoo_entries_per_bucket", 1 << 14)),
    )
    if conf.get("resume"):
        r = run.resume()
        print(f"resumed from round {r}")
    else:
        run.seed(seeds)
    rounds = run.run()
    print(
        json.dumps(
            {"rounds_run": rounds, "stored_total": run.stored_total, "next_seq": run.next_seq}
        )
    )
    if conf.get("warc_out"):
        from crawler_spark.warc import export_warc

        export_warc(run.catalog.crawled_docs.read(spark), conf["warc_out"])


if __name__ == "__main__":
    main()
