"""One taskset-pinned local[2] vs local[8] crawl pair — the bench's
scaling measurement in isolation, for A/B-ing round-size / plan changes.

Usage: PYTHONPATH=/root/repo SPARK_GRAFT_BUDGET=900 python tools/scaling_pair.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    bench.ensure_benchweb()
    probe = bench.cpu_probe(2, 8)
    print("PROBE " + json.dumps(probe), flush=True)
    low = bench.crawl_bench_pinned(2)
    print("LOW " + json.dumps(low), flush=True)
    high = bench.crawl_bench_pinned(8)
    print("HIGH " + json.dumps(high), flush=True)
    eff = (high["best_round_urls_per_sec"] / low["best_round_urls_per_sec"]) / 4
    eff_wall = (high["urls_per_sec"] / low["urls_per_sec"]) / 4
    probe2 = bench.cpu_probe(2, 8)
    print("PROBE " + json.dumps(probe2), flush=True)
    print(
        f"EFFICIENCY steady={eff:.3f} total_wall={eff_wall:.3f} "
        f"budget={bench.PER_HOST_BUDGET} probes="
        f"[{probe['ceiling_efficiency']},{probe2['ceiling_efficiency']}]",
        flush=True,
    )


if __name__ == "__main__":
    main()
