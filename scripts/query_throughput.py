#!/usr/bin/env python
"""Multi-client sustained query throughput vs the Ray actor-pool executor.

Round-5 VERDICT item 6: the per-round searches/s number is single-client;
this probe measures the actor pool under N CONCURRENT clients — the shape a
served index actually sees.  Clients are driver threads, each with its own
IndexSearcher facade (private ScoreContext LRU) SHARING one actor pool:
ray.get releases the GIL, so N threads genuinely overlap their fan-out
calls on the pool, which is the closest a single sandbox process gets to N
independent query frontends.

Usage: python scripts/query_throughput.py [--turns 1000000] [--actors 8]
       [--clients 1 4 16] [--seconds 5]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import threading
import time
from collections import OrderedDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _client_searcher(base):
    """Thread-private facade over the SHARED actor pool: copy the searcher,
    give it its own ScoreContext LRU (the only driver-side mutable state —
    state/searcher.py:538)."""
    s = copy.copy(base)
    s._ctx_cache = OrderedDict()
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--actors", type=int, default=8)
    ap.add_argument("--clients", nargs="+", type=int, default=[1, 4, 16])
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--index-dir", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    import bench
    from whoosh_reloaded_ray.pipelines.build import build_index
    from whoosh_reloaded_ray.state.searcher import IndexSearcher

    idx = args.index_dir or f"/tmp/wrr_qtp/idx-{args.turns}"
    has_manifest = os.path.isdir(idx) and any(
        f.startswith("manifest-") and f.endswith(".json") for f in os.listdir(idx)
    )
    if not has_manifest:
        corpus = bench._synth_corpus(args.turns)
        # several segments so the pool's actors each pin real work
        build_index(
            [corpus], idx, num_shards=16, partition_rows=8192,
            rows_per_segment=max(args.turns // 8, 1),
        )

    base = IndexSearcher(idx, executor="ray", num_actors=args.actors)
    qs = list(bench._query_set().values())
    for q in qs:
        base.search(q, limit=10)  # warm the pool caches

    out = {
        "metric": "multi-client sustained searches/s (shared actor pool)",
        "turns": args.turns,
        "actors": args.actors,
        "num_cpus": args.cpus,
        "seconds_per_level": args.seconds,
        "levels": {},
    }
    for n in args.clients:
        counts = [0] * n
        stop = time.perf_counter() + args.seconds

        def run(i):
            s = _client_searcher(base)
            j = i  # de-phase clients across the query mix
            while time.perf_counter() < stop:
                s.search(qs[j % len(qs)], limit=10)
                j += 1
                counts[i] += 1

        threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        el = time.perf_counter() - t0
        out["levels"][n] = {
            "clients": n,
            "total_searches": sum(counts),
            "searches_per_sec": sum(counts) / el,
        }
        print(f"== {n} clients: {out['levels'][n]}", file=sys.stderr, flush=True)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
