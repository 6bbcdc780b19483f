"""Trainer cost vs merge count (VERDICT r13 #3): wall time of
train_stream_bpe at increasing n_merges over the same corpus, split
into the one-off distributed chunk-count aggregation and the driver
greedy loop, plus the driver-state bound evidence (units <= vocab_cap,
live pair-index size). Expect ~linear in merges over the vocab-capped
chunk table.

Usage: python tools/bpe_train_scale.py [sf_dir] [n ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ns = [int(a) for a in sys.argv[2:]] or [384, 512, 1024, 2048, 4096]

    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators import bpe_stream as BS
    from ballista_extensions_spark.session import get_session

    spark = get_session("bpe-train-scale")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    docs.count()

    t0 = time.time()
    units0, weights0 = BS.collect_chunk_table(docs)
    agg_sec = time.time() - t0
    out = {
        "sf_dir": sf_dir,
        "agg_sec": round(agg_sec, 2),
        "n_units": len(units0),
        "points": [],
    }
    for n in ns:
        units = [list(u) for u in units0]  # loop mutates in place
        t0 = time.time()
        merges = BS.greedy_merge_loop(units, list(weights0), n)
        loop = time.time() - t0
        out["points"].append(
            {"n_merges": n, "got": len(merges), "loop_sec": round(loop, 3)}
        )
        print(
            f"n={n}: got {len(merges)} merges, loop {loop:.3f}s "
            f"(+ one-off agg {agg_sec:.2f}s)",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
