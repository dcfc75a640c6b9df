"""Aggregate sharded full-test-protocol results into one metric table.

The reference protocol (`/root/reference/launch.py:119-127` --test) is a
single `trainer.test()` over ~200 views.  On this host the axon TPU
tunnel hangs with ~2h MTBF, so the protocol is run as S interleaved
shards of n views each (`scripts/test_ckpt.py ... dataset.n_images=n
dataset.pose_phase=i/S`, i=0..S-1 — see
`rise_sdf_tpu/datasets/synthetic.py:camera_poses`), giving S*n distinct
cameras.  Each shard prints one ``test: {...}`` dict of per-shard view
means; equal shard sizes make the protocol mean the plain mean of shard
means, which this script computes.

Usage: python scripts/aggregate_test_shards.py LOG [LOG ...]
"""

import ast
import sys


def parse_log(path):
    """Return the last ``test: {...}`` dict in the log, or None."""
    result = None
    with open(path) as f:
        for line in f:
            if line.startswith("test:"):
                result = ast.literal_eval(line[len("test:"):].strip())
    return result


def main():
    logs = sys.argv[1:]
    if not logs:
        sys.exit(__doc__)
    shards = []
    for p in logs:
        d = parse_log(p)
        if d is None:
            print(f"WARNING: no 'test:' line in {p} — skipped", flush=True)
            continue
        shards.append((p, d))
    if not shards:
        sys.exit("no shard results found")
    keys = sorted({k for _, d in shards for k in d})
    print(f"{len(shards)} shards: {[p for p, _ in shards]}")
    agg = {}
    for k in keys:
        vals = [d[k] for _, d in shards if k in d]
        if len(vals) != len(shards):
            print(f"WARNING: {k} present in only {len(vals)}/{len(shards)} "
                  "shards", flush=True)
        agg[k] = sum(vals) / len(vals)
        print(f"{k:>22s}: {agg[k]:.4f}   (shards: "
              + " ".join(f"{v:.3f}" for v in vals) + ")")
    print("aggregate:", {k: round(v, 4) for k, v in agg.items()})


if __name__ == "__main__":
    main()
