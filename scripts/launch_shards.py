"""Host-side shard launcher (the reference's SLURM-array replacement).

The reference scales with SLURM array jobs, one GPU per index range
(`docs/COCO_PIPELINE.md:174-186`). This launcher provides the same
index-range sharding on one machine or across hosts: it splits
[start, end) into N contiguous shards and runs one pipeline-runner process
per shard, streaming their output. Each process uses all of its visible
devices via the SPMD mesh, so shards map naturally to hosts (or to device
subsets via JAX's standard visibility controls).

Usage:
  python scripts/launch_shards.py fast --num_shards 4 \
      --start_index 0 --end_index 5000 --split val \
      --save_dir results/ --dataset_root /data/coco [config overrides...]
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, required=True)
    args, passthrough = p.parse_known_args()

    total = args.end_index - args.start_index
    per = (total + args.num_shards - 1) // args.num_shards
    procs = []
    for s in range(args.num_shards):
        a = args.start_index + s * per
        b = min(args.start_index + (s + 1) * per, args.end_index)
        if a >= b:
            continue
        cmd = [
            sys.executable, "-u", "-m", "labelany3d_tpu.pipeline.runner",
            args.stage, "--start_index", str(a), "--end_index", str(b),
        ] + passthrough
        print(f"[shard {s}] {a}..{b}", flush=True)
        procs.append((s, subprocess.Popen(cmd)))

    rc = 0
    for s, proc in procs:
        code = proc.wait()
        print(f"[shard {s}] exited {code}", flush=True)
        rc = rc or code
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
