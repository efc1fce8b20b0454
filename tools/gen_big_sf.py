#!/usr/bin/env python3
"""Parallel deterministic transcript generation for big scale factors.

``fixtures.gen_rows`` is a single sequential RNG stream — perfect for
the gate SFs but ~64 min single-threaded at sf=10 (10M turns).  This
tool generates the SAME distribution (same fragment families, same
LogNormal length law, same hot-conversation skew, same hang-hazard
suffix scrub — it calls ``fixtures.make_turn_text`` directly) as N
independent shards, each with its own derived seed, written as one
parquet file per shard.  Deterministic for a given (sf, shards):
re-running produces byte-identical files.

Shard conv_ids are namespaced (``c{shard}_{seq}``) so they never
collide; timestamps interleave shards on a global 60 s conversation
cadence like the sequential generator.

Usage: python3 tools/gen_big_sf.py SF OUT_DIR [--shards N] [--workers N]
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys
from datetime import timedelta
from multiprocessing import Pool

sys.path[:0] = ["/root/repo"]

from html_parser_spark.fixtures import EPOCH, SEED, make_turn_text  # noqa: E402

ROLES = ("user", "assistant", "tool")
BATCH_ROWS = 50_000


def _write_shard(task) -> tuple[int, int, int]:
    shard, n_shard, n_shards, out_dir = task
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    rng = random.Random(f"{SEED}:big:{n_shards}:{shard}")
    path = os.path.join(out_dir, f"part-{shard:04d}.parquet")
    tmp = path + ".inprogress"
    writer = pq.ParquetWriter(tmp, schema)
    cols = {k: [] for k in schema.names}
    produced = 0
    conv_seq = 0
    bytes_out = 0

    def flush():
        nonlocal cols
        if cols["conv_id"]:
            writer.write_table(
                pa.Table.from_pydict(cols, schema=schema),
                row_group_size=8192,
            )
            cols = {k: [] for k in schema.names}

    while produced < n_shard:
        conv_id = f"c{shard:03d}_{conv_seq:06d}"
        hot = rng.random() < 0.01
        n_turns = int(math.exp(rng.gauss(2.0, 1.0)))
        n_turns = max(1, min(n_turns, 64))
        if hot:
            n_turns *= 100
        # global cadence: shards interleave on the 60 s conversation grid
        base_ts = EPOCH + timedelta(
            seconds=(conv_seq * n_shards + shard) * 60
        )
        for turn_idx in range(n_turns):
            role = ROLES[turn_idx % 3]
            text = make_turn_text(rng)
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(turn_idx)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append(
                f"tool{rng.randint(0, 9)}" if role == "tool" else ""
            )
            cols["ts"].append(base_ts + timedelta(seconds=turn_idx))
            bytes_out += len(text)
            produced += 1
            if len(cols["conv_id"]) >= BATCH_ROWS:
                flush()
            if produced >= n_shard:
                break
        conv_seq += 1
    flush()
    writer.close()
    os.replace(tmp, path)
    return shard, produced, bytes_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", type=float)
    ap.add_argument("out_dir")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--workers", type=int, default=24)
    args = ap.parse_args()

    n_target = int(args.sf * 1_000_000)
    os.makedirs(args.out_dir, exist_ok=True)
    base = n_target // args.shards
    tasks = [
        (s, base + (n_target % args.shards if s == 0 else 0), args.shards,
         args.out_dir)
        for s in range(args.shards)
    ]
    total = 0
    total_bytes = 0
    with Pool(args.workers) as pool:
        for shard, produced, bytes_out in pool.imap_unordered(
            _write_shard, tasks
        ):
            total += produced
            total_bytes += bytes_out
            print(
                f"shard {shard:4d}: {produced} rows "
                f"({total}/{n_target} total)",
                flush=True,
            )
    print(
        f"DONE {total} rows, {total_bytes / 1e9:.2f} GB text -> "
        f"{args.out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()
