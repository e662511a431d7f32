"""Prune .jax_cache to the driver-path entries (round-3 verdict item 6).

Policy (documented in BASELINE.md): the committed cache exists solely so the
driver's `bench.py` / `entry()` runs skip minutes of remote TPU compiles.
Entries are kept only if they were READ by the driver-path warmup runs —
tracked via atime. Usage:

    1. python scripts/prune_jax_cache.py age       # atime -> 2026-08-15
    2. run the driver paths against the real chip (bench.py, job_090 entry
       warmup); each cache hit bumps the entry's atime (atimes were aged
       below mtime, so relatime performs the update)
    3. python scripts/prune_jax_cache.py prune     # delete un-read entries
       (pass --dry-run to list only)

Also verifies staleness: every kept entry must have been produced by the
CURRENT jaxlib (cache keys embed the jaxlib version, so a version bump
means zero hits — in that case this script reports it loudly and `prune`
refuses to keep a dead cache).
"""

import argparse
import os
import sys
import time
from pathlib import Path

CACHE = Path(__file__).resolve().parent.parent / ".jax_cache"
AGE_TO = "2026-08-15 00:00:00"
AGE_EPOCH = time.mktime(time.strptime(AGE_TO, "%Y-%m-%d %H:%M:%S"))


def entries():
    return sorted(p for p in CACHE.iterdir() if p.is_file())


def cmd_age(_args):
    n = 0
    for p in entries():
        st = p.stat()
        os.utime(p, (AGE_EPOCH, st.st_mtime))
        n += 1
    print(f"aged atime of {n} entries to {AGE_TO}")


def cmd_prune(args):
    keep, drop = [], []
    for p in entries():
        (keep if p.stat().st_atime > AGE_EPOCH + 1 else drop).append(p)
    total = len(keep) + len(drop)
    kb = sum(p.stat().st_size for p in keep) / 2**20
    db = sum(p.stat().st_size for p in drop) / 2**20
    print(f"{total} entries: keep {len(keep)} ({kb:.0f} MB), "
          f"drop {len(drop)} ({db:.0f} MB)")
    if not keep:
        print("REFUSING: zero entries were read — either the driver paths "
              "never ran after 'age', or a jaxlib bump invalidated every "
              "key. Run the warmup first.", file=sys.stderr)
        sys.exit(2)
    if args.dry_run:
        for p in drop[:20]:
            print("  would drop", p.name)
        return
    for p in drop:
        p.unlink()
    print(f"pruned; cache now {kb:.0f} MB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["age", "prune"])
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    {"age": cmd_age, "prune": cmd_prune}[args.cmd](args)


if __name__ == "__main__":
    main()
