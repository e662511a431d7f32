# Round-5 session helpers (ns_-prefixed so ns_cleanup keeps them).
# The running server predates the BENCH_JOBS.jsonl hook, so round-5 jobs
# record their own results via ns_record.

def ns_cleanup(g):
    """Free every device/host array left in the server namespace by
    earlier jobs (their module-level variables persist in ns)."""
    import gc
    keep = {"jax", "jnp", "np", "time", "sys", "os", "dev", "ns_cleanup"}
    for k in list(g):
        if k.startswith(("ns_", "__")) or k in keep:
            continue
        del g[k]
    gc.collect()
    gc.collect()


def ns_fresh():
    """Purge cached package modules so jobs import the CURRENT code."""
    import gc
    import sys
    for m in [k for k in list(sys.modules)
              if k.startswith("flowreg3d_tpu")
              or k in ("bench_pipeline", "bench_accuracy", "micro_int8")]:
        del sys.modules[m]
    gc.collect()


def ns_record(job, data, status="OK"):
    import json
    import time as _t
    rec = {"job": job, "status": status,
           "ts": _t.strftime("%Y-%m-%dT%H:%M:%S"), "data": data}
    with open("/root/repo/BENCH_JOBS.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[recorded] {json.dumps(data)[:200]}", flush=True)


print("round-5 helpers loaded", flush=True)
