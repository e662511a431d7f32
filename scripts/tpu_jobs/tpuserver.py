"""Persistent TPU session: executes /tmp/tpujobs/job_*.py in order in one
namespace; writes job_N.out when done. Holds the device claim for the session.

Round-5 addition: every job's outcome is appended to the repo-tracked
``BENCH_JOBS.jsonl`` (job name, status, duration, and whatever dict the job
left in ``RECORD``), so measured results land in the repository instead of
living only in /tmp — the round-4 failure mode where three capability-level
discoveries sat unrecorded in job outputs.

Jobs that need freshly edited package code should drop cached modules first:
    for m in [k for k in list(sys.modules) if k.startswith("flowreg3d_tpu")]:
        del sys.modules[m]
"""
import glob, io, json, os, sys, time, traceback, contextlib
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

JOBS_LOG = "/root/repo/BENCH_JOBS.jsonl"

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time, "sys": sys, "os": os}
dev = jax.devices()[0]
ns["dev"] = dev
t0 = time.perf_counter()
float(jnp.sum(jax.device_put(np.ones((8, 128), np.float32), dev) + 1.0))
print(f"claim acquired in {time.perf_counter()-t0:.1f}s", flush=True)
open("/tmp/tpujobs/READY", "w").write("ok")

done = set()
while True:
    if os.path.exists("/tmp/tpujobs/STOP"):
        break
    jobs = sorted(glob.glob("/tmp/tpujobs/job_*.py"))
    for j in jobs:
        if j in done or os.path.exists(j[:-3] + ".out"):
            done.add(j)
            continue
        done.add(j)
        out = j[:-3] + ".out"
        buf = io.StringIO()
        t0 = time.perf_counter()
        ns.pop("RECORD", None)
        try:
            code = open(j).read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, j, "exec"), ns)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERR"
        dt = time.perf_counter() - t0
        open(out, "w").write(f"[{status} {dt:.1f}s]\n" + buf.getvalue())
        try:
            # jobs usually self-record via ns_record (job_205 helpers);
            # the server only logs jobs that set ns["RECORD"] or ERRORED,
            # so each job yields at most one BENCH_JOBS row from here
            data = ns.get("RECORD")
            if isinstance(data, dict) or status == "ERR":
                rec = {"job": os.path.basename(j), "status": status,
                       "secs": round(dt, 1),
                       "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
                if isinstance(data, dict):
                    rec["data"] = data
                else:
                    rec["error_tail"] = buf.getvalue()[-400:]
                with open(JOBS_LOG, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        except Exception:
            traceback.print_exc(file=sys.stderr)
    time.sleep(0.5)
