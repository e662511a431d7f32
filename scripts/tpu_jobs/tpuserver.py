"""Persistent TPU session: executes /tmp/tpujobs/job_*.py in order in one
namespace; writes job_N.out when done. Holds the device claim for the session."""
import glob, io, os, sys, time, traceback, contextlib
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
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
        try:
            code = open(j).read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, j, "exec"), ns)
            status = "OK"
        except Exception:
            buf.write(traceback.format_exc())
            status = "ERR"
        open(out, "w").write(f"[{status} {time.perf_counter()-t0:.1f}s]\n" + buf.getvalue())
    time.sleep(0.5)
