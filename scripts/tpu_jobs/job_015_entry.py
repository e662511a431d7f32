# Warm the driver entry() program on the TPU (cache entry for the
# single-chip compile check) and touch exactly the driver-path cache.
import sys
sys.path.insert(0, "/root/repo")
import __graft_entry__

fn, args = __graft_entry__.entry()
args_dev = [jax.device_put(np.asarray(a), dev) for a in args]
t0 = time.perf_counter()
out = jax.block_until_ready(jax.jit(fn)(*args_dev))
print(f"entry compile+run {time.perf_counter()-t0:.1f}s "
      f"shapes {[o.shape for o in out]}", flush=True)
print("job_090 done", flush=True)
