# Free HBM leaked by job_220's OOM'd pipeline run: drop cached modules
# (module-level state holds device arrays via cycles), clear jit caches,
# and collect. Print memory stats before/after.
ns_cleanup(globals())
import gc
import sys
def _stats(tag):
    try:
        ms = dev.memory_stats()
        print(tag, {k: v for k, v in ms.items() if "bytes_in_use" in k},
              flush=True)
        return ms.get("bytes_in_use", -1)
    except Exception as e:
        print(tag, "no stats:", e, flush=True)
        return -1
before = _stats("before:")
for m in [k for k in list(sys.modules)
          if k.startswith("flowreg3d_tpu") or k in ("bench_pipeline",)]:
    del sys.modules[m]
try:
    import jax as _j
    _j.clear_caches()
except Exception:
    pass
for _ in range(4):
    gc.collect()
import jax.numpy as _jnp
try:
    x = _jnp.zeros((256, 1024, 1024), _jnp.float32)  # 1 GB probe
    x.block_until_ready()
    del x
    gc.collect()
    print("1GB probe alloc OK", flush=True)
except Exception as e:
    print("probe failed:", str(e)[:120], flush=True)
after = _stats("after:")
ns_record("job_231_gc", {"bytes_before": before, "bytes_after": after})
print("job_231 done", flush=True)
