# int8 vs bf16 Pallas dot rate (VERDICT #2 microbenchmark). Runs the repo
# script's timing core inline under the held claim.
import sys
sys.path.insert(0, "/root/repo/scripts")
import micro_int8

for R, W, S in [(768, 384, 128), (384, 384, 128), (512, 512, 512)]:
    res = {}
    for in_dt, acc_dt, label in ((jnp.bfloat16, jnp.float32, "bf16"),
                                 (jnp.int8, jnp.int32, "int8"),
                                 (jnp.float32, jnp.float32, "f32")):
        try:
            dt, tops = micro_int8.time_dots(R, W, S, in_dt, acc_dt,
                                            n_inner=64, n_grid=64)
            res[label] = tops
            print(f"({R},{W},{S}) {label}: {dt*1e3:.2f} ms {tops:.2f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"({R},{W},{S}) {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if res.get("int8") and res.get("bf16"):
        print(f"({R},{W},{S}) int8/bf16 = {res['int8']/res['bf16']:.2f}x",
              flush=True)
print("job_030 done", flush=True)
