# E2e production pipeline with the round-5 DEVICE-RESIDENT engine
# (pipeline/device_pipeline.py): raw u16 up once, registered u16 down once,
# everything else stays on device. Round-4 legacy numbers (job_109):
# 2p 0.0123 vol/s, organoid 0.0111 — vs device-only rates 3.57 / 6.36.
# Also measures the raw host<->device link rate to state the transfer bound.
ns_cleanup(globals())
ns_fresh()
import sys
if "/root/repo/scripts" not in sys.path:
    sys.path.insert(0, "/root/repo/scripts")
import tempfile

import numpy as np

# raw link rate (64 MB up, 64 MB down) -> the e2e bound at ~67 MB/frame
buf = np.zeros((64, 512, 512), np.uint16)  # 33.5 MB
jax.block_until_ready(jax.device_put(buf, dev))  # warm path
t0 = time.perf_counter()
for _ in range(2):
    d = jax.block_until_ready(jax.device_put(buf, dev))
up_s = (time.perf_counter() - t0) / 2
t0 = time.perf_counter()
for _ in range(2):
    _ = np.asarray(d)
down_s = (time.perf_counter() - t0) / 2
mb = buf.nbytes / 1e6
link = {"up_MBps": round(mb / up_s, 1), "down_MBps": round(mb / down_s, 1)}
bound = 1.0 / (up_s + down_s)
print(f"link: up {link['up_MBps']} MB/s, down {link['down_MBps']} MB/s; "
      f"u16-frame-roundtrip bound {bound:.3f} vol/s", flush=True)

import bench_pipeline as bp

rec = {"link": link, "roundtrip_bound_vol_s": round(bound, 4)}
for cfg, frames in (("2p", 8), ("organoid", 6)):
    tmp = tempfile.mkdtemp(prefix=f"pipe5_{cfg}_")
    try:
        e2e = bp.run_pipeline(tmp, (64, 512, 512), frames, cfg, 4)
        io_rate = bp.run_io_only(tmp, (64, 512, 512), frames, 4)
        rec[cfg] = {"e2e_vol_s": round(e2e, 4),
                    "host_io_vol_s": round(io_rate, 2)}
        print(f"PIPELINE {cfg} (resident): e2e {e2e:.4f} vol/s | "
              f"host-io-only {io_rate:.2f} | link bound {bound:.3f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        rec[cfg] = {"error": str(e)[:300]}
    finally:
        import gc
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        for _ in range(3):
            gc.collect()
ns_record("job_260_pipeline_resident", rec)
print("job_220 done", flush=True)
