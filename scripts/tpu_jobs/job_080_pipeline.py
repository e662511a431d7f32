# E2e production pipeline on the real chip (BASELINE configs 3 then 2).
# Transfer caveat: host<->device ~16 MB/s through the tunnel, so e2e here
# is transfer-bound; the decomposition quantifies it.
import sys
sys.path.insert(0, "/root/repo/scripts")
import bench_pipeline as bp
import os
import tempfile

for cfg, frames in (("2p", 8), ("organoid", 6)):
    tmp = tempfile.mkdtemp(prefix=f"pipe_{cfg}_")
    try:
        e2e = bp.run_pipeline(tmp, (64, 512, 512), frames, cfg, 4)
        io_rate = bp.run_io_only(tmp, (64, 512, 512), frames, 4)
        dev_rate = bp.run_device_only((64, 512, 512), 4, cfg)
        print(f"PIPELINE {cfg}: e2e {e2e:.4f} vol/s | device-only "
              f"{dev_rate:.4f} | host-io-only {io_rate:.2f} | "
              f"no-overlap bound "
              f"{1.0/(1.0/dev_rate + 1.0/io_rate):.4f}", flush=True)
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
print("job_080 done", flush=True)
