"""Mesh-vs-sequential FULL-pipeline consistency on the 8-device CPU mesh.

The reference's first-class invariant: every executor produces the same
registered output and flows (reference tests/motion_correction/
test_parallelization.py:152-198, rtol=1e-5/atol=1e-6). Here the mesh
executor shard_maps frames over all 8 virtual devices — including uneven
T splits — and must match the sequential executor through the complete
``BatchMotionCorrector`` pipeline (reference setup, preprocessing, w_init
propagation across batches, statistics).
"""

import jax
import numpy as np
import pytest

from flowreg3d_tpu.pipeline import OFOptions, compensate_arr_3D
from flowreg3d_tpu.pipeline.corrector import (BatchMotionCorrector,
                                              RegistrationConfig,
                                              compensate_recording)



# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow

def _video(T=11, Z=6, Y=16, X=16, C=1, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.random((Z, Y, X)).astype(np.float32), 1.0)
    frames = []
    for t in range(T):
        shifted = np.roll(base, (t % 2, (t * 2) % 3), axis=(1, 2))
        frames.append(shifted + 0.01 * rng.random((Z, Y, X)))
    vid = np.stack(frames).astype(np.float32)[..., None]
    return np.broadcast_to(vid, vid.shape[:-1] + (C,)).copy()


def _opts(**kw):
    base = dict(quality_setting="fast", levels=2, iterations=4,
                update_lag=2, alpha=(1.5, 1.5, 1.5), sigma=[[0.3] * 4],
                reference_frames=[0], buffer_size=6)
    base.update(kw)
    return OFOptions(**base)


@pytest.mark.executor
def test_mesh_matches_sequential_full_pipeline():
    assert len(jax.devices()) == 8
    video = _video(T=11)  # uneven: 11 frames over 8 devices, 2 batches

    ref = video[0, ..., 0][..., None]
    reg_seq, w_seq = compensate_arr_3D(
        video, ref, options=_opts(),
        config=RegistrationConfig(parallelization="sequential"))
    reg_mesh, w_mesh = compensate_arr_3D(
        video, ref, options=_opts(),
        config=RegistrationConfig(parallelization="mesh"))

    np.testing.assert_allclose(reg_mesh, reg_seq, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w_mesh, w_seq, rtol=1e-5, atol=1e-5)


@pytest.mark.executor
def test_mesh_w_init_propagation_across_batches(tmp_path):
    """w_init chains across batches identically under the mesh executor
    (reference compensate_recording_3D.py:481-485 semantics), exercised
    through compensate_recording with multiple uneven batches."""
    from flowreg3d_tpu.io.factory import (get_video_file_reader,
                                          get_video_file_writer)

    video = _video(T=10)
    src = tmp_path / "in.h5"
    w = get_video_file_writer(str(src), "HDF5")
    w.write_frames(video)
    w.close()

    outs = {}
    for name in ("sequential", "mesh"):
        opts = _opts(input_file=str(src), output_path=tmp_path / name,
                     output_format="HDF5", buffer_size=4, save_w=True)
        compensate_recording(opts, config=RegistrationConfig(
            parallelization=name))
        r = get_video_file_reader(str(tmp_path / name / "compensated.HDF5"))
        reg = r[:]
        r.close()
        rw = get_video_file_reader(str(tmp_path / name / "w.h5"))
        flows = rw[:]
        rw.close()
        stats = np.load(tmp_path / name / "statistics.npz")
        outs[name] = (reg, flows, {k: stats[k] for k in stats.files})

    reg_s, w_s, st_s = outs["sequential"]
    reg_m, w_m, st_m = outs["mesh"]
    np.testing.assert_allclose(reg_m, reg_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w_m, w_s, rtol=1e-5, atol=1e-5)
    for k in st_s:
        np.testing.assert_allclose(st_m[k], st_s[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
