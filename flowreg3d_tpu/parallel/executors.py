"""Batch executors: the per-frame work unit compiled once, scaled three ways.

Executor protocol parity: reference parallelization/base_3d.py:38
(``process_batch(batch, batch_proc, reference_raw, reference_proc, w_init,
...) -> (registered (T,Z,Y,X,C), flows (T,Z,Y,X,3))``) including the
6-step cross-correlation prealignment pipeline of sequential_3d.py:89-150.

TPU-native design (replaces thread/process pools, SURVEY.md §2.4):
- ``sequential``  — host loop over frames; one compiled flow+warp program.
- ``batched``     — frames chunked and ``vmap``-ed on one device; chunk size
                    auto-tuned to HBM (voxel budget) and padded so every
                    chunk reuses one compilation.
- ``mesh``        — the batched program with inputs sharded over a 1-D
                    device mesh (ICI data parallelism); reference volumes
                    replicated, frames split along T.

All three produce identical numerics (same compiled per-frame program) — the
executor-consistency invariant the reference tests
(tests/motion_correction/test_parallelization.py:152-198) holds by
construction.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
from flowreg3d_tpu.ops.warp import imregister_wrapper
from flowreg3d_tpu.parallel.mesh import (
    batch_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

_EXECUTORS = {}


def register_executor(name, cls):
    _EXECUTORS[name] = cls


def list_executors():
    return sorted(_EXECUTORS)


def get_executor(name=None, **kwargs):
    """Executor by name, or auto-select: mesh if >1 device else batched."""
    if name is None:
        name = "mesh" if len(jax.devices()) > 1 else "batched"
    name = {"sequential3d": "sequential", "threading3d": "batched",
            "multiprocessing3d": "mesh"}.get(name, name)
    if name not in _EXECUTORS:
        raise ValueError(f"Unknown executor '{name}'; have {list_executors()}")
    return _EXECUTORS[name](**kwargs)


def _warp_fn(interp, use_pallas=None):
    def warp(frame_raw, flow, ref_raw):
        return imregister_wrapper(
            frame_raw, flow[..., 0], flow[..., 1], flow[..., 2], ref_raw,
            interpolation_method=interp, use_pallas=use_pallas)
    return warp


# NOTE: flow estimation and the raw-frame warp are deliberately SEPARATE
# compiled programs: the wide-tap warp operand (64x volume, lane-padded 2x
# plus one relayout copy) would otherwise share one program's peak HBM with
# the pyramid's buffers and OOM at 512x512x64 scale.

@lru_cache(maxsize=16)
def _jit_flow_single(config_key):
    return jax.jit(build_pyramid_raw(*config_key))


@lru_cache(maxsize=16)
def _jit_warp_single(interp):
    return jax.jit(_warp_fn(interp))


@lru_cache(maxsize=16)
def _jit_flow_chunk(config_key):
    # lax.map over the UNBATCHED single-frame program: one dispatch per
    # chunk with the Pallas solver still on its fast path. (vmap would
    # force slow batched gathers and an XLA solver fallback — Pallas
    # kernels don't lower under a vmap batch dim.)
    pyramid = build_pyramid_raw(*config_key)

    def chunk(ref_proc, batch_proc, uvw, weight):
        return jax.lax.map(
            lambda a: pyramid(ref_proc, a[0], a[1], weight),
            (batch_proc, uvw))

    return jax.jit(chunk)


@lru_cache(maxsize=16)
def _jit_warp_chunk(interp):
    # lax.map keeps the Pallas windowed warp available per frame (it does
    # not lower under a vmap batch dim)
    warp = _warp_fn(interp)

    def chunk(batch_raw, flows, ref_raw):
        return jax.lax.map(lambda a: warp(a[0], a[1], ref_raw),
                           (batch_raw, flows))

    return jax.jit(chunk)


def _config_key(reference_proc, flow_params, dtype=jnp.float32):
    shape = reference_proc.shape[:3]
    n_channels = (reference_proc.shape[3]
                  if reference_proc.ndim == 4 else 1)
    fp = dict(flow_params)
    fp.pop("weight", None)
    fp.pop("cc_initialization", None)
    fp.pop("cc_hw", None)
    fp.pop("cc_up", None)
    if "const_assumption" not in fp and "constancy_assumption" in fp:
        fp["const_assumption"] = fp.pop("constancy_assumption")
    return pyramid_config_key(shape, n_channels, dtype=dtype, **fp)


def _normalize_inputs(batch, batch_proc, reference_raw, reference_proc):
    def c4(v):
        v = np.asarray(v)
        return v[..., np.newaxis] if v.ndim == 3 else v

    def c5(v):
        v = np.asarray(v)
        return v[..., np.newaxis] if v.ndim == 4 else v

    return c5(batch), c5(batch_proc), c4(reference_raw), c4(reference_proc)


class BaseExecutor3D:
    """Executor protocol + shared per-frame pipeline assembly."""

    name = "base"

    def __init__(self, n_workers=None, dtype=jnp.float32, **kwargs):
        self.n_workers = n_workers
        self.dtype = dtype

    # context manager / lifecycle (protocol parity)
    def setup(self):
        return self

    def cleanup(self):
        pass

    def __enter__(self):
        return self.setup()

    def __exit__(self, *exc):
        self.cleanup()

    @classmethod
    def register(cls):
        register_executor(cls.name, cls)

    def get_info(self):
        return {"name": self.name, "n_devices": len(jax.devices())}

    # -- core ---------------------------------------------------------------

    def _weight_volume(self, flow_params, ref_proc):
        Z, Y, X, C = ref_proc.shape
        w = flow_params.get("weight")
        if w is None:
            return np.full((Z, Y, X, C), 1.0 / C, np.float32)
        w = np.asarray(w, np.float32)
        if w.ndim == 1:
            w = w[:C] if w.size >= C else np.pad(
                w, (0, C - w.size), constant_values=1.0 / C)
            w = w / w.sum()
            return np.broadcast_to(w, (Z, Y, X, C)).copy()
        if w.ndim == 3:
            return np.broadcast_to(w[..., None], (Z, Y, X, C)).copy()
        return np.broadcast_to(w, (Z, Y, X, C)).copy()

    @staticmethod
    def _cc_params(flow_params):
        cc_hw = flow_params.get("cc_hw", 256)
        if isinstance(cc_hw, int):
            cc_hw = (cc_hw, cc_hw)
        cc_up = int(flow_params.get("cc_up", 10))
        weight = flow_params.get("weight")
        wvec = None
        if weight is not None and np.ndim(weight) == 1:
            wvec = np.asarray(weight, np.float32).reshape(-1)
        return tuple(cc_hw), cc_up, wvec

    def _prealign(self, frame_proc, reference_proc, w_init, flow_params,
                  interp_linear="linear"):
        """Steps 1-4 of the reference's cc pipeline: warp by w_init, rigid
        xcorr residual, combine, warp again — ONE compiled device program
        (reference sequential_3d.py:89-150 runs these as six host calls).
        Returns (aligned, w_combined) as numpy arrays."""
        cc_hw, cc_up, wvec = self._cc_params(flow_params)
        fn = _jit_prealign_single(cc_hw, cc_up, wvec is not None)
        aligned, w_combined = fn(
            jnp.asarray(frame_proc, self.dtype),
            jnp.asarray(reference_proc, self.dtype),
            jnp.asarray(w_init, jnp.float32),
            jnp.asarray(wvec) if wvec is not None
            else jnp.zeros((1,), jnp.float32))
        return np.asarray(aligned), np.asarray(w_combined)

    def _prealign_frames(self, batch_proc, reference_proc, w_init,
                         flow_params):
        """Prealign every frame of the batch; returns (aligned (T,Z,Y,X,C),
        w_combined (T,Z,Y,X,3)). Base: host loop over the single compiled
        program; downloads deferred so transfers overlap later dispatches."""
        cc_hw, cc_up, wvec = self._cc_params(flow_params)
        fn = _jit_prealign_single(cc_hw, cc_up, wvec is not None)
        ref_d = jnp.asarray(reference_proc, self.dtype)
        w_init_d = jnp.asarray(w_init, jnp.float32)
        wv_d = (jnp.asarray(wvec) if wvec is not None
                else jnp.zeros((1,), jnp.float32))
        outs = [fn(jnp.asarray(batch_proc[t], self.dtype), ref_d, w_init_d,
                   wv_d)
                for t in range(batch_proc.shape[0])]
        aligned = np.stack([np.asarray(a, np.float32) for a, _ in outs])
        combined = np.stack([np.asarray(c, np.float32) for _, c in outs])
        return aligned, combined

    def process_batch(self, batch, batch_proc, reference_raw, reference_proc,
                      w_init, get_displacement_func=None, imregister_func=None,
                      interpolation_method="cubic", progress_callback=None,
                      **kwargs):
        """Register a batch; returns (registered (T,Z,Y,X,C), flows
        (T,Z,Y,X,3)). A non-None ``get_displacement_func`` routes the batch
        through the deep-flow plug-in path (reference parallelization/
        base_3d.py:38 protocol; sequential_3d.py:148 per-frame call) —
        external backends (volRAFT-style CNNs, ...) replace the variational
        solver while the rest of the pipeline (prealignment, warping, dtype
        restoration) is unchanged. Otherwise the compiled pipeline runs."""
        flow_params = dict(kwargs.get("flow_params", {}))
        batch, batch_proc, reference_raw, reference_proc = _normalize_inputs(
            batch, batch_proc, reference_raw, reference_proc)
        T = batch.shape[0]
        use_cc = bool(flow_params.get("cc_initialization", False))

        if get_displacement_func is not None:
            return self._run_custom_backend(
                batch, batch_proc, reference_raw, reference_proc, w_init,
                get_displacement_func, imregister_func,
                interpolation_method, progress_callback, flow_params,
                use_cc)

        weight_vol = self._weight_volume(flow_params, reference_proc)
        key = _config_key(reference_proc, flow_params, self.dtype)

        w_init = np.asarray(w_init, np.float32)
        if use_cc:
            # on-device rigid prealignment (one compiled warp->xcorr->
            # combine->warp program per frame), then batched residual flow
            aligned, combined = self._prealign_frames(
                batch_proc, reference_proc, w_init, flow_params)
            uvw = np.zeros((T,) + w_init.shape, np.float32)
            registered, flows = self._run(
                batch, aligned, reference_raw, reference_proc, uvw,
                weight_vol, key, interpolation_method, progress_callback,
                extra_flow=combined)
        else:
            uvw = np.broadcast_to(w_init, (T,) + w_init.shape)
            registered, flows = self._run(
                batch, batch_proc, reference_raw, reference_proc, uvw,
                weight_vol, key, interpolation_method, progress_callback)
        if registered.dtype != batch.dtype:
            if np.issubdtype(batch.dtype, np.integer):
                info = np.iinfo(batch.dtype)
                registered = np.clip(np.rint(registered), info.min,
                                     info.max).astype(batch.dtype)
            else:
                registered = registered.astype(batch.dtype)
        return registered, flows

    def _run(self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
             key, interp, progress_callback, extra_flow=None):
        raise NotImplementedError

    # solver-facing kwargs only; pipeline-internal keys stay host-side
    _PIPELINE_KEYS = ("cc_initialization", "cc_hw", "cc_up", "weight",
                      "update_initialization_w")

    def _run_custom_backend(self, batch, batch_proc, ref_raw, ref_proc,
                            w_init, get_displacement_func, imregister_func,
                            interp, progress_callback, flow_params, use_cc):
        """Deep-flow plug-in path: per-frame host loop calling the external
        displacement backend, then the (default or custom) warper."""
        of_params = {k: v for k, v in flow_params.items()
                     if k not in self._PIPELINE_KEYS}
        if imregister_func is None:
            def imregister_func(frame, u, v, w, ref,
                                interpolation_method="cubic"):
                return np.asarray(_jit_single_warp(interpolation_method)(
                    jnp.asarray(frame, self.dtype),
                    jnp.asarray(np.stack([u, v, w], axis=-1)),
                    jnp.asarray(ref, self.dtype)))

        T = batch.shape[0]
        w_init = np.asarray(w_init, np.float32)
        regs, flows = [], []
        for t in range(T):
            frame_proc = batch_proc[t]
            base_flow = w_init
            if use_cc:
                frame_proc, base_flow = self._prealign(
                    batch_proc[t], ref_proc, w_init, flow_params)
                uvw_t = np.zeros_like(base_flow)
            else:
                uvw_t = w_init
            flow = np.asarray(get_displacement_func(
                ref_proc, frame_proc, uvw=uvw_t, **of_params), np.float32)
            if use_cc:
                flow = flow + base_flow
            reg = np.asarray(imregister_func(
                batch[t], flow[..., 0], flow[..., 1], flow[..., 2],
                ref_raw, interpolation_method=interp))
            if reg.ndim == 3:
                reg = reg[..., np.newaxis]
            regs.append(reg)
            flows.append(flow)
            if progress_callback:
                progress_callback(1)
        registered = np.stack(regs)
        flows_arr = np.stack(flows)
        if registered.dtype != batch.dtype:
            if np.issubdtype(batch.dtype, np.integer):
                info = np.iinfo(batch.dtype)
                registered = np.clip(np.rint(registered), info.min,
                                     info.max).astype(batch.dtype)
            else:
                registered = registered.astype(batch.dtype)
        return registered, flows_arr

    def _finalize_cc(self, batch, flows, extra_flow, ref_raw, interp):
        """CC path step 6: total flow = combined + residual; re-warp raw."""
        total = flows + extra_flow
        single = _jit_single_warp(interp)
        registered = np.stack([
            np.asarray(single(jnp.asarray(batch[t]), jnp.asarray(total[t]),
                              jnp.asarray(ref_raw)))
            for t in range(batch.shape[0])])
        return registered, total


@lru_cache(maxsize=8)
def _jit_single_warp(interp):
    def warp(frame_raw, flow, ref_raw):
        return imregister_wrapper(frame_raw, flow[..., 0], flow[..., 1],
                                  flow[..., 2], ref_raw,
                                  interpolation_method=interp)
    return jax.jit(warp)


def _prealign_traced(cc_hw, cc_up, has_wvec, use_pallas=None):
    """Steps 1-4 of the reference cc pipeline as one traced function:
    warp-by-w_init (linear), rigid xcorr residual on projections, combine,
    warp again. Parity: reference sequential_3d.py:91-145."""
    from flowreg3d_tpu.util.xcorr_prealignment import (
        estimate_rigid_xcorr_traced)

    def prealign(frame_proc, ref_proc, w_init, weight_vec):
        mov_partial = imregister_wrapper(
            frame_proc, w_init[..., 0], w_init[..., 1], w_init[..., 2],
            ref_proc, interpolation_method="linear", use_pallas=use_pallas)
        w_cross = estimate_rigid_xcorr_traced(
            ref_proc, mov_partial, target_hw=cc_hw, up=cc_up,
            weight_vec=weight_vec if has_wvec else None)
        w_combined = w_init + w_cross[None, None, None, :]
        aligned = imregister_wrapper(
            frame_proc, w_combined[..., 0], w_combined[..., 1],
            w_combined[..., 2], ref_proc, interpolation_method="linear",
            use_pallas=use_pallas)
        if aligned.ndim == 3:
            aligned = aligned[..., None]
        return aligned, w_combined

    return prealign


@lru_cache(maxsize=8)
def _jit_prealign_single(cc_hw, cc_up, has_wvec):
    return jax.jit(_prealign_traced(cc_hw, cc_up, has_wvec))


@lru_cache(maxsize=8)
def _jit_prealign_chunk(cc_hw, cc_up, has_wvec):
    # lax.map keeps per-frame Pallas paths (vmap would force them off)
    prealign = _prealign_traced(cc_hw, cc_up, has_wvec)

    def chunk(batch_proc, ref_proc, w_init, weight_vec):
        return jax.lax.map(
            lambda f: prealign(f, ref_proc, w_init, weight_vec),
            batch_proc)

    return jax.jit(chunk)


class SequentialExecutor3D(BaseExecutor3D):
    """Frame-by-frame host loop over one compiled flow+warp program."""

    name = "sequential"

    def _run(self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
             key, interp, progress_callback, extra_flow=None):
        flow_fn = _jit_flow_single(key)
        warp_fn = _jit_warp_single(interp)
        T = batch.shape[0]
        regs, flows = [], []
        ref_raw_d = jnp.asarray(ref_raw, self.dtype)
        ref_proc_d = jnp.asarray(ref_proc, self.dtype)
        weight_d = jnp.asarray(weight_vol, self.dtype)
        for t in range(T):
            flow = flow_fn(ref_proc_d,
                           jnp.asarray(batch_proc[t], self.dtype),
                           jnp.asarray(uvw[t]), weight_d)
            reg = warp_fn(jnp.asarray(batch[t], self.dtype), flow, ref_raw_d)
            # keep device references; downloads happen after the loop so
            # host transfers overlap with later frames' async dispatches
            regs.append(reg)
            flows.append(flow)
            if progress_callback:
                progress_callback(1)
        registered = np.stack([np.asarray(r) for r in regs])
        flows = np.stack([np.asarray(f, np.float32) for f in flows])
        if extra_flow is not None:
            return self._finalize_cc(batch, flows, extra_flow, ref_raw, interp)
        return registered, flows


class BatchedExecutor3D(BaseExecutor3D):
    """lax.map over frame chunks on one device; chunk size HBM-auto-tuned.

    One dispatch covers a whole chunk while each frame still runs the
    UNBATCHED single-frame program — the Pallas solver and windowed warp
    stay on their fast paths (unlike vmap, which forces slow batched
    gathers and an XLA solver fallback). Pays off when per-frame device
    time is comparable to per-dispatch host latency (small/medium
    volumes); large volumes auto-degrade to the sequential streaming loop
    via the voxel budget."""

    name = "batched"

    def __init__(self, n_workers=None, chunk=None, voxel_budget=2.0e7,
                 **kwargs):
        super().__init__(n_workers=n_workers, **kwargs)
        self.chunk = chunk
        self.voxel_budget = voxel_budget

    def _chunk_size(self, shape, T):
        if self.chunk:
            return max(1, min(int(self.chunk), T))
        voxels = int(np.prod(shape[:3])) * max(1, shape[3])
        return max(1, min(T, int(self.voxel_budget // max(voxels, 1))))

    def _device_args(self, ref_raw, ref_proc, weight_vol):
        return (jnp.asarray(ref_raw, self.dtype),
                jnp.asarray(ref_proc, self.dtype),
                jnp.asarray(weight_vol, self.dtype))

    def _prealign_frames(self, batch_proc, reference_proc, w_init,
                         flow_params):
        T = batch_proc.shape[0]
        k = self._chunk_size(reference_proc.shape, T)
        if k == 1:
            return super()._prealign_frames(batch_proc, reference_proc,
                                            w_init, flow_params)
        cc_hw, cc_up, wvec = self._cc_params(flow_params)
        fn = _jit_prealign_chunk(cc_hw, cc_up, wvec is not None)
        ref_d = jnp.asarray(reference_proc, self.dtype)
        w_init_d = jnp.asarray(w_init, jnp.float32)
        wv_d = (jnp.asarray(wvec) if wvec is not None
                else jnp.zeros((1,), jnp.float32))
        np_dtype = np.dtype(jnp.dtype(self.dtype).name)
        aligned, combined = [], []
        for t0 in range(0, T, k):
            sl = slice(t0, min(t0 + k, T))
            chunk_p, n_valid = pad_to_multiple(
                np.asarray(batch_proc[sl], np_dtype), k)
            a, c = fn(jnp.asarray(chunk_p), ref_d, w_init_d, wv_d)
            aligned.append(np.asarray(a, np.float32)[:n_valid])
            combined.append(np.asarray(c, np.float32)[:n_valid])
        return np.concatenate(aligned), np.concatenate(combined)

    def _place_chunk(self, *chunk_arrays):
        return [jnp.asarray(a) for a in chunk_arrays]

    def _run(self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
             key, interp, progress_callback, extra_flow=None):
        T = batch.shape[0]
        k = self._chunk_size(ref_proc.shape, T)
        if k == 1 and type(self) is BatchedExecutor3D:
            return SequentialExecutor3D._run(
                self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
                key, interp, progress_callback, extra_flow)
        flow_fn = _jit_flow_chunk(key)
        warp_fn = _jit_warp_chunk(interp)
        ref_raw_d, ref_proc_d, weight_d = self._device_args(
            ref_raw, ref_proc, weight_vol)
        regs, flows = [], []
        for t0 in range(0, T, k):
            sl = slice(t0, min(t0 + k, T))
            chunk_b, n_valid = pad_to_multiple(batch[sl], k)
            chunk_p, _ = pad_to_multiple(batch_proc[sl], k)
            chunk_u, _ = pad_to_multiple(np.asarray(uvw[sl]), k)
            np_dtype = np.dtype(jnp.dtype(self.dtype).name)
            cb, cp, cu = self._place_chunk(
                chunk_b.astype(np_dtype, copy=False),
                chunk_p.astype(np_dtype, copy=False), chunk_u)
            flow = flow_fn(ref_proc_d, cp, cu, weight_d)
            reg = warp_fn(cb, flow, ref_raw_d)
            regs.append(np.asarray(reg)[:n_valid])
            flows.append(np.asarray(flow, np.float32)[:n_valid])
            if progress_callback:
                progress_callback(n_valid)
        registered = np.concatenate(regs)
        flows = np.concatenate(flows)
        if extra_flow is not None:
            return self._finalize_cc(batch, flows, extra_flow, ref_raw, interp)
        return registered, flows


@lru_cache(maxsize=16)
def _jit_shardmap_step(config_key, interp, mesh_devices):
    """shard_map of the SINGLE-frame flow+warp over a 1-D batch mesh: each
    device processes whole frames (batch dim squeezed locally), so the
    Pallas solver and the wide-gather warp run in their unbatched fast
    forms — unlike vmap, which forces slow batched gathers and an XLA
    solver fallback."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(list(mesh_devices)), ("batch",))
    pyramid = build_pyramid_raw(*config_key)
    warp = _warp_fn(interp)

    def local(batch_raw, batch_proc, uvw, ref_raw, ref_proc, weight):
        def one(raw, proc, u0):
            flow = pyramid(ref_proc, proc, u0, weight)
            return warp(raw, flow, ref_raw), flow

        # local block is (per_device, ...); loop frames without vmap
        regs, flows = [], []
        for t in range(batch_raw.shape[0]):
            r, f = one(batch_raw[t], batch_proc[t], uvw[t])
            regs.append(r)
            flows.append(f)
        return jnp.stack(regs), jnp.stack(flows)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("batch"), P("batch"), P("batch"), P(), P(), P()),
        out_specs=(P("batch"), P("batch")),
    )
    return jax.jit(fn), mesh


class MeshExecutor3D(BatchedExecutor3D):
    """Single-frame program shard_map-ed over a 1-D device mesh (ICI)."""

    name = "mesh"

    def __init__(self, n_workers=None, devices=None, per_device=None,
                 **kwargs):
        super().__init__(n_workers=n_workers, **kwargs)
        self.mesh = batch_mesh(devices)
        self.n_devices = self.mesh.devices.size
        self.per_device = per_device

    def _run(self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
             key, interp, progress_callback, extra_flow=None):
        T = batch.shape[0]
        k = self._chunk_size(ref_proc.shape, T)
        step, mesh = _jit_shardmap_step(
            key, interp, tuple(self.mesh.devices.ravel().tolist()))
        ref_raw_d, ref_proc_d, weight_d = self._device_args(
            ref_raw, ref_proc, weight_vol)
        np_dtype = np.dtype(jnp.dtype(self.dtype).name)
        regs, flows = [], []
        for t0 in range(0, T, k):
            sl = slice(t0, min(t0 + k, T))
            chunk_b, n_valid = pad_to_multiple(batch[sl], k)
            chunk_p, _ = pad_to_multiple(batch_proc[sl], k)
            chunk_u, _ = pad_to_multiple(np.asarray(uvw[sl]), k)
            cb, cp, cu = self._place_chunk(
                chunk_b.astype(np_dtype, copy=False),
                chunk_p.astype(np_dtype, copy=False), chunk_u)
            reg, flow = step(cb, cp, cu, ref_raw_d, ref_proc_d, weight_d)
            regs.append(np.asarray(reg)[:n_valid])
            flows.append(np.asarray(flow, np.float32)[:n_valid])
            if progress_callback:
                progress_callback(n_valid)
        registered = np.concatenate(regs)
        flows = np.concatenate(flows)
        if extra_flow is not None:
            return self._finalize_cc(batch, flows, extra_flow, ref_raw,
                                     interp)
        return registered, flows

    def _chunk_size(self, shape, T):
        if self.chunk:
            k = int(self.chunk)
        else:
            voxels = int(np.prod(shape[:3])) * max(1, shape[3])
            per_dev = (self.per_device
                       or max(1, int(self.voxel_budget // max(voxels, 1))))
            k = per_dev * self.n_devices
        # chunk is a multiple of the mesh size, no larger than T rounded up
        t_rounded = -(-T // self.n_devices) * self.n_devices
        k = max(self.n_devices, (k // self.n_devices) * self.n_devices)
        return min(k, t_rounded)

    def _device_args(self, ref_raw, ref_proc, weight_vol):
        return (replicate(jnp.asarray(ref_raw, self.dtype), self.mesh),
                replicate(jnp.asarray(ref_proc, self.dtype), self.mesh),
                replicate(jnp.asarray(weight_vol, self.dtype), self.mesh))

    def _place_chunk(self, *chunk_arrays):
        return [shard_batch(jnp.asarray(a), self.mesh) for a in chunk_arrays]

    def get_info(self):
        info = super().get_info()
        info.update({"mesh": tuple(self.mesh.shape.values())})
        return info


class SpatialExecutor3D(BaseExecutor3D):
    """Frames processed one at a time, each Z-SHARDED across the mesh.

    For volumes whose single-frame working set exceeds one chip's HBM:
    the whole pyramid runs under ``get_displacement_sharded``
    (parallel/spatial_pyramid.py — ring-matmul resizes, halo-exchange
    solver, halo-bounded warp). Falls back per frame to the exact
    single-device path when the flow exceeds the warp's z halo (the
    kernel's validity flag). Supports both a_smooth regimes and
    spatially-varying weight volumes.
    """

    name = "spatial"

    def __init__(self, n_workers=None, devices=None, halo_w=None, **kwargs):
        super().__init__(n_workers=n_workers, **kwargs)
        from flowreg3d_tpu.parallel.spatial import spatial_mesh

        self.mesh = spatial_mesh(devices)
        self.halo_w = halo_w

    _SOLVER_KEYS = ("alpha", "update_lag", "iterations", "min_level",
                    "levels", "eta", "a_data", "const_assumption")

    def _run(self, batch, batch_proc, ref_raw, ref_proc, uvw, weight_vol,
             key, interp, progress_callback, extra_flow=None):
        from flowreg3d_tpu.parallel.spatial_pyramid import (
            get_displacement_sharded)

        # static solver config back from the pyramid key
        (shape, n_channels, alpha, update_lag, iterations, min_level,
         levels, eta, a_smooth, a_data, const_assumption, dtype_name,
         _pl) = key
        kw = dict(alpha=alpha, update_lag=update_lag,
                  iterations=iterations, min_level=min_level,
                  levels=levels, eta=eta, a_data=np.asarray(a_data),
                  const_assumption=const_assumption,
                  a_smooth=float(a_smooth))
        if self.halo_w:
            kw["halo_w"] = self.halo_w
        if weight_vol.ndim == 4:
            flat = weight_vol.reshape(-1, weight_vol.shape[-1])
            if np.allclose(flat, flat[0]):
                wvec = flat[0]           # per-channel: replicate, not shard
            else:
                wvec = np.asarray(weight_vol)   # spatially varying volume
        else:
            wvec = None

        warp_fn = _jit_warp_single(interp)
        T = batch.shape[0]
        regs, flows = [], []
        ref_raw_d = jnp.asarray(ref_raw, self.dtype)
        ref_proc_d = jnp.asarray(ref_proc, self.dtype)
        for t in range(T):
            flow, valid = get_displacement_sharded(
                ref_proc_d, jnp.asarray(batch_proc[t], self.dtype),
                mesh=self.mesh, uvw=jnp.asarray(uvw[t]), weight=wvec, **kw)
            flow = jnp.asarray(flow)
            if not bool(valid):
                flow_fn = _jit_flow_single(key)
                flow = flow_fn(ref_proc_d,
                               jnp.asarray(batch_proc[t], self.dtype),
                               jnp.asarray(uvw[t]),
                               jnp.asarray(weight_vol, self.dtype))
            reg = warp_fn(jnp.asarray(batch[t], self.dtype), flow,
                          ref_raw_d)
            regs.append(np.asarray(reg))
            flows.append(np.asarray(flow, np.float32))
            if progress_callback:
                progress_callback(1)
        registered = np.stack(regs)
        flows = np.stack(flows)
        if extra_flow is not None:
            return self._finalize_cc(batch, flows, extra_flow, ref_raw,
                                     interp)
        return registered, flows

    def get_info(self):
        info = super().get_info()
        info.update({"mesh": tuple(self.mesh.shape.values()),
                     "sharding": "z-spatial"})
        return info


SequentialExecutor3D.register()
BatchedExecutor3D.register()
MeshExecutor3D.register()
SpatialExecutor3D.register()
