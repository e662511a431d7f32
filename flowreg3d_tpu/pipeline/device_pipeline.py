"""Device-resident batch pipeline: raw frames up once, registered down once.

The corrector's legacy path round-trips host numpy between every stage
(preprocess -> flow -> warp -> statistics), moving ~600 MB of host<->device
traffic per canonical 64x512x512 frame. This module keeps the whole batch on
device, treating the host<->device link as the scarce resource:

  upload raw batch once (native dtype; u16 = 33 MB/frame at canonical shape)
    -> preprocess program  (normalize vs reference range + Gaussian, f32,
                            including the temporal sigma across the batch)
    -> flow chunk program  (full pyramid per frame via lax.map, shared w_init)
    -> finalize program    (cubic warp of the raw frame, native-dtype cast,
                            per-frame stats, in-bounds valid reduction)
  download registered batch (native dtype) + a (T,4) stats array.

Flows, the w_init tail-mean propagation, reference updates, and valid masks
all stay on device; full flow fields only cross the link when ``save_w`` (or
a valid-mask writer) asks for them.

Parity: the reference's loop (compensate_recording_3D.py:431-557) runs these
stages in one address space; this is its TPU analogue. Statistics parity:
compensate_recording_3D.py:487-508; w_init tail-mean: :481-485; initial-w
mean of the first <=22 frames: :342-393; reference update of <=100 frames:
:395-429.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw
from flowreg3d_tpu.ops.filters import apply_gaussian_filter
from flowreg3d_tpu.ops.gradients import divergence
from flowreg3d_tpu.ops.warp import imregister_wrapper

__all__ = ["ResidentPipeline", "resident_supported"]


def resident_supported(options, config, executor) -> bool:
    """True when the batch can run fully device-resident.

    Host-protocol hooks (a user ``preproc_funct``, an external deep-flow
    backend) and the cc-prealignment pipeline keep the legacy host-staged
    path; the spatial (Z-sharded) executor drives frames itself.
    """
    if getattr(config, "device_resident", None) is False:
        return False
    if options.preproc_funct is not None:
        return False
    if config.get_displacement_func is not None:
        return False
    if config.flow_backend not in (None, "", "variational"):
        return False
    if getattr(options, "cc_initialization", False):
        return False
    return executor.name in ("sequential", "batched", "mesh")


# -- compiled program builders (cached per static config) ---------------------


@lru_cache(maxsize=16)
def _jit_preprocess_batch(sigma_key, norm_mode):
    """(T,Z,Y,X,C) any-dtype batch -> f32 preprocessed batch.

    ``lo``/``hi`` carry the reference volume's per-channel (or global) range;
    the normalize semantics mirror ops.filters.normalize with ``ref`` set
    (reference util/image_processing_3D.py:12-92), the Gaussian is the
    MATLAB-order chain of :95-162 including the temporal component across T.
    """
    sigma = np.asarray(sigma_key, np.float64)

    def run(raw, lo, hi):
        x = raw.astype(jnp.float32)
        if norm_mode == "separate":
            rng = hi - lo
            safe = jnp.where(rng > 0, rng, 1.0)
            normed = (x - lo) / safe
        else:
            normed = (x - lo) / (hi - lo + 1e-8)
        return apply_gaussian_filter(normed, sigma)

    return jax.jit(run)


@lru_cache(maxsize=16)
def _jit_flow_chunk_shared(config_key):
    """lax.map of the unbatched pyramid over a frame chunk, one shared
    w_init (the Pallas solver/warp stay on their single-frame fast paths —
    they do not lower under a vmap batch dim)."""
    pyramid = build_pyramid_raw(*config_key)

    def chunk(ref_proc, batch_proc, w_init, weight):
        return jax.lax.map(lambda f: pyramid(ref_proc, f, w_init, weight),
                           batch_proc)

    return jax.jit(chunk)


def _finalize_one(interp, out_dtype_name, device_cast, want_mask,
                  want_comp=False):
    out_dtype = jnp.dtype(out_dtype_name) if device_cast else jnp.float32
    integer = device_cast and jnp.issubdtype(out_dtype, jnp.integer)
    info = np.iinfo(out_dtype_name) if integer else None

    def one(raw, flow, ref_raw, proc=None, ref_proc=None):
        reg = imregister_wrapper(
            raw.astype(jnp.float32), flow[..., 0], flow[..., 1],
            flow[..., 2], ref_raw, interpolation_method=interp)
        if integer:
            reg_c = jnp.clip(jnp.rint(reg), info.min, info.max).astype(
                out_dtype)
        else:
            reg_c = reg.astype(out_dtype)
        mag = jnp.linalg.norm(flow, axis=-1)
        stats = jnp.stack([
            mag.mean(), mag.max(), divergence(flow).mean(),
            jnp.linalg.norm(flow.mean(axis=(0, 1, 2)))])
        Z, Y, X = flow.shape[:3]
        gz = jnp.arange(Z, dtype=flow.dtype)[:, None, None]
        gy = jnp.arange(Y, dtype=flow.dtype)[None, :, None]
        gx = jnp.arange(X, dtype=flow.dtype)[None, None, :]
        mx = gx + flow[..., 0]
        my = gy + flow[..., 1]
        mz = gz + flow[..., 2]
        inb = ((mx >= 0) & (mx < X) & (my >= 0) & (my < Y)
               & (mz >= 0) & (mz < Z))
        outs = [reg_c, stats, inb.all()]
        if want_mask:
            outs.append(inb)
        if want_comp:
            # compensated preprocessed frame for the reference-update rule
            # (compensate_recording_3D.py:395-429) — accumulated as a
            # masked SUM by the chunk wrapper, never retained per frame
            outs.append(imregister_wrapper(
                proc, flow[..., 0], flow[..., 1], flow[..., 2], ref_proc,
                interpolation_method=interp))
        return tuple(outs)

    return one


@lru_cache(maxsize=16)
def _jit_finalize_chunk(interp, out_dtype_name, device_cast, want_mask,
                        want_comp=False):
    """Warp the raw chunk by its flows, cast to the output dtype on device,
    and reduce per-frame statistics + in-bounds validity in the same
    program (stats parity: pipeline.stats / reference :487-508). With
    ``want_comp``, also returns the upd_mask-weighted SUM of compensated
    preprocessed frames (the reference-update accumulator)."""
    one = _finalize_one(interp, out_dtype_name, device_cast, want_mask,
                        want_comp)

    if not want_comp:
        def chunk(batch_raw, flows, ref_raw):
            return jax.lax.map(lambda a: one(a[0], a[1], ref_raw),
                               (batch_raw, flows))
    else:
        def chunk(batch_raw, flows, ref_raw, proc, ref_proc, upd_mask):
            outs = jax.lax.map(
                lambda a: one(a[0], a[1], ref_raw, a[2], ref_proc),
                (batch_raw, flows, proc))
            comp = outs[-1]
            comp_sum = jnp.einsum("t...,t->...", comp, upd_mask)
            return outs[:-1] + (comp_sum,)

    return jax.jit(chunk)


@lru_cache(maxsize=8)
def _jit_flow_mesh(config_key, mesh_devices):
    """shard_map of the shared-w_init flow step over a 1-D batch mesh."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(list(mesh_devices)), ("batch",))
    pyramid = build_pyramid_raw(*config_key)

    def local(batch_proc, ref_proc, w_init, weight):
        # unrolled on purpose: lax.map compiles the pyramid body as a
        # scan whose numerics differ at the last bit from the
        # single-device chunk program, breaking the executor bit-identity
        # invariant (test_resident_mesh_matches_single). Trace size is
        # bounded by the per-device frame cap in _chunk_size.
        flows = [pyramid(ref_proc, batch_proc[t], w_init, weight)
                 for t in range(batch_proc.shape[0])]
        return jnp.stack(flows)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("batch"), P(), P(), P()),
                   out_specs=P("batch"))
    return jax.jit(fn), mesh


@lru_cache(maxsize=8)
def _jit_finalize_mesh(interp, out_dtype_name, device_cast, want_mask,
                       mesh_devices, want_comp=False):
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(list(mesh_devices)), ("batch",))
    one = _finalize_one(interp, out_dtype_name, device_cast, want_mask,
                        want_comp)
    n_out = 3 + int(want_mask)

    if not want_comp:
        def local(batch_raw, flows, ref_raw):
            return jax.lax.map(lambda a: one(a[0], a[1], ref_raw),
                               (batch_raw, flows))

        fn = shard_map(local, mesh=mesh,
                       in_specs=(P("batch"), P("batch"), P()),
                       out_specs=tuple(P("batch")
                                       for _ in range(n_out)))
    else:
        def local(batch_raw, flows, ref_raw, proc, ref_proc, upd_mask):
            outs = jax.lax.map(
                lambda a: one(a[0], a[1], ref_raw, a[2], ref_proc),
                (batch_raw, flows, proc))
            comp = outs[-1]
            local_sum = jnp.einsum("t...,t->...", comp, upd_mask)
            # replicated masked sum across the batch shards (ICI psum)
            return outs[:-1] + (jax.lax.psum(local_sum, "batch"),)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("batch"), P("batch"), P(), P("batch"), P(),
                      P("batch")),
            out_specs=tuple(P("batch") for _ in range(n_out)) + (P(),))
    return jax.jit(fn), mesh


def _pad_batch(arr, k):
    """Pad axis 0 up to a multiple of k (edge-repeat); returns (padded, n)."""
    T = arr.shape[0]
    pad = (-T) % k
    if pad == 0:
        return arr, T
    reps = np.concatenate([np.arange(T), np.full(pad, T - 1)])
    return arr[reps], T


class ResidentPipeline:
    """Per-run device state + the compiled stage programs.

    ``mode``: 'single' (sequential/batched executors; chunked lax.map on one
    device) or 'mesh' (frames shard_map-ed over a 1-D batch mesh, reference
    volumes replicated — the w_init tail-mean later crosses shards over ICI,
    never the host).
    """

    def __init__(self, options, reference_raw, reference_proc, weight,
                 config_key, mode="single", mesh=None,
                 chunk=None, voxel_budget=2.0e7):
        self.options = options
        self.key = config_key
        self.mode = mode
        self.interp = options.interpolation_method.value
        self.chunk = chunk
        self.voxel_budget = voxel_budget
        self._mesh_devices = (tuple(mesh.devices.ravel().tolist())
                              if mesh is not None else None)
        self.n_devices = len(self._mesh_devices) if self._mesh_devices else 1

        ref = np.asarray(reference_raw)
        if ref.ndim == 3:
            ref = ref[..., None]
        self._shape = ref.shape  # (Z,Y,X,C)
        self.ref_raw_d = jnp.asarray(ref.astype(np.float32))
        rp = np.asarray(reference_proc, np.float32)
        if rp.ndim == 3:
            rp = rp[..., None]
        self.ref_proc_d = jnp.asarray(rp)
        self.weight_d = jnp.asarray(np.asarray(weight, np.float32))
        self.zero_w = jnp.zeros(ref.shape[:3] + (3,), jnp.float32)
        self._ref_dirty = False

        # normalization range from the raw reference volume (host, once)
        self._norm_mode = ("separate"
                           if str(options.channel_normalization.value)
                           == "separate" else "together")
        ref64 = ref.astype(np.float64)
        if self._norm_mode == "separate":
            caxes = tuple(range(ref64.ndim - 1))
            lo = ref64.min(axis=caxes)
            hi = ref64.max(axis=caxes)
        else:
            lo = ref64.min()
            hi = ref64.max()
        self._lo = jnp.asarray(np.asarray(lo, np.float32))
        self._hi = jnp.asarray(np.asarray(hi, np.float32))
        self._sigma_key = tuple(
            map(tuple, np.atleast_2d(np.asarray(options.sigma, float))))

    # -- stage drivers ------------------------------------------------------

    def _chunk_size(self, T):
        if self.chunk:
            k = max(1, int(self.chunk))
        else:
            Z, Y, X, C = self._shape
            voxels = Z * Y * X * max(1, C)
            k = max(1, min(T, int(self.voxel_budget // max(voxels, 1))))
        if self.mode == "mesh":
            # cap frames per device per chunk: the mesh flow local is
            # UNROLLED (bit-identity, see _jit_flow_mesh), so one chunk
            # must not trace an unbounded number of pyramid bodies
            k = min(k, 8 * self.n_devices)
            k = max(self.n_devices, (k // self.n_devices) * self.n_devices)
        return min(k, T if self.mode != "mesh"
                   else -(-T // self.n_devices) * self.n_devices)

    def _upload_and_preprocess(self, batch):
        """Host batch (T,Z,Y,X[,C]) native dtype -> (raw_d, proc_d)."""
        batch = np.asarray(batch)
        if batch.ndim == 4:
            batch = batch[..., None]
        self._in_dtype = batch.dtype
        canon = jax.dtypes.canonicalize_dtype(batch.dtype)
        self._device_cast = np.dtype(canon) == batch.dtype
        raw_d = jnp.asarray(batch)  # native dtype up; canonicalized if f64
        proc_d = _jit_preprocess_batch(self._sigma_key, self._norm_mode)(
            raw_d, self._lo, self._hi)
        return raw_d, proc_d

    def _flow_fn(self):
        if self.mode == "mesh":
            fn, _ = _jit_flow_mesh(self.key, self._mesh_devices)
            return lambda proc_c, w_init: fn(proc_c, self.ref_proc_d,
                                             w_init, self.weight_d)
        fn = _jit_flow_chunk_shared(self.key)
        return lambda proc_c, w_init: fn(self.ref_proc_d, proc_c, w_init,
                                         self.weight_d)

    def _finalize_fn(self, want_mask, want_comp=False):
        out_name = np.dtype(self._in_dtype).name if self._device_cast \
            else "float32"
        if self.mode == "mesh":
            fn, _ = _jit_finalize_mesh(self.interp, out_name,
                                       self._device_cast, want_mask,
                                       self._mesh_devices,
                                       want_comp=want_comp)
        else:
            fn = _jit_finalize_chunk(self.interp, out_name,
                                     self._device_cast, want_mask,
                                     want_comp=want_comp)
        return fn

    def _host_cast(self, reg):
        """Downloaded registered frames -> the input dtype (non-canonical
        dtypes, e.g. f64/i64, come back as f32 and cast on host)."""
        if reg.dtype != self._in_dtype:
            if np.issubdtype(self._in_dtype, np.integer):
                info = np.iinfo(self._in_dtype)
                reg = np.clip(np.rint(reg), info.min, info.max).astype(
                    self._in_dtype)
            else:
                reg = reg.astype(self._in_dtype)
        return reg

    def _initial_w(self, proc_parts, n, progress_callback=None):
        """Mean flow of the first ``n`` frames from a zero init (reference
        :342-393) — accumulated as a running sum, never stacking flows."""
        fn = self._flow_fn()
        acc = None
        seen = 0
        for part in proc_parts:
            if seen >= n:
                break
            fl = fn(part, self.zero_w)
            take = min(part.shape[0], n - seen)
            s = jnp.sum(fl[:take], axis=0)
            acc = s if acc is None else acc + s
            seen += take
            del fl
            if progress_callback:
                progress_callback(take)
        return acc / seen

    def run_batch(self, batch, w_init=None, use_w_init=True,
                  want_mask=False, keep_flows_host=False,
                  update_reference=False, progress_callback=None,
                  initial_progress_callback=None):
        """One batch end-to-end, chunk-streamed to bound HBM.

        The warp program's static allocation (both cond branches of the
        tiered Pallas/row-gather dispatch) dominates the chip; persistent
        arrays are kept to: the refs, the raw/proc chunks still pending,
        the CURRENT chunk's flow, and a running (Z,Y,X,3) tail-sum for the
        w_init propagation — never the whole batch's flows (805 MB at
        canonical shape+batch 4, which OOMed a 16 GB chip alongside the
        warp program).

        Returns a dict: registered (np, input dtype), stats (np (T,4)),
        valid (np bool (T,)), masks (np u8 or None), flows (np or None),
        w_init (device (Z,Y,X,3) tail mean), initial_w (device or None).
        """
        batch = np.asarray(batch)
        if batch.ndim == 4:
            batch = batch[..., None]
        T = batch.shape[0]
        k = self._chunk_size(T)
        raw_d, proc_d = self._upload_and_preprocess(batch)
        # split into per-chunk device arrays so consumed chunks free
        raw_parts, proc_parts, n_valid = [], [], []
        for t0 in range(0, T, k):
            sl = slice(t0, min(t0 + k, T))
            rp, n = _pad_batch(raw_d[sl], k)
            pp, _ = _pad_batch(proc_d[sl], k)
            raw_parts.append(rp)
            proc_parts.append(pp)
            n_valid.append(n)
        del raw_d, proc_d

        initial_w = None
        if w_init is None:
            initial_w = self._initial_w(proc_parts, min(22, T),
                                        initial_progress_callback)
            w_init = initial_w
        current = jnp.asarray(w_init if use_w_init else self.zero_w,
                              jnp.float32)

        flow_fn = self._flow_fn()
        fin_fn = self._finalize_fn(want_mask, want_comp=update_reference)
        tail_start = T - min(20, T)
        n_upd = min(100, T)
        upd_start = T - n_upd
        tail_sum = None
        tail_n = 0
        comp_sum = None  # reference-update accumulator (Z,Y,X,C)
        regs, stats, valids, masks, flows_host = [], [], [], [], []
        done = 0
        for i, (raw_c, proc_c) in enumerate(zip(raw_parts, proc_parts)):
            n = n_valid[i]
            fl = flow_fn(proc_c, current)
            if update_reference:
                # per-frame weights selecting the last <=100 frames; the
                # compensated frames are reduced INSIDE the program — no
                # proc/flow retention (the old path kept the whole batch
                # on device and re-created the warp-program OOM)
                w_upd = (np.arange(done, done + raw_c.shape[0])
                         >= upd_start).astype(np.float32)
                w_upd[n:] = 0.0  # padded frames contribute nothing
                outs = fin_fn(raw_c, fl, self.ref_raw_d, proc_c,
                              self.ref_proc_d, jnp.asarray(w_upd))
                cs = outs[-1]
                comp_sum = cs if comp_sum is None else comp_sum + cs
                outs = outs[:-1]
            else:
                outs = fin_fn(raw_c, fl, self.ref_raw_d)
            proc_parts[i] = None  # free the chunk's proc frames
            raw_parts[i] = None
            reg_c, st_c, va_c = outs[:3]
            # NO synchronous downloads inside the loop: a blocking
            # np.asarray per chunk serializes every chunk against the
            # host link round-trip — all chunks are enqueued async and
            # the downloads drain at the end of the batch
            reg_c = reg_c[:n]
            try:
                reg_c.copy_to_host_async()
            except Exception:
                pass
            regs.append(reg_c)
            stats.append(st_c[:n])
            valids.append(va_c[:n])
            if want_mask:
                masks.append(outs[3][:n])
            del outs, st_c, va_c
            # w_init propagation: running sum over the last <=20 frames
            lo = max(done, tail_start) - done
            if lo < n:
                s = jnp.sum(fl[lo:n], axis=0)
                tail_sum = s if tail_sum is None else tail_sum + s
                tail_n += n - lo
            if keep_flows_host:
                # one-chunk delay: start this chunk's D2H copy async and
                # convert the PREVIOUS chunk's (its transfer has had a
                # full chunk of compute to land) — bounds device-resident
                # flows to one chunk instead of the whole batch
                fl_keep = fl[:n].astype(jnp.float32)
                try:
                    fl_keep.copy_to_host_async()
                except Exception:
                    pass
                if flows_host:
                    flows_host[-1] = np.asarray(flows_host[-1])
                flows_host.append(fl_keep)
            del fl
            done += n
            if progress_callback:
                progress_callback(n)

        new_w_init = tail_sum / max(tail_n, 1)
        if update_reference and comp_sum is not None:
            self.ref_proc_d = comp_sum / n_upd
            self._ref_dirty = True
            del comp_sum

        regs = [self._host_cast(np.asarray(r)) for r in regs]
        stats = [np.asarray(x) for x in stats]
        valids = [np.asarray(x) for x in valids]
        masks = [np.asarray(x).astype(np.uint8) for x in masks]
        flows_host = [np.asarray(x) for x in flows_host]
        return {
            "registered": np.concatenate(regs) if len(regs) > 1
            else regs[0],
            "stats": np.concatenate(stats) if len(stats) > 1 else stats[0],
            "valid": np.concatenate(valids) if len(valids) > 1
            else valids[0],
            "masks": (np.concatenate(masks) if len(masks) > 1
                      else masks[0]) if want_mask else None,
            "flows": (np.concatenate(flows_host) if len(flows_host) > 1
                      else flows_host[0]) if keep_flows_host else None,
            "w_init": new_w_init,
            "initial_w": initial_w,
        }

    def ref_proc_np(self):
        """Host mirror of the (possibly updated) processed reference."""
        return np.asarray(self.ref_proc_d, np.float64)
