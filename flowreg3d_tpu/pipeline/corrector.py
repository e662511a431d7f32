"""BatchMotionCorrector: the streaming motion-correction engine.

Parity target: reference motion_correction/compensate_recording_3D.py:32-633
— executor setup with fallback chain, I/O setup (w.h5 writer with u/v/w
datasets when save_w), reference setup + per-channel weight volume,
preprocessing (normalize against reference then Gaussian, "MATLAB order"),
``run()`` streaming batch loop with w_init auto-initialization (mean flow of
first ≤22 frames :342-393), w_init propagation (mean of last ≤20 flows
:481-485), per-frame statistics (:487-508), optional reference updating
(≤100 compensated frames :395-429), metadata persistence
(statistics.npz + reference_frame.npy :559-581), and progress callbacks with
task IDs (:126-162).

TPU-native: batches are registered by the parallel executor tier
(vmap / mesh sharding) instead of thread/process pools; checkpoint/resume of
batch state (frame index + w_init + reference) is an addition over the
reference (SURVEY.md §5 flags it as absent there).
"""

import warnings
from dataclasses import dataclass
from pathlib import Path
from time import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from flowreg3d_tpu.ops.filters import apply_gaussian_filter, normalize
from flowreg3d_tpu.parallel.executors import get_executor
from flowreg3d_tpu.pipeline.of_options import OFOptions, OutputFormat
from flowreg3d_tpu.pipeline.stats import flow_statistics


@dataclass
class RegistrationConfig:
    """Execution knobs (parity: reference compensate_recording_3D.py:20-28).

    ``parallelization``: None = auto (mesh if >1 device else batched), or
    'sequential' / 'batched' / 'mesh' / 'spatial' (Z-sharded single
    frames for volumes beyond one chip's HBM; reference names
    'sequential3d', 'threading3d', 'multiprocessing3d' are accepted
    aliases).
    """

    n_jobs: int = -1
    batch_size: int = 10
    verbose: bool = False
    parallelization: Optional[str] = None
    checkpoint: bool = False
    profile_dir: Optional[str] = None  # jax.profiler trace output directory
    prefetch: int = 2  # host-side read-ahead batches (0 disables)
    async_write: bool = True  # background-thread output writing
    # device-resident batch engine (pipeline/device_pipeline.py): None =
    # auto (on whenever the configuration supports it), False = force the
    # legacy host-staged path, True = require (raise if unsupported)
    device_resident: Optional[bool] = None
    # deep-flow plug-in: a get_displacement-protocol callable, or the name
    # of a backend registered via runtime.register_flow_backend; None = the
    # built-in variational solver
    get_displacement_func: Optional[Callable] = None
    flow_backend: Optional[str] = None


class BatchMotionCorrector:
    """Streaming batch registration pipeline."""

    def __init__(self, options: OFOptions,
                 config: Optional[RegistrationConfig] = None):
        self.options = options
        self.config = config or RegistrationConfig()

        self.mean_disp: List[float] = []
        self.max_disp: List[float] = []
        self.mean_div: List[float] = []
        self.mean_translation: List[float] = []

        self.reference_raw = None
        self.reference_proc = None
        self.weight = None
        self.w_init = None

        self.video_reader = None
        self.video_writer = None
        self.w_writer = None
        self.valid_writer = None
        self.valid_idx: List[bool] = []

        self.progress_callbacks: List[Callable[[int, Optional[int]], None]] = []
        self._progress: Dict[str, Tuple[int, Optional[int]]] = {}
        self._total_frames: Optional[int] = None
        self._resident = None
        self.used_device_resident = False  # diagnostic: engaged last run

        self._setup_executor()

    # -- setup --------------------------------------------------------------

    def _setup_executor(self):
        name = self.config.parallelization
        try:
            self.executor = get_executor(name)
        except ValueError:
            warnings.warn(f"Executor '{name}' not available, "
                          "falling back to sequential")
            self.executor = get_executor("sequential")
        if self.config.verbose:
            print(f"Using {self.executor.name} executor "
                  f"({self.executor.get_info()})")

    def _setup_io(self):
        output_path = Path(self.options.output_path)
        if self.options.output_format != OutputFormat.ARRAY:
            output_path.mkdir(parents=True, exist_ok=True)
        self.video_reader = self.options.get_video_reader()
        if self.config.prefetch and self.config.prefetch > 0:
            from flowreg3d_tpu.io.prefetch import PrefetchReader3D

            self.video_reader = PrefetchReader3D(
                self.video_reader, prefetch_depth=self.config.prefetch)
        self.video_writer = self.options.get_video_writer()
        if self.config.async_write \
                and self.options.output_format != OutputFormat.ARRAY:
            from flowreg3d_tpu.io.async_writer import AsyncWriter3D

            self.video_writer = AsyncWriter3D(self.video_writer)
        if getattr(self.options, "save_w", False):
            try:
                from flowreg3d_tpu.io.factory import get_video_file_writer

                if self.options.output_format == OutputFormat.ARRAY:
                    self.w_writer = get_video_file_writer(None, "ARRAY")
                else:
                    self.w_writer = get_video_file_writer(
                        str(output_path / "w.h5"), "HDF5",
                        dataset_names=["u", "v", "w"])
            except Exception as e:
                warnings.warn(f"Failed to create displacement writer: {e}. "
                              "Displacements will not be saved.")
                self.w_writer = None
                self.options.save_w = False
        # valid-mask outputs (the reference accepts these fields but never
        # consumes them, OF_options_3D.py:200-201; here they work): a voxel
        # is valid when its warp sample stayed in bounds (not filled from
        # the reference volume)
        if getattr(self.options, "save_valid_mask", False) \
                and self.options.output_format != OutputFormat.ARRAY:
            try:
                from flowreg3d_tpu.io.factory import get_video_file_writer

                self.valid_writer = get_video_file_writer(
                    str(output_path / "valid_mask.h5"), "HDF5")
            except Exception as e:
                warnings.warn(f"Failed to create valid-mask writer: {e}.")
                self.valid_writer = None
        else:
            self.valid_writer = None

    def _setup_reference(self, reference_frame=None):
        if reference_frame is None:
            ref = self.options.get_reference_frame(self.video_reader)
        else:
            ref = reference_frame
        ref = self._select_channels(np.asarray(ref))
        self.reference_raw = np.asarray(ref, np.float64)
        if self.reference_raw.ndim == 3:
            self.reference_raw = self.reference_raw[..., np.newaxis]
        Z, Y, X, C = self.reference_raw.shape

        self.weight = np.ones((Z, Y, X, C), np.float64)
        for c in range(C):
            self.weight[..., c] = self.options.get_weight_at(c, C)

        self.reference_proc = self._preprocess_frames(self.reference_raw)

    # -- preprocessing ------------------------------------------------------

    def _select_channels(self, frames):
        """Apply options.channel_idx (0-based channel subset) if set."""
        idx = getattr(self.options, "channel_idx", None)
        if idx:
            frames = np.asarray(frames)[..., list(idx)]
        return frames

    def _preprocess_frames(self, frames, normalization_ref=None):
        """normalize (optionally vs reference range) then Gaussian filter —
        the reference's "MATLAB order" (:229-254). A user-supplied
        ``preproc_funct`` replaces the default chain."""
        if self.options.preproc_funct is not None:
            return np.asarray(self.options.preproc_funct(frames), np.float64)
        mode = ("separate" if str(self.options.channel_normalization.value)
                == "separate" else "together")
        normalized = normalize(frames, ref=normalization_ref,
                               channel_normalization=mode)
        filtered = apply_gaussian_filter(
            normalized, sigma=np.asarray(self.options.sigma, dtype=float))
        return np.asarray(filtered, np.float64)

    # -- progress -----------------------------------------------------------

    def register_progress_callback(self, callback):
        self.progress_callbacks.append(callback)

    def _notify(self, n_done, task_id="main"):
        done, total = self._progress.get(task_id, (0, self._total_frames))
        done += n_done
        self._progress[task_id] = (done, total)
        if task_id != "main":
            return
        for cb in self.progress_callbacks:
            try:
                cb(done, total)
            except Exception:
                pass  # callbacks must not break the pipeline (ref :201-456)

    # -- device-resident engine (pipeline/device_pipeline.py) ---------------

    def _setup_resident(self):
        """Build the device-resident batch engine when the config allows it.

        Falls back to the legacy host-staged path (and warns) on any
        construction failure unless ``config.device_resident is True``.
        """
        from flowreg3d_tpu.pipeline.device_pipeline import (
            ResidentPipeline, resident_supported)

        self._resident = None
        if not resident_supported(self.options, self.config, self.executor):
            if self.config.device_resident is True:
                raise ValueError(
                    "device_resident=True but the configuration requires "
                    "the host-staged path (custom preproc/backend, "
                    "cc_initialization, or spatial executor)")
            return
        try:
            from flowreg3d_tpu.parallel.executors import _config_key

            flow_params = self._flow_params()
            key = _config_key(
                self.reference_proc if self.reference_proc.ndim == 4
                else self.reference_proc[..., None],
                flow_params, getattr(self.executor, "dtype", None)
                or "float32")
            weight_vol = self.executor._weight_volume(
                flow_params,
                self.reference_proc if self.reference_proc.ndim == 4
                else self.reference_proc[..., None])
            mode = "mesh" if self.executor.name == "mesh" else "single"
            self._resident = ResidentPipeline(
                self.options, self.reference_raw, self.reference_proc,
                weight_vol, key, mode=mode,
                mesh=getattr(self.executor, "mesh", None),
                chunk=getattr(self.executor, "chunk", None),
                voxel_budget=getattr(self.executor, "voxel_budget", 2.0e7))
        except Exception as e:
            if self.config.device_resident is True:
                raise
            warnings.warn(f"device-resident pipeline unavailable ({e}); "
                          "using the host-staged path")
            self._resident = None

    def _process_batch_resident(self, batch):
        """One batch through the resident engine (chunk-streamed on
        device); returns the run_batch result dict."""
        st = self._resident
        icb = ((lambda n: self._notify(n, "initial_w"))
               if self.progress_callbacks else None)
        cb = ((lambda n: self._notify(n)) if self.progress_callbacks
              else None)
        out = st.run_batch(
            batch,
            w_init=self.w_init,
            use_w_init=self.options.update_initialization_w,
            want_mask=(self.valid_writer is not None),
            keep_flows_host=bool(self.options.save_w
                                 and self.w_writer is not None),
            update_reference=bool(self.options.update_reference),
            progress_callback=cb, initial_progress_callback=icb)
        if self.w_init is None:
            self.w_init = out["initial_w"]
        if self.options.update_initialization_w:
            self.w_init = out["w_init"]
        if self.options.update_reference:
            self.reference_proc = None  # stale; re-mirrored on demand
        return out

    def _sync_reference_from_device(self):
        if self._resident is not None and self._resident._ref_dirty:
            self.reference_proc = self._resident.ref_proc_np()
            self._resident._ref_dirty = False
        elif self.reference_proc is None and self._resident is not None:
            self.reference_proc = self._resident.ref_proc_np()

    # -- batch processing ---------------------------------------------------

    def _flow_params(self):
        fp = self.options.to_dict()
        fp["weight"] = self.weight
        fp["cc_initialization"] = self.options.cc_initialization
        fp["cc_hw"] = self.options.cc_hw
        fp["cc_up"] = self.options.cc_up
        return fp

    def _process_batch(self, batch, batch_proc, w_init, task_id="main"):
        cb = None
        if self.progress_callbacks and task_id == "main":
            cb = lambda n: self._notify(n, task_id)
        interp = self.options.interpolation_method.value
        return self.executor.process_batch(
            batch=batch, batch_proc=batch_proc,
            reference_raw=self.reference_raw,
            reference_proc=self.reference_proc,
            w_init=w_init, interpolation_method=interp,
            get_displacement_func=self._resolve_flow_backend(),
            progress_callback=cb, flow_params=self._flow_params())

    def _resolve_flow_backend(self):
        if self.config.get_displacement_func is not None:
            return self.config.get_displacement_func
        if self.config.flow_backend not in (None, "", "variational"):
            from flowreg3d_tpu.runtime import get_flow_backend

            fn = get_flow_backend(self.config.flow_backend)
            self.config.get_displacement_func = fn  # instantiate once
            return fn
        return None

    @staticmethod
    def _valid_mask(w):
        """(T,Z,Y,X) bool: warp sample coordinates stayed in bounds."""
        T, Z, Y, X, _ = w.shape
        gz = np.arange(Z).reshape(1, Z, 1, 1)
        gy = np.arange(Y).reshape(1, 1, Y, 1)
        gx = np.arange(X).reshape(1, 1, 1, X)
        mx = gx + w[..., 0]
        my = gy + w[..., 1]
        mz = gz + w[..., 2]
        return ((mx >= 0) & (mx < X) & (my >= 0) & (my < Y)
                & (mz >= 0) & (mz < Z))

    def _compute_initial_w(self, batch, batch_proc):
        Z, Y, X = self.reference_proc.shape[:3]
        if getattr(self.options, "cc_initialization", False):
            return np.zeros((Z, Y, X, 3), np.float32)
        n_init = min(22, batch.shape[0])
        _, w = self._process_batch(batch[:n_init], batch_proc[:n_init],
                                   np.zeros((Z, Y, X, 3), np.float32),
                                   task_id="initial_w")
        return np.mean(w, axis=0)

    def _update_reference(self, batch_proc, w):
        from flowreg3d_tpu.ops.warp import imregister_wrapper

        n = min(100, batch_proc.shape[0])
        if n < 1:
            return
        start = batch_proc.shape[0] - n
        interp = self.options.interpolation_method.value
        comp = []
        for t in range(start, batch_proc.shape[0]):
            comp.append(np.asarray(imregister_wrapper(
                batch_proc[t], w[t, ..., 0], w[t, ..., 1], w[t, ..., 2],
                self.reference_proc, interpolation_method=interp)))
        self.reference_proc = np.mean(comp, axis=0)

    # -- checkpoint / resume (addition over the reference) ------------------

    def _checkpoint_path(self):
        return Path(self.options.output_path) / "checkpoint.npz"

    def _save_checkpoint(self, frames_done):
        if not self.config.checkpoint \
                or self.options.output_format == OutputFormat.ARRAY:
            return
        self._sync_reference_from_device()
        np.savez(self._checkpoint_path(), frames_done=frames_done,
                 w_init=np.asarray(self.w_init)
                 if self.w_init is not None else 0,
                 reference_raw=self.reference_raw,
                 reference_proc=self.reference_proc,
                 mean_disp=np.asarray(self.mean_disp),
                 max_disp=np.asarray(self.max_disp),
                 mean_div=np.asarray(self.mean_div),
                 mean_translation=np.asarray(self.mean_translation))

    def _load_checkpoint(self):
        p = self._checkpoint_path()
        if not (self.config.checkpoint and p.exists()):
            return None
        data = np.load(p, allow_pickle=False)
        return data

    # -- run ----------------------------------------------------------------

    def run(self, reference_frame=None):
        if self.config.profile_dir:
            import jax

            with jax.profiler.trace(self.config.profile_dir):
                return self._run(reference_frame)
        return self._run(reference_frame)

    def _run(self, reference_frame=None):
        self._setup_io()
        self._setup_reference(reference_frame)
        self._total_frames = len(self.video_reader) if self.video_reader \
            else None

        ckpt = self._load_checkpoint()
        frames_to_skip = 0
        if ckpt is not None:
            frames_to_skip = int(ckpt["frames_done"])
            self.w_init = np.asarray(ckpt["w_init"], np.float32)
            self.reference_raw = np.asarray(ckpt["reference_raw"])
            self.reference_proc = np.asarray(ckpt["reference_proc"])
            # restore per-frame statistics so statistics.npz after a
            # resumed run matches an uninterrupted one
            for key in ("mean_disp", "max_disp", "mean_div",
                        "mean_translation"):
                if key in ckpt:
                    getattr(self, key).extend(
                        np.asarray(ckpt[key]).reshape(-1).tolist())
            if self.config.verbose:
                print(f"Resuming from checkpoint at frame {frames_to_skip}")
            # fast-forward without decoding the already-processed batches
            seek = getattr(self.video_reader, "seek_frame", None)
            if seek is not None and frames_to_skip:
                try:
                    seek(frames_to_skip)
                    seeked_frames = frames_to_skip
                    frames_to_skip = 0
                except (ValueError, RuntimeError):
                    seeked_frames = 0  # stream started: skip-read fallback
            else:
                seeked_frames = 0
        else:
            seeked_frames = 0

        self._setup_resident()
        self.used_device_resident = self._resident is not None

        if self.config.verbose:
            print(f"Starting compensation with "
                  f"quality={self.options.quality_setting.value}, "
                  f"buffer={self.options.buffer_size}")

        batch_idx = 0
        total_frames = seeked_frames
        start_time = time()
        try:
            while self.video_reader.has_batch():
                batch_idx += 1
                t0 = time()
                batch = self._select_channels(self.video_reader.read_batch())
                if frames_to_skip >= batch.shape[0]:
                    frames_to_skip -= batch.shape[0]
                    total_frames += batch.shape[0]
                    continue

                if self._resident is not None:
                    out = self._process_batch_resident(batch)
                    registered = out["registered"]
                    stats_arr = out["stats"]
                    self.mean_disp.extend(stats_arr[:, 0].tolist())
                    self.max_disp.extend(stats_arr[:, 1].tolist())
                    self.mean_div.extend(stats_arr[:, 2].tolist())
                    self.mean_translation.extend(stats_arr[:, 3].tolist())
                    self.video_writer.write_frames(registered)
                    if out["flows"] is not None and self.w_writer is not None:
                        # the one case where full flows cross the link
                        self.w_writer.write_frames(out["flows"])
                    if self.valid_writer is not None \
                            and out["masks"] is not None:
                        self.valid_writer.write_frames(
                            out["masks"][..., None])
                    if getattr(self.options, "save_valid_idx", False):
                        self.valid_idx.extend(out["valid"].tolist())
                else:
                    batch_proc = self._preprocess_frames(
                        batch, normalization_ref=self.reference_raw)

                    if self.w_init is None:
                        self.w_init = self._compute_initial_w(batch,
                                                              batch_proc)

                    current_w_init = (self.w_init
                                      if self.options.update_initialization_w
                                      else np.zeros_like(self.w_init))

                    registered, w = self._process_batch(batch, batch_proc,
                                                        current_w_init)

                    if self.options.update_initialization_w:
                        tail = w[-20:] if w.shape[0] > 20 else w
                        self.w_init = np.mean(tail, axis=0)

                    stats = flow_statistics(w)
                    self.mean_disp.extend(stats["mean_disp"])
                    self.max_disp.extend(stats["max_disp"])
                    self.mean_div.extend(stats["mean_div"])
                    self.mean_translation.extend(stats["mean_translation"])

                    self.video_writer.write_frames(registered)
                    if self.options.save_w and self.w_writer is not None:
                        self.w_writer.write_frames(w)
                    if self.valid_writer is not None \
                            or getattr(self.options, "save_valid_idx", False):
                        mask = self._valid_mask(w)
                        if self.valid_writer is not None:
                            self.valid_writer.write_frames(
                                mask[..., None].astype(np.uint8))
                        if getattr(self.options, "save_valid_idx", False):
                            self.valid_idx.extend(
                                mask.all(axis=(1, 2, 3)).tolist())

                    if self.options.update_reference:
                        self._update_reference(batch_proc, w)

                total_frames += registered.shape[0]
                self._save_checkpoint(total_frames)
                if self.config.verbose:
                    dt = time() - t0
                    print(f"Batch {batch_idx}: {registered.shape[0]} frames "
                          f"in {dt:.2f}s ({registered.shape[0] / dt:.1f} fps)")
        finally:
            if self.executor is not None:
                self.executor.cleanup()
            if self._resident is not None:
                # release the engine's device buffers (refs, w_init) so an
                # interrupted or finished run leaves no HBM behind
                try:
                    self._sync_reference_from_device()
                except Exception:
                    pass
                if self.w_init is not None:
                    self.w_init = np.asarray(self.w_init)
                self._resident = None

        if self.config.verbose:
            dt = time() - start_time
            print(f"Processed {total_frames} frames in {dt:.2f}s "
                  f"(avg {total_frames / max(dt, 1e-6):.1f} fps)")

        self._save_metadata()
        self._cleanup()
        return self.reference_raw

    # -- teardown -----------------------------------------------------------

    def _save_metadata(self):
        if not getattr(self.options, "save_meta_info", True):
            return
        if self.options.output_format == OutputFormat.ARRAY:
            return
        out = Path(self.options.output_path)
        try:
            out.mkdir(parents=True, exist_ok=True)
            np.savez(out / "statistics.npz",
                     mean_disp=np.asarray(self.mean_disp),
                     max_disp=np.asarray(self.max_disp),
                     mean_div=np.asarray(self.mean_div),
                     mean_translation=np.asarray(self.mean_translation))
            np.save(out / "reference_frame.npy", self.reference_raw)
            if getattr(self.options, "save_valid_idx", False):
                np.save(out / "valid_idx.npy",
                        np.asarray(self.valid_idx, bool))
        except Exception as e:
            warnings.warn(f"Failed to save metadata: {e}")

    def _cleanup(self):
        for closer in (self.video_writer, self.w_writer, self.valid_writer,
                       self.video_reader):
            if closer is not None:
                try:
                    closer.close()
                except Exception:
                    pass
        p = self._checkpoint_path() if self.config.checkpoint else None
        if p and p.exists():
            try:
                p.unlink()
            except OSError:
                pass


def compensate_recording(options: OFOptions, reference_frame=None,
                         config: Optional[RegistrationConfig] = None):
    """Run the full file-based pipeline (parity: reference :591-633)."""
    corrector = BatchMotionCorrector(options, config)
    return corrector.run(reference_frame)
