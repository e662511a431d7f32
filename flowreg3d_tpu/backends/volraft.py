"""volRAFT-style sliding-window deep-flow backends.

The reference integrates VolRAFT (a 3D RAFT-family CNN) by tiling the
volume into overlapping patches, running the network per patch pair, and
blending the patch flows back into a dense field (reference
examples/motion_correct_3d_volraft_test.py:489+). This module provides:

- ``PatchInferenceHarness``: the tiling/blending machinery, model-agnostic;
- ``VolRAFTBackend``: wraps a TorchScript checkpoint mapping a
  ``(1, 2, D, H, W)`` fixed/moving patch pair to ``(1, 3, D, H, W)`` flow
  (dx, dy, dz order, voxel units);
- ``PatchRigidFlowBackend``: a dependency-free stand-in estimating one
  rigid shift per patch via the subpixel phase-correlation op and blending
  — useful for pipeline tests and as the mock for BASELINE config 5 when
  no checkpoint is available;
- ``load_volraft``: checkpoint discovery honoring ``VOLRAFT_CHECKPOINT_DIR``
  (the reference's env-var convention).
"""

import os

import numpy as np


def _cosine_window(shape):
    """Separable raised-cosine blending weights, strictly positive."""
    ws = []
    for n in shape:
        t = (np.arange(n) + 0.5) / n
        ws.append(0.05 + 0.95 * np.sin(np.pi * t) ** 2)
    return ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]


class PatchInferenceHarness:
    """Tile a volume pair into overlapping patches, infer, blend flows.

    ``infer_patch(fixed_patch, moving_patch) -> (pz, py, px, 3)`` is
    supplied by the concrete backend.
    """

    def __init__(self, patch_size=(16, 32, 32), overlap=0.67):
        self.patch_size = tuple(int(p) for p in patch_size)
        self.overlap = float(overlap)

    def _starts(self, dim, patch):
        if dim <= patch:
            return [0]
        step = max(1, int(round(patch * (1.0 - self.overlap))))
        starts = list(range(0, dim - patch + 1, step))
        if starts[-1] != dim - patch:
            starts.append(dim - patch)
        return starts

    def infer_patch(self, fixed_patch, moving_patch):
        raise NotImplementedError

    def __call__(self, fixed, moving, uvw=None, **params):
        fixed = np.asarray(fixed, np.float32)
        moving = np.asarray(moving, np.float32)
        if fixed.ndim == 4:  # collapse channels for flow estimation
            fixed = fixed.mean(axis=-1)
            moving = moving.mean(axis=-1)
        # uvw is an INITIAL GUESS (reference get_displacement semantics):
        # pre-warp moving by it, estimate the residual, return the total
        base = None
        if uvw is not None:
            base = np.asarray(uvw, np.float32)
            if np.any(base):
                from scipy.ndimage import map_coordinates

                zz, yy, xx = np.meshgrid(
                    *[np.arange(n, dtype=np.float32)
                      for n in fixed.shape], indexing="ij")
                coords = np.stack([zz + base[..., 2], yy + base[..., 1],
                                   xx + base[..., 0]])
                moving = map_coordinates(moving, coords, order=1,
                                         mode="nearest").astype(np.float32)
            else:
                base = None
        Z, Y, X = fixed.shape
        pz = min(self.patch_size[0], Z)
        py = min(self.patch_size[1], Y)
        px = min(self.patch_size[2], X)
        acc = np.zeros((Z, Y, X, 3), np.float64)
        wsum = np.zeros((Z, Y, X, 1), np.float64)
        win = _cosine_window((pz, py, px))[..., None]
        for z0 in self._starts(Z, pz):
            for y0 in self._starts(Y, py):
                for x0 in self._starts(X, px):
                    sl = (slice(z0, z0 + pz), slice(y0, y0 + py),
                          slice(x0, x0 + px))
                    flow = np.asarray(
                        self.infer_patch(fixed[sl], moving[sl]), np.float64)
                    acc[sl] += flow * win
                    wsum[sl] += win
        out = (acc / wsum).astype(np.float32)
        if base is not None:
            out = out + base
        return out


def _phase_shift_3d(fixed, moving):
    """Subpixel 3D phase correlation: content shift s with
    ``moving(p) ~= fixed(p - s)``; the backward flow equals s."""
    a = fixed - fixed.mean()
    b = moving - moving.mean()
    for ax, n in enumerate(a.shape):
        w = np.hanning(n)
        shp = [1] * a.ndim
        shp[ax] = n
        a = a * w.reshape(shp)
        b = b * w.reshape(shp)
    R = np.fft.fftn(a) * np.conj(np.fft.fftn(b))
    R /= np.maximum(np.abs(R), 1e-12)
    r = np.fft.ifftn(R).real
    idx = np.unravel_index(np.argmax(r), r.shape)
    out = []
    for ax, n in enumerate(r.shape):
        i0 = idx[ax]
        sl = list(idx)
        sl[ax] = (i0 - 1) % n
        cm = r[tuple(sl)]
        sl[ax] = (i0 + 1) % n
        cp = r[tuple(sl)]
        c0 = r[idx]
        denom = 2.0 * c0 - cm - cp
        delta = 0.5 * (cp - cm) / denom if abs(denom) > 1e-12 else 0.0
        p = float(i0) + float(np.clip(delta, -1.0, 1.0))
        if p > n / 2:
            p -= n
        # the correlation peaks at MINUS the content shift
        out.append(-p)
    return np.asarray(out)  # (sz, sy, sx)


class PatchRigidFlowBackend(PatchInferenceHarness):
    """Mock volRAFT: one subpixel rigid shift per patch, blended dense.

    Direct 3D phase correlation per patch; adequate for smooth motion and
    as the no-checkpoint stand-in for the combined example / pipeline
    tests.
    """

    def infer_patch(self, fixed_patch, moving_patch):
        s = _phase_shift_3d(fixed_patch, moving_patch)
        flow = np.empty(fixed_patch.shape + (3,), np.float32)
        flow[..., 0] = s[2]   # dx
        flow[..., 1] = s[1]   # dy
        flow[..., 2] = s[0]   # dz
        return flow


class VolRAFTBackend(PatchInferenceHarness):
    """TorchScript volRAFT checkpoint wrapper (CPU torch is in the image).

    The checkpoint must be a scripted module taking ``(1, 2, D, H, W)``
    float32 (fixed, moving stacked on channel) and returning
    ``(1, 3, D, H, W)`` flow in (dx, dy, dz) voxel units.
    """

    def __init__(self, checkpoint_path, patch_size=(16, 64, 64),
                 overlap=0.5, device="cpu"):
        super().__init__(patch_size, overlap)
        import torch

        self._torch = torch
        self.model = torch.jit.load(str(checkpoint_path), map_location=device)
        self.model.eval()
        self.device = device

    def infer_patch(self, fixed_patch, moving_patch):
        torch = self._torch
        with torch.no_grad():
            pair = torch.from_numpy(
                np.stack([fixed_patch, moving_patch])[None]).to(self.device)
            flow = self.model(pair)[0]  # (3, D, H, W)
        return np.moveaxis(flow.cpu().numpy(), 0, -1)


def load_volraft(checkpoint_dir=None, **kwargs):
    """Load a VolRAFT checkpoint (env ``VOLRAFT_CHECKPOINT_DIR`` honored);
    falls back to the rigid mock when no checkpoint exists."""
    checkpoint_dir = checkpoint_dir or os.environ.get(
        "VOLRAFT_CHECKPOINT_DIR")
    if checkpoint_dir:
        for name in ("volraft.pt", "volraft_scripted.pt", "model.pt"):
            p = os.path.join(checkpoint_dir, name)
            if os.path.isfile(p):
                return VolRAFTBackend(p, **kwargs)
    return PatchRigidFlowBackend(**kwargs)


def _register():
    from flowreg3d_tpu.runtime import register_flow_backend

    register_flow_backend("volraft", load_volraft)
    register_flow_backend("volraft-mock", PatchRigidFlowBackend)


_register()
