"""Direct numpy-oracle parity for the gradient-constancy motion tensor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowreg3d_tpu.core.motion_tensor import (
    get_motion_tensor_gc,
    get_motion_tensor_gray,
)

jax.config.update("jax_enable_x64", True)


def _np_gc_tensor(f1, f2, hz, hy, hx):
    """Independent numpy statement of the gc tensor spec (SURVEY.md §2.1)."""
    pad = lambda a: np.pad(a, 1, mode="symmetric")
    repad = lambda a: pad(a[1:-1, 1:-1, 1:-1])
    f1p, f2p = pad(f1), pad(f2)
    grads = lambda f: np.gradient(f, hz, hy, hx)
    gz1, gy1, gx1 = grads(f1p)
    gz2, gy2, gx2 = grads(f2p)
    fx = repad(0.5 * (gx1 + gx2))
    fy = repad(0.5 * (gy1 + gy2))
    fz = repad(0.5 * (gz1 + gz2))
    ft = repad(f2p - f1p)
    fxz, fxy, _ = grads(fx)
    fyz, _, _ = grads(fy)
    fzt, fyt, fxt = grads(ft)

    def second(f, axis, h):
        out = np.zeros_like(f)
        sl = [slice(None)] * 3
        lo, mid, hi = (list(sl) for _ in range(3))
        lo[axis], mid[axis], hi[axis] = (slice(0, -2), slice(1, -1),
                                         slice(2, None))
        out[tuple(mid)] = (f[tuple(lo)] - 2 * f[tuple(mid)]
                           + f[tuple(hi)]) / h ** 2
        return out

    fxx = 0.5 * (second(f1p, 2, hx) + second(f2p, 2, hx))
    fyy = 0.5 * (second(f1p, 1, hy) + second(f2p, 1, hy))
    fzz = 0.5 * (second(f1p, 0, hz) + second(f2p, 0, hz))

    rx = 1.0 / (fxx ** 2 + fxy ** 2 + fxz ** 2 + 1e-6)
    ry = 1.0 / (fxy ** 2 + fyy ** 2 + fyz ** 2 + 1e-6)
    rz = 1.0 / (fxz ** 2 + fyz ** 2 + fzz ** 2 + 1e-6)

    entries = (
        rx * fxx ** 2 + ry * fxy ** 2 + rz * fxz ** 2,
        rx * fxy ** 2 + ry * fyy ** 2 + rz * fyz ** 2,
        rx * fxz ** 2 + ry * fyz ** 2 + rz * fzz ** 2,
        rx * fxt ** 2 + ry * fyt ** 2 + rz * fzt ** 2,
        rx * fxx * fxy + ry * fxy * fyy + rz * fxz * fyz,
        rx * fxx * fxz + ry * fxy * fyz + rz * fxz * fzz,
        rx * fxy * fxz + ry * fyy * fyz + rz * fyz * fzz,
        rx * fxx * fxt + ry * fxy * fyt + rz * fxz * fzt,
        rx * fxy * fxt + ry * fyy * fyt + rz * fyz * fzt,
        rx * fxz * fxt + ry * fyz * fyt + rz * fzz * fzt,
    )
    out = []
    for e in entries:
        e = e.copy()
        for axis in range(3):
            sel = [slice(None)] * 3
            sel[axis] = 0
            e[tuple(sel)] = 0
            sel[axis] = -1
            e[tuple(sel)] = 0
        out.append(e)
    return out


@pytest.mark.parametrize("h", [(1.0, 1.0, 1.0), (2.0, 1.5, 1.25)])
def test_gc_tensor_matches_numpy_oracle(rng, h):
    f1 = rng.random((9, 11, 13))
    f2 = rng.random((9, 11, 13))
    hz, hy, hx = h
    got = get_motion_tensor_gc(jnp.asarray(f1), jnp.asarray(f2), hz, hy, hx)
    want = _np_gc_tensor(f1, f2, hz, hy, hx)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-10, atol=1e-12)


def test_gray_tensor_basic(rng):
    f1 = rng.random((8, 9, 10))
    f2 = rng.random((8, 9, 10))
    J = get_motion_tensor_gray(jnp.asarray(f1), jnp.asarray(f2), 1.0, 1.0, 1.0)
    J11, J22, J33, J44 = (np.asarray(J[i]) for i in range(4))
    # diagonal entries are squares
    assert (J11 >= 0).all() and (J22 >= 0).all()
    assert (J33 >= 0).all() and (J44 >= 0).all()
    # zeroed faces
    assert J11[0].max() == 0 and J11[:, 0].max() == 0 and J11[:, :, 0].max() == 0
