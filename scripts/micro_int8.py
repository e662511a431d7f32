"""Mosaic int8-dot microbenchmark (the round-3 'only big warp lever').

Question to settle (NOTES_ROUND3.md:104-107): do int8 MXU dots lower
through Mosaic on this TPU and run ~2x the bf16 rate? If yes, the warp's
hi/lo-bf16 3-pass contraction can become a 3-product int8 fixed-point
scheme at ~1.5x bf16-pass cost and ~1e-4 error; if no, the bf16x3 design
stays the floor and the negative result gets recorded.

Measures a grid of back-to-back (R, W) @ (W, S) matmuls in one Pallas
kernel — same shapes as the warp's per-chunk contraction (R = Dzl*Dyl or
2R stacked, W = WSUB, S = SUB) — for dtypes int8->int32 and bf16->f32,
plus a mixed fixed-point emulation of the warp contract. Prints ms and
effective TOP/s for each.

Run on the real chip:  python scripts/micro_int8.py
CPU logic check:       JAX_PLATFORMS=cpu python scripts/micro_int8.py --interpret
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flowreg3d_tpu.util.compile_cache import enable_compile_cache

enable_compile_cache()

import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _dot_kernel(n_inner, in_dtype, acc_dtype, a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    acc = jnp.zeros(o_ref.shape, acc_dtype)
    for i in range(n_inner):
        # vary nothing but keep the dots serially dependent enough that
        # Mosaic can't fold them away: rotate the accumulator in
        d = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc_dtype)
        acc = acc + d
    o_ref[...] = acc


def time_dots(R, W, S, in_dtype, acc_dtype, n_inner=64, n_grid=64,
              interpret=False, reps=5):
    rng = np.random.default_rng(0)
    if np.dtype(in_dtype) == np.int8:
        a = rng.integers(-127, 128, (R, W), dtype=np.int8)
        b = rng.integers(-127, 128, (W, S), dtype=np.int8)
    else:
        a = rng.standard_normal((R, W)).astype(in_dtype)
        b = rng.standard_normal((W, S)).astype(in_dtype)

    kern = functools.partial(_dot_kernel, n_inner, in_dtype, acc_dtype)
    fn = pl.pallas_call(
        kern,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec((R, W), lambda g: (0, 0)),
                  pl.BlockSpec((W, S), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((R, S), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, S), acc_dtype),
        interpret=interpret,
    )
    fj = jax.jit(fn)
    out = jax.block_until_ready(fj(a, b))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fj(a, b)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    n_ops = 2 * R * W * S * n_inner * n_grid
    return best, n_ops / best / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--grid", type=int, default=64)
    args = ap.parse_args()

    # warp-chunk shapes: common-case sub-window contract (R = Dzl*Dyl =
    # 16*24 = 384; stacked hi/lo = 768 rows), W = WSUB = 384, S = SUB = 128
    shapes = [(768, 384, 128), (384, 384, 128), (512, 512, 512)]
    rows = []
    for R, W, S in shapes:
        for in_dt, acc_dt, label in ((jnp.bfloat16, jnp.float32, "bf16"),
                                     (jnp.int8, jnp.int32, "int8"),
                                     (jnp.float32, jnp.float32, "f32")):
            try:
                dt, tops = time_dots(R, W, S, in_dt, acc_dt,
                                     n_inner=args.inner, n_grid=args.grid,
                                     interpret=args.interpret)
                rows.append((R, W, S, label, dt * 1e3, tops))
                print(f"({R:4d},{W:4d},{S:4d}) {label:5s}: "
                      f"{dt * 1e3:8.2f} ms  {tops:6.2f} TOP/s",
                      flush=True)
            except Exception as e:
                rows.append((R, W, S, label, None, None))
                print(f"({R:4d},{W:4d},{S:4d}) {label:5s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    by = {}
    for R, W, S, label, dt, tops in rows:
        by.setdefault((R, W, S), {})[label] = tops
    for k, v in by.items():
        if v.get("int8") and v.get("bf16"):
            print(f"{k}: int8/bf16 rate ratio = "
                  f"{v['int8'] / v['bf16']:.2f}x")


if __name__ == "__main__":
    main()
