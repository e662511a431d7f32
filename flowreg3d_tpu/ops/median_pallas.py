"""Pallas 5x5x5 median filter: in-register selection network.

The XLA median (ops.filters.median_filter_5x5x5) materializes a 125-tap
patch stack and sorts it — the sort costs ~40 ms at level-solver sizes
(bench: ~78 ms of every volume). This kernel keeps the 125 taps as
registers per (z-plane, y-tile) program and runs a Batcher odd-even
mergesort network PRUNED to the cone of the median output (rank 62 of
125): ~1.9k static min/max pairs, no gathers, no materialized patches.

Boundary semantics match the XLA path exactly: the caller-side 'reflect'
pad is done in XLA; taps are built in-kernel by lane rolls / sublane
slices of the padded window.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: one (8, 128) output vreg per program keeps all 125 tap
# arrays register-resident through the selection network (larger tiles
# spill to VMEM and run ~10x slower)
_TY = 8
_TX = 128


def _oddeven_merge_sort_pairs(n):
    """Batcher odd-even mergesort compare-exchange pairs for power-of-2 n."""
    pairs = []

    def merge(lo, cnt, r):
        step = r * 2
        if step < cnt:
            merge(lo, cnt, step)
            merge(lo + r, cnt, step)
            for i in range(lo + r, lo + cnt - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, cnt):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, cnt, 1)

    sort(0, n)
    return pairs


@functools.lru_cache(maxsize=4)
def _median_network(n, out_rank):
    """CE pairs pruned to the dependency cone of ``out_rank``."""
    pairs = _oddeven_merge_sort_pairs(n)
    needed = {out_rank}
    kept = []
    for i, j in reversed(pairs):
        if i in needed or j in needed:
            kept.append((i, j))
            needed.add(i)
            needed.add(j)
    kept.reverse()
    return tuple(kept)


def _median_of_window(win):
    """(5, _TY+8, 2*_TX) loaded window -> (_TY, _TX) of 5^3 medians.

    Shared by the single and batched kernels: 125 tap tiles built by
    sublane slices + lane rolls, reduced by the pruned Batcher network.
    """
    Xw = 2 * _TX
    taps = []
    for a in range(5):
        plane = win[a]                      # (_TY + 8, Xw)
        for b in range(5):
            rows = plane[b:b + _TY]
            for c in range(5):
                rolled = pltpu.roll(rows, (Xw - c) % Xw, 1) if c else rows
                taps.append(rolled[:, :_TX])
    big = jnp.full((_TY, _TX), jnp.inf, taps[0].dtype)
    taps += [big, big, big]                 # pad 125 -> 128

    for i, j in _median_network(128, 62):
        lo = jnp.minimum(taps[i], taps[j])
        hi = jnp.maximum(taps[i], taps[j])
        taps[i] = lo
        taps[j] = hi

    return taps[62]


def _kernel(x_ref, o_ref, win, sem):
    z = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(z, 5), pl.ds(ty * _TY, _TY + 8),
                 pl.ds(tx * _TX, 2 * _TX)], win, sem)
    dma.start()
    dma.wait()
    o_ref[0] = _median_of_window(win)


def _kernel_batched(x_ref, o_ref, win, sem):
    b = pl.program_id(0)
    z = pl.program_id(1)
    ty = pl.program_id(2)
    tx = pl.program_id(3)

    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(z, 5), pl.ds(ty * _TY, _TY + 8),
                 pl.ds(tx * _TX, 2 * _TX)], win, sem)
    dma.start()
    dma.wait()
    o_ref[0, 0] = _median_of_window(win)


def median_filter_5x5x5_pallas_batched(x, interpret=False):
    """Exact 5^3 median of a (B,Z,Y,X) stack in ONE pallas_call.

    Used by the pyramid to filter the du/dv/dw increments together
    (B=3): one kernel launch + one padded operand instead of three,
    shaving the per-call fixed costs that dominate the coarse levels.
    Boundary 'reflect' per component (the batch axis is not reflected).
    """
    x = jnp.asarray(x)
    B, Z, Y, X = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (2, 2)), mode="reflect")
    n_ty = -(-Y // _TY)
    n_tx = -(-X // _TX)
    Yp = n_ty * _TY + 8
    Xp = n_tx * _TX + _TX
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Yp - (Y + 4)),
                      (0, Xp - (X + 4))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Z, n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1, _TY, _TX),
                               lambda b, z, t, u: (b, z, t, u)),
        scratch_shapes=[
            pltpu.VMEM((5, _TY + 8, 2 * _TX), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel_batched,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Z, n_ty * _TY, n_tx * _TX),
                                       x.dtype),
        interpret=interpret,
    )(xp)
    return out[:, :, :Y, :X]


def median_filter_5x5x5_pallas(x, interpret=False):
    """Exact 5^3 median, boundary 'reflect' — Pallas selection network.

    Also the TPU-correct path: the XLA variant's patch extraction runs
    through a conv that TPUs execute in bf16, silently rounding the taps
    (~2e-3 error); this kernel is bit-exact vs scipy.ndimage.median_filter.
    """
    x = jnp.asarray(x)
    Z, Y, X = x.shape
    xp = jnp.pad(x, 2, mode="reflect")      # (Z+4, Y+4, X+4)
    n_ty = -(-Y // _TY)
    n_tx = -(-X // _TX)
    Yp = n_ty * _TY + 8                     # window rows + tap slack
    Xp = n_tx * _TX + _TX                   # window lanes + tap slack
    xp = jnp.pad(xp, ((0, 0), (0, Yp - (Y + 4)), (0, Xp - (X + 4))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Z, n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, _TY, _TX), lambda z, t, u: (z, t, u)),
        scratch_shapes=[
            pltpu.VMEM((5, _TY + 8, 2 * _TX), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Z, n_ty * _TY, n_tx * _TX), x.dtype),
        interpret=interpret,
    )(xp)
    return out[:, :Y, :X]
