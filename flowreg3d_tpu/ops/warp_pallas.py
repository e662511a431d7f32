"""Line-windowed Pallas warp: tricubic/trilinear sampling without gathers.

Behavioral parity target: ``scipy.ndimage.map_coordinates`` order 3/1 with
``mode='nearest'`` for clipped coordinates — the same contract as
``ops.warp.map_coordinates_cubic``/``_linear`` (reference semantics at
reference core/optical_flow_3d.py:22-74).

Why a kernel: the XLA formulation is bound by the gather unit at ~15-19 ns
per *index row* — 16.7M rows (one per output voxel) ≈ 300 ms at 512x512x64.
Motion-correction flows are smooth-ish, so the samples of a group of 8
output x-lines live inside a (Dzg, Dyg) band of (z, y) source rows, and
each single line's samples inside a smaller (Dzl, Dyl) sub-band. The
kernel exploits both:

- a 1-D grid over 8-line groups; per group ONE strided DMA fetches the
  hi/lo-bf16-split coefficient window (split precomputed in XLA so kernel
  slices carry no casts); window origins are data-dependent ->
  scalar-prefetched, double-buffered across programs;
- per line, a (Dzl, Dyl) sub-window is sliced from the group window at
  prefetched 8-aligned offsets — the matmul contracts only the rows that
  line can actually touch;
- the per-voxel x-tap gather is reformulated as MXU matmuls against
  one-hot-times-weight matrices (manual bf16x3, lo*lo dropped, ~1e-5);
  x contracts against a WSUB-wide 128-aligned subwindow per SUB outputs;
- the (z, y) tap selection factorizes into masked weight matrices applied
  as VPU multiply-reduce.

A cheap XLA pre-pass computes window origins and a validity flag (does
every group's AND line's sample band fit its windows?); ``lax.cond``
tiers through three geometries and finally the exact row-gather path, so
semantics never depend on flow smoothness.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# bf16 matmul passes for the hi/lo-split contraction: 3 = ~1e-5 relative
# error (default, scipy-parity), 2 = ~1.4e-3 but ~25% faster warp. Exposed
# because registration outputs tolerate 1e-3 for some downstream uses.
_PASSES = int(os.environ.get("FLOWREG3D_WARP_PASSES", "3"))
# stack the hi/lo F blocks into one matmul against the shared Ath operand
# (the hi/lo axis is the major dim of the VMEM window, so the stack is a
# free reshape): 2 matmul calls instead of 3 at the same row-work.
# Default on — measured 198.7 vs 206.6 ms on the canonical 512x512x64
# converged flow (v5e, 2026-08-17), outputs identical to 9e-8.
_STACKED = os.environ.get("FLOWREG3D_WARP_STACK", "1") == "1"
# int8 fixed-point contraction (the round-3 'only big known lever'):
# volume and tap-weight operands split into two 7-bit limbs each, three
# int8 limb products (F0A0, F1A0 stacked + F0A1) instead of three bf16
# passes — 1.5x the row-work at the int8 MXU's 2x rate, plus half the
# window-DMA bytes. Accuracy ~1e-4 of the volume max (vs ~1e-5 bf16x3,
# 1.4e-3 bf16x2). Proven on hardware 2026-08-20 (v5e, job_030/job_040):
# raw int8 dot rate 1.3-1.65x bf16 at the warp's contraction shapes (the
# nominal 2x does not materialize), full-warp A/B 200.9 -> 174.8 ms
# (1.15x) at max abs err 5.0e-5 vs bf16x3 — adopted as the DEFAULT.
# FLOWREG3D_WARP_INT8=0 restores the bf16x3 path. Read at TRACE time
# (not import) so A/B runs can toggle it inside one process/device claim.


def _int8_mode():
    return os.environ.get("FLOWREG3D_WARP_INT8", "1") == "1"

from flowreg3d_tpu.ops.warp import _bspline_weights, bspline_prefilter

_LPG = 8   # output x-lines per grid program (one z, 8 consecutive y)
# geometries (Dzg, Dyg, Dzl, Dyl): group DMA window (Dzg, Dyg) and the
# per-(line, x-chunk) compute sub-window (Dzl, Dyl). Dz* cover the z-base
# span plus n_taps; Dy* the output rows + y-base deviation + 8-aligned
# origin slack. Matmul cost scales with Dzl*Dyl and the sub-windows are
# CHUNK-local (one origin per 128-wide output chunk): measured on the
# canonical bench flow, ~98% of chunks fit (16, 24) while the worst chunk
# spans ~20 z-rows — so tier selection is NOT all-or-nothing: a chunk
# whose span misses (Dzl, Dyl) falls back IN-KERNEL to contracting the
# full (Dzg, Dyg) group window (compiled once per tier, taken by ~2% of
# chunks), and the lax.cond tier gate depends only on the group windows
# fitting. Three tiers: smooth flows (cheap DMA envelope), rough solver
# flows (wide group envelope, small common-case compute window), and a
# max-envelope tier for boundary-heavy flows — measured on the canonical
# bench stream, 4 of 10 chained steps carry group z-spans of 29-35 /
# y-spans to 52 (synthetic roll wraps content at the volume edges), which
# bust (28, 48) and used to pay the ~100 ms/step row-gather fallback.
# (40, 56) double-buffered is ~11.5 MB of the ~16 MB VMEM.
_GEOMS = (
    (8, 24, 8, 16),
    (28, 48, 16, 24),
    (40, 56, 16, 24),
)
_env_g2 = os.environ.get("FLOWREG3D_WARP_GEOM2")
if _env_g2:
    _GEOMS = (_GEOMS[0], tuple(int(x) for x in _env_g2.split(",")))
# x-subwindows: each SUB-sized output chunk contracts against a WSUB-wide
# 128-aligned window instead of the full row. Worst-case slack for flow
# deviation is WSUB - SUB - n_taps - 127 (alignment) ~= 125 voxels.
_SUB = int(os.environ.get("FLOWREG3D_WARP_SUB", "128"))
_WSUB = _SUB + 256
# VMEM guard: At is (Xp, S) f32 per line-sub; group window is bf16 hi+lo
_MAX_X = 1280
# minimum volume (voxels) for the windowed kernel to beat the XLA
# row-gather. Lowered from 2^21 in round 5: at level-5 pyramid geometry
# (21x168x168 = 593k voxels) the windowed kernel is faster (canonical
# pyramid 52.3 -> 49.1 ms, BENCH_JOBS job_254) and matches the
# row-gather to 5.1e-5 (job_258).
_MIN_VOX = int(os.environ.get("FLOWREG3D_WARP_MIN_VOX", "400000"))
# trace-scoped floor: min_level<4 pyramid programs raise the threshold
# back to 2^21 — adding windowed-warp custom calls at mid-pyramid levels
# re-triggers the XLA fusion-pass SIGABRT that the median gate works
# around (BENCH_JOBS job_264 vs job_256)
_MIN_VOX_FLOOR = 0


def min_vox_floor(value):
    """Set the trace-scoped windowed-warp voxel floor; returns the old."""
    global _MIN_VOX_FLOOR
    old = _MIN_VOX_FLOOR
    _MIN_VOX_FLOOR = value
    return old


def _w_taps(f, order):
    """Per-tap weight vectors for fraction f: cubic B-spline or linear."""
    if order == 3:
        return _bspline_weights(f)
    return (1.0 - f, f)


def _kernel(L8, Dzg, Dyg, Dzl, Dyl, n_taps, order, nsub, int8, win_ref,
            cext_ref, lz_ref, ly_ref, x0_ref, fz_ref, fy_ref, fx_ref,
            out_ref, fwin, sem):
    g = pl.program_id(0)
    Xp = cext_ref.shape[3]
    Xb = out_ref.shape[2]

    def get_dma(slot, grp):
        wz = win_ref[0, grp]
        # 8-aligned offsets are stored divided by 8 so Mosaic can prove
        # the sublane-tile alignment
        wy = win_ref[1, grp] * 8
        return pltpu.make_async_copy(
            cext_ref.at[:, pl.ds(wz, Dzg), pl.ds(wy, Dyg)], fwin.at[slot],
            sem.at[slot])

    @pl.when(g == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(g + 1 < L8)
    def _():
        get_dma((g + 1) % 2, g + 1).start()

    get_dma(g % 2, g).wait()

    def wmat(nrows, ncols, base, weights):
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, ncols), 0)
        acc = jnp.zeros((nrows, ncols), jnp.float32)
        for t, wt in enumerate(weights):
            acc = acc + jnp.where(rows == base + t, wt, 0.0)
        return acc

    def wmat8(nrows, ncols, base, weights):
        """Two int8 fixed-point limb matrices: At*127 ~= A0 + A1/256."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, ncols), 0)
        a0 = jnp.zeros((nrows, ncols), jnp.float32)
        a1 = jnp.zeros((nrows, ncols), jnp.float32)
        for t, wt in enumerate(weights):
            p = wt * 127.0
            p0 = jnp.round(p)
            p1 = jnp.clip(jnp.round((p - p0) * 256.0), -127.0, 127.0)
            sel = rows == base + t
            a0 = a0 + jnp.where(sel, p0, 0.0)
            a1 = a1 + jnp.where(sel, p1, 0.0)
        return a0.astype(jnp.int8), a1.astype(jnp.int8)

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def split(a):
        # manual bf16x3: Mosaic's DEFAULT f32 dot is a single bf16 pass
        # (~1e-2 abs error) and HIGHEST (6 passes) triples the kernel
        # time; hi/lo splitting with lo*lo dropped gives ~1e-5 at 3 passes
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    slot = g % 2
    for i in range(_LPG):
        for s in range(nsub):
            # (valid, dzo, dyo/8) packed into one scalar: separate
            # per-(line, chunk) rows at full L8 grids would exceed the 1MB
            # SMEM scalar-prefetch budget (observed: 70 rows x 4096 groups)
            pk = win_ref[2 + nsub + i * nsub + s, g]
            vbit = pk // 512
            rest = pk - vbit * 512
            dzo = rest // 16
            dyo = (rest - dzo * 16) * 8
            if nsub == 1:
                W = Xp
                c0, S = 0, Xb
                wx = 0
            else:
                W, S = _WSUB, _SUB
                c0 = s * S
                wx = win_ref[2 + s, g] * 128

            x0 = x0_ref[0, i, c0:c0 + S].reshape(1, S) - wx
            lz = lz_ref[0, i, c0:c0 + S].reshape(1, S)
            ly = ly_ref[0, i, c0:c0 + S].reshape(1, S)
            wxs = _w_taps(fx_ref[0, i, c0:c0 + S].reshape(1, S), order)
            wys = _w_taps(fy_ref[0, i, c0:c0 + S].reshape(1, S), order)
            wzs = _w_taps(fz_ref[0, i, c0:c0 + S].reshape(1, S), order)

            if int8:
                A0, A1 = wmat8(W, S, x0, wxs)  # x-taps one-hot, 2 limbs

                def contract(Fb, Dz, Dy, WZt, WYt):
                    # Fb: (2, Dz, Dy, W) int8 limb window slice;
                    # F*At*127^2 ~= F0A0 + (F1A0 + F0A1)/256 (F1A1 dropped)
                    R = Dz * Dy
                    Gi = idot(Fb.reshape(2 * R, W), A0)
                    Gj = idot(Fb[0].reshape(R, W), A1)
                    G = (Gi[:R].astype(jnp.float32)
                         + (Gi[R:] + Gj).astype(jnp.float32)
                         * jnp.float32(1.0 / 256.0))
                    G = G.reshape(Dz, Dy, S)
                    t1 = (G * WYt[None, :, :]).sum(axis=1)   # (Dz, S)
                    return (t1 * WZt).sum(axis=0)            # (S,)
            else:
                At = wmat(W, S, x0, wxs)  # x-taps one-hot * weight
                Ath, Atl = split(At)

                def contract(Fb, Dz, Dy, WZt, WYt):
                    # Fb: (2, Dz, Dy, W) hi/lo window slice
                    R = Dz * Dy
                    if _STACKED and _PASSES >= 3:
                        A = bdot(Fb.reshape(2 * R, W), Ath)
                        G = A[:R] + A[R:] + bdot(Fb[0].reshape(R, W), Atl)
                    else:
                        Fh = Fb[0].reshape(R, W)
                        Fl = Fb[1].reshape(R, W)
                        if _PASSES >= 3:
                            G = bdot(Fh, Ath) + bdot(Fh, Atl) + bdot(Fl, Ath)
                        elif _PASSES == 2:
                            G = bdot(Fh, Ath) + bdot(Fh, Atl)
                        else:
                            G = bdot(Fh, Ath)
                    G = G.reshape(Dz, Dy, S)
                    t1 = (G * WYt[None, :, :]).sum(axis=1)   # (Dz, S)
                    return (t1 * WZt).sum(axis=0)            # (S,)

            def fsl(z0, Dz, y0, Dy):
                if nsub == 1:
                    return fwin[slot, :, pl.ds(z0, Dz), pl.ds(y0, Dy)]
                return fwin[slot, :, pl.ds(z0, Dz), pl.ds(y0, Dy),
                            pl.ds(wx, W)]

            # common case: this chunk's sample band fits the small
            # (Dzl, Dyl) sub-window at its prefetched origin
            @pl.when(vbit == 1)
            def _small():
                out_ref[0, i, c0:c0 + S] = contract(
                    fsl(dzo, Dzl, dyo, Dyl), Dzl, Dyl,
                    wmat(Dzl, S, lz, wzs), wmat(Dyl, S, ly, wys))

            # tail case (~2% of chunks on rough solver flows): contract
            # the full group window; lz/ly are chunk-origin-relative, so
            # re-offset them to the group origin
            @pl.when(vbit == 0)
            def _group():
                out_ref[0, i, c0:c0 + S] = contract(
                    fsl(0, Dzg, 0, Dyg), Dzg, Dyg,
                    wmat(Dzg, S, lz + dzo, wzs),
                    wmat(Dyg, S, ly + dyo, wys))


def _ceil_to(v, m):
    return -(-v // m) * m


def _windows_1d(i0g, n_taps, D, ext_size, align):
    """Per-group window origin + validity for one axis.

    i0g: (L8, LPG*X) int32 first-tap ext indices per group. Returns
    (w, valid) of shape (L8,): origin (clipped, ``align``-aligned) and
    whether the group's tap span [min, max + n_taps - 1] fits [w, w + D).
    """
    lo = i0g.min(axis=-1)
    hi = i0g.max(axis=-1)
    w = lo if align == 1 else (lo // align) * align
    w = jnp.clip(w, 0, max(ext_size - D, 0))
    valid = (hi + n_taps - 1 - w) <= (D - 1)
    return w, valid


def _line_windows(i0l, n_taps, Dg, Dl, wg, align):
    """Per-(line, x-chunk) sub-window origins inside the group window.

    i0l: (L8, LPG, nsub, S) int32 first-tap indices. Returns (o, valid) of
    shapes (L8, LPG, nsub): absolute origin (clipped into
    [wg, wg + Dg - Dl], ``align``-aligned) and whether the chunk's span
    fits [o, o + Dl).
    """
    lo = i0l.min(axis=-1)
    hi = i0l.max(axis=-1)
    o = lo if align == 1 else (lo // align) * align
    o = jnp.clip(o, wg[:, None, None], wg[:, None, None] + (Dg - Dl))
    valid = (hi + n_taps - 1 - o) <= (Dl - 1)
    return o, valid


def map_coordinates_windowed(vol, coord_z, coord_y, coord_x, order=3,
                             interpret=False):
    """Sample ``vol`` (Z,Y,X) at clipped coordinate grids, order 3 or 1.

    Same semantics as ``map_coordinates_cubic``/``_linear`` (scipy
    order-3/1, mode='nearest' for in-range coordinates). Tiers through
    the Pallas window geometries (cheapest that fits the flow's sample
    bands), then the row-gather path. Requires Y % 8 == 0 (gate via
    ``windowed_ok``).
    """
    from flowreg3d_tpu.ops import warp as _warp

    Z, Y, X = vol.shape
    out_shape = coord_z.shape
    n_taps = 4 if order == 3 else 2

    if order == 3:
        c = bspline_prefilter(vol)           # (Z+3, Y+3, X+3), tap i at i+1
    else:
        c = jnp.pad(vol, ((0, 1), (0, 1), (0, 1)), mode="edge")

    Ze, Ye, Xe = c.shape
    Yp = _ceil_to(Ye, 8)
    Xp = _ceil_to(Xe, 128)
    Xb = _ceil_to(X, 128)
    cext = jnp.pad(c, ((0, 0), (0, Yp - Ye), (0, Xp - Xe)))
    int8 = _int8_mode()
    if int8:
        # two int8 fixed-point limbs: c*(127/s) ~= F0 + F1/256 with
        # s = max|c|; the matching 1/127 of the tap-weight quantization
        # is undone by one post-scale on the kernel output
        c_scale = jnp.maximum(jnp.max(jnp.abs(cext)), 1e-30)
        q = cext * (127.0 / c_scale)
        f0 = jnp.round(q)
        f1 = jnp.clip(jnp.round((q - f0) * 256.0), -127.0, 127.0)
        cext2 = jnp.stack([f0, f1]).astype(jnp.int8)   # (2, Ze, Yp, Xp)
        out_scale = c_scale * (1.0 / (127.0 * 127.0))
        win_dtype = jnp.int8
    else:
        # hi/lo bf16 split hoisted to XLA: kernel window slices carry no
        # casts. reduce_precision (not a convert pair) is immune to XLA's
        # --xla_allow_excess_precision rewrite, which would elide
        # f32(bf16(x)) and silently zero the lo correction term.
        hi_f32 = jax.lax.reduce_precision(cext, exponent_bits=8,
                                          mantissa_bits=7)
        c_hi = hi_f32.astype(jnp.bfloat16)
        c_lo = (cext - hi_f32).astype(jnp.bfloat16)
        cext2 = jnp.stack([c_hi, c_lo])          # (2, Ze, Yp, Xp)
        out_scale = None
        win_dtype = jnp.bfloat16

    z0 = jnp.floor(coord_z)
    y0 = jnp.floor(coord_y)
    x0 = jnp.floor(coord_x)
    if order == 1:
        z0 = jnp.clip(z0, 0, Z - 1)
        y0 = jnp.clip(y0, 0, Y - 1)
        x0 = jnp.clip(x0, 0, X - 1)
    fz = (coord_z - z0).astype(jnp.float32)
    fy = (coord_y - y0).astype(jnp.float32)
    fx = (coord_x - x0).astype(jnp.float32)
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    L8 = (Z * Y) // _LPG
    zg = z0.reshape(L8, _LPG * X)
    yg = y0.reshape(L8, _LPG * X)

    # x-subwindows: each _SUB output chunk contracts against a _WSUB-wide
    # 128-aligned slice of the row instead of all Xp lanes
    nsub = 1
    vx_all = jnp.bool_(True)
    wx_rows = []
    if X % _SUB == 0 and X // _SUB > 1 and Xp >= _WSUB:
        nsub = X // _SUB
        xs = x0.reshape(L8, _LPG, nsub, _SUB)
        lo = xs.min(axis=(1, 3))
        hi = xs.max(axis=(1, 3))
        wx = jnp.clip((lo // 128) * 128, 0, Xp - _WSUB)     # (L8, nsub)
        vx_all = jnp.all((hi + n_taps - 1 - wx) <= (_WSUB - 1))
        wx_rows = [wx[:, s] // 128 for s in range(nsub)]
    else:
        wx_rows = [jnp.zeros((L8,), jnp.int32)] * nsub

    # chunk-local (z, y) windows: one origin per (line, x-chunk), so the
    # compute matmul contracts only the rows that chunk's samples can touch
    Sc = X // nsub
    zl = z0.reshape(L8, _LPG, nsub, Sc)
    yl = y0.reshape(L8, _LPG, nsub, Sc)

    padx = Xb - X

    def padb(a):
        a = a.reshape(L8, _LPG, X)
        return jnp.pad(a, ((0, 0), (0, 0), (0, padx))) if padx else a

    geoms = []
    seen = set()
    for gz, gy, lz_, ly_ in _GEOMS:
        geom = (min(gz, Ze), min(gy, Yp), min(lz_, min(gz, Ze)),
                min(ly_, min(gy, Yp)))
        # every lax.cond tier compiles: drop geometries whose double-
        # buffered hi/lo window would blow VMEM at this Xp (wide-X volumes
        # keep the smaller tiers; windowed_ok guarantees at least tier 2
        # fits). 12.5 MiB leaves ~3.5 MiB for At/G/weight temporaries.
        # int8 limbs halve the per-element window cost.
        elem_bytes = 1 if int8 else 2
        if 2 * 2 * geom[0] * geom[1] * Xp * elem_bytes > int(12.5 * 2 ** 20):
            continue
        if geom not in seen:
            seen.add(geom)
            geoms.append(geom)

    def make_pallas_branch(Dzg, Dyg, Dzl, Dyl):
        wz, vzg = _windows_1d(zg, n_taps, Dzg, Ze, 1)
        wy, vyg = _windows_1d(yg, n_taps, Dyg, Yp, 8)
        oz, vzl = _line_windows(zl, n_taps, Dzg, Dzl, wz, 1)
        oy, vyl = _line_windows(yl, n_taps, Dyg, Dyl, wy, 8)
        # the lax.cond tier gate depends on the GROUP windows only; chunks
        # whose spans miss the small sub-window take the in-kernel group-
        # window path via the per-chunk validity bit
        valid = (jnp.all(vzg & vyg) & vx_all)
        lz = padb((zl - oz[..., None]).reshape(L8, _LPG, X))
        ly = padb((yl - oy[..., None]).reshape(L8, _LPG, X))
        dzo = (oz - wz[:, None, None]).reshape(L8, _LPG * nsub)
        dyo8 = ((oy - wy[:, None, None]) // 8).reshape(L8, _LPG * nsub)
        vbit = (vzl & vyl).reshape(L8, _LPG * nsub)
        # pack (valid, dzo, dyo/8) into one scalar per (line, chunk):
        # dzo*16 + dyo/8 <= (Dzg-Dzl)*16 + (Dyg-Dyl)/8 < 512 for every
        # geometry (asserted below)
        assert (Dzg - Dzl) * 16 + (Dyg - Dyl) // 8 < 512
        pk = vbit.astype(jnp.int32) * 512 + dzo * 16 + dyo8
        win = jnp.stack(
            [wz, wy // 8] + wx_rows
            + [pk[:, k] for k in range(_LPG * nsub)]
        ).astype(jnp.int32)

        def branch():
            kern = functools.partial(_kernel, L8, Dzg, Dyg, Dzl, Dyl,
                                     n_taps, order, nsub, int8)
            line_spec = pl.BlockSpec((1, _LPG, Xb),
                                     lambda g, *_: (g, 0, 0))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(L8,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
                + [line_spec] * 6,
                out_specs=line_spec,
                scratch_shapes=[
                    pltpu.VMEM((2, 2, Dzg, Dyg, Xp), win_dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((L8, _LPG, Xb), jnp.float32),
                interpret=interpret,
            )(win, cext2, lz, ly, padb(x0), padb(fz), padb(fy), padb(fx))
            if out_scale is not None:
                out = out * out_scale
            return out[:, :, :X].reshape(Z, Y, X)

        return valid, branch

    def fallback_branch():
        fzf, fyf, fxf = (a.reshape(-1) for a in (fz, fy, fx))
        lin = ((z0 * Y + y0) * X + x0).reshape(-1)
        if order == 3:
            taps = _warp._stacked_taps(c, (4, 4, 4), (Z, Y, X))
            wfn = (_warp._w4, _warp._w4, _warp._w4)
            counts = (4, 4, 4)
        else:
            taps = _warp._stacked_taps(c, (2, 2, 2), (Z, Y, X))
            wfn = (_warp._w2, _warp._w2, _warp._w2)
            counts = (2, 2, 2)
        out = _warp._row_gather_interp(taps, lin, (fzf, fyf, fxf), wfn,
                                       counts)
        return out.reshape(Z, Y, X)

    # tiered dispatch: cheapest window geometry that fits, else row-gather
    out_fn = fallback_branch
    for Dzg, Dyg, Dzl, Dyl in reversed(geoms):
        valid, branch = make_pallas_branch(Dzg, Dyg, Dzl, Dyl)
        out_fn = functools.partial(jax.lax.cond, valid, branch, out_fn)
    out = out_fn()
    return out.reshape(out_shape).astype(vol.dtype)


def windowed_ok(shape, order=3):
    """Static gate: is the line-window kernel worth it / supported here?"""
    Z, Y, X = shape
    if X + 3 > _MAX_X:
        return False
    if Y % _LPG != 0:
        return False
    if Z * Y * X < max(_MIN_VOX, _MIN_VOX_FLOOR):
        return False
    # scalar-prefetch budget: the per-(line, chunk) window table is
    # (2 + 9*nsub) rows x L8 groups of int32 and must fit SMEM (~1 MB;
    # observed failing at 70 rows x 4096 groups)
    Xp = _ceil_to(X + 3, 128)
    nsub = X // _SUB if (X % _SUB == 0 and X // _SUB > 1
                         and Xp >= _WSUB) else 1
    if (2 + 9 * nsub) * ((Z * Y) // _LPG) * 4 > 800_000:
        return False
    from flowreg3d_tpu.core.solver import pallas_enabled

    return pallas_enabled()
