"""Fused patch expansion + hypercolumn-normalise + scale Pallas kernel.

The superblock patch gather (ops/patch_gather.py) runs in three XLA
stages per pyramid level: a row take (efficient DMA gather), the
one-hot MXU window expansion, and the ``* inv_norm`` scaling multiply
feeding the regressor (models/patch2pix.py ``scaled``). Between those
stages XLA materialises every intermediate in HBM: ~5 passes over
hundreds of MB per stage call at eval scale (BASELINE.md per-op trace:
reshapes 6.9 + converts 5.9 + one-hot dots 6.1 + pads 3.4 ms/iter at
change_stride).

This kernel consumes the superblock rows for BOTH images of a pair
(the row take is the only genuinely scattered access, left to XLA's
gather machinery) and performs everything downstream — window
selection for both sides, the per-side cross-level square-sums,
``rsqrt`` and the scaling multiplies — inside VMEM, writing only the
final scaled patches to HBM.

Mosaic-compatibility findings that shaped the formulation (all
verified on a real v5e chip; see tools/try_expand_kernels.py):

  * interleaving ``transpose+reshape`` inside the kernel is an
    "unsupported shape cast" — rows arrive PRE-INTERLEAVED from XLA
    as ``(M, 2t, 2t*2C)`` with the two sides' channels PAIRED per
    window column (one fused XLA transpose+concat pass, which also
    replaces the old separate per-side one-hot pipelines);
  * lane-broadcasting a bf16 value derived from int32 compares
    crashes the compiler — all selection masks and elementwise scale
    math run in f32 (exactness is unaffected, see below);
  * lane reshapes/slices must hit 128-lane granularity — levels with
    2C == 128 (C=64) expand per side over the FULL paired lanes and
    zero the other side with a constant half-mask (two extra cheap MXU
    passes, output lands channel-paired for free); levels with
    C % 128 == 0 slice the paired minor per side (128-aligned) and
    write separate per-side outputs;
  * any other channel width (the C=3 image level) stays in XLA; its
    per-side square-sums enter the kernel as inputs (keeping the f32
    accumulation ORDER of the unfused path), and the kernel returns
    the final ``inv`` so XLA applies the identical scale.

Exactness: the selection matmuls are one-hot value pass-throughs (a
single 1.0 per row; operand-dtype values carried unrounded through
the f32 accumulator); square-sums accumulate f32 in pyramid order,
matching ``_levels_inv_norm``; the final multiply computes
``e * inv`` as an f32 product of the bf16-rounded operands — bit
identical to the bf16 multiply of the unfused path because an exact
product of two bf16 values fits f32 and rounds once either way.

Differentiable via custom VJP: the backward replays the math through
the XLA reference implementation (:func:`expand_scale_pair_xla`), so
training gradients are exactly the existing path's.

No reference counterpart: /root/reference/networks/utils.py:4-36 runs
~1000 scattered single-pixel gathers per proposal on GPU.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6  # l2_normalize / _levels_inv_norm epsilon

# proposals per grid step: all levels' rows + f32 dot intermediates +
# bf16 expanded terms for both sides must fit VMEM with double-buffered
# in/out blocks (~1 MB per proposal at feat_idx (0,1,2,3), psize 16);
# P2P_EXPAND_BLOCK overrides for experiments
BLOCK_N = int(os.environ.get("P2P_EXPAND_BLOCK", "8"))

# per-level kernel strategies
_XLA = 0        # channel width unsupported in-kernel; XLA side-channel
_DUALPASS = 1   # 2C == 128: full-width dots + constant half-mask
_SLICED = 2     # C % 128 == 0: per-side 128-aligned lane slices


def _mode(c: int) -> int:
    if 2 * c == 128:
        return _DUALPASS
    if c % 128 == 0:
        return _SLICED
    return _XLA


def _window_indices(base: jax.Array, psize: int, ds: int) -> jax.Array:
    """Within-superblock window indices for PADDED corners ``base``
    (..., 1) -> (..., psize) in [0, 2t); mirrors _superblock_rows."""
    t = psize // ds
    d = jax.lax.broadcasted_iota(jnp.int32, (1, psize), 1)
    return (base + d) // ds - (base // psize) * t


def _onehot(idx: jax.Array, n: int, dt) -> jax.Array:
    """(P, psize) indices -> (P, psize, n) one-hot selection rows.
    Built f32-first: Mosaic crashes on lane-broadcast bf16 compares."""
    oh = (idx[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
          ).astype(jnp.float32)
    return oh if dt == jnp.float32 else oh.astype(dt)


def _select(r4: jax.Array, sy: jax.Array, sx: jax.Array) -> jax.Array:
    """(P, 2t, 2t, C') paired rows -> (P, psize, psize, C') window
    values (f32) via the two one-hot contractions (X then Y; both 4D
    rhs dots compile where reshapes would not)."""
    xw = jax.lax.dot_general(
        sx, r4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(r4.dtype)  # (P, q, 2t_y, C')
    return jax.lax.dot_general(
        sy, xw, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # f32 (P, p, q, C') -- batch, lhs-free p, rhs-free (q, C')


def _scale(e: jax.Array, inv_od: jax.Array, out_dtype) -> jax.Array:
    """``e * inv`` exactly as the unfused path's out_dtype multiply:
    f32 product of the rounded operands, rounded once."""
    return (e.astype(jnp.float32) * inv_od.astype(jnp.float32)[..., None]
            ).astype(out_dtype)


def _kernel(levels, n_xla, psize, out_dtype, *refs):
    """levels: tuple of (t, c, mode!=_XLA) in pyramid ORDER with the
    _XLA entries replaced by None placeholders (their sq refs come
    first among the inputs, in the same order)."""
    y1_ref, x1_ref, y2_ref, x2_ref = refs[:4]
    sq_refs = refs[4:4 + 2 * n_xla]
    n_k = sum(1 for lv in levels if lv is not None)
    row_refs = refs[4 + 2 * n_xla: 4 + 2 * n_xla + n_k]
    out_start = 4 + 2 * n_xla + n_k
    inv1_ref, inv2_ref = refs[out_start], refs[out_start + 1]
    out_refs = refs[out_start + 2:]

    p_n = y1_ref.shape[0]
    corners = ((y1_ref[:], x1_ref[:]), (y2_ref[:], x2_ref[:]))

    # expand every kernel level for both sides (terms kept in the
    # operand dtype: one-hot selection is a lossless pass-through)
    terms = []  # per kernel level: (mode, c, per-side term)
    ki = 0
    for lv in levels:
        if lv is None:
            continue
        t, c, mode = lv
        ds = psize // t
        r = row_refs[ki][:]
        ki += 1
        cp = 2 * c
        r4 = r.reshape(p_n, 2 * t, 2 * t, cp)
        dt = r4.dtype
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, cp), 3)
        sides = []
        for side, (yb, xb) in enumerate(corners):
            sy = _onehot(_window_indices(yb, psize, ds), 2 * t, dt)
            sx = _onehot(_window_indices(xb, psize, ds), 2 * t, dt)
            if mode == _DUALPASS:
                e = _select(r4, sy, sx)
                hm = ((lane // c) == side).astype(jnp.float32)
                sides.append((e * hm).astype(dt))
            else:  # _SLICED: 128-aligned per-side lanes
                rs = r4[..., side * c:(side + 1) * c]
                sides.append(_select(rs, sy, sx).astype(dt))
        terms.append((mode, c, sides))

    # per-side square-sums in pyramid order (XLA levels contribute via
    # their precomputed sq inputs, preserving the f32 add order of
    # _levels_inv_norm), then inv
    for side in range(2):
        sq = None
        xi = 0
        ki = 0
        for lv in levels:
            if lv is None:
                s = sq_refs[2 * xi + side][:]
                xi += 1
            else:
                mode, c, sides = terms[ki]
                ki += 1
                # dual-pass terms are already zero on the other half,
                # so the full-lane reduce is the per-side sum
                s = jnp.sum(jnp.square(sides[side].astype(jnp.float32)),
                            axis=-1)
            sq = s if sq is None else sq + s
        inv = jax.lax.rsqrt(sq + EPS)
        (inv1_ref, inv2_ref)[side][:] = inv
        # round once to out_dtype as the unfused path does, upcast for
        # the (bit-identical) f32 multiply
        inv_od = inv if out_dtype == jnp.float32 else (
            inv.astype(out_dtype))
        for mode, c, sides in terms:
            sides[side] = _scale(sides[side], inv_od, out_dtype)

    oi = 0
    for mode, c, sides in terms:
        if mode == _DUALPASS:
            out_refs[oi][:] = sides[0] + sides[1]  # channel-paired
            oi += 1
        else:
            out_refs[oi][:] = sides[0]
            out_refs[oi + 1][:] = sides[1]
            oi += 2


def _interleave_pair(r1: jax.Array, r2: jax.Array, t: int, c: int
                     ) -> jax.Array:
    """Two (M, 4, t, t*C) superblock-row stacks -> (M, 2t, 2t*2C)
    paired interleaved rows (lanes: wx-column major, then [side1 C |
    side2 C]). One fused XLA transpose+concat pass."""
    m = r1.shape[0]

    def il(r):
        r6 = r.reshape(m, 2, 2, t, t, c)
        return r6.transpose(0, 1, 3, 2, 4, 5).reshape(m, 2 * t, 2 * t, c)

    return jnp.concatenate([il(r1), il(r2)], axis=-1).reshape(
        m, 2 * t, 2 * t * 2 * c)


def _xla_expand_side(rows, y0, x0, psize: int, t: int, c: int):
    """One level's one-hot expansion in XLA (HIGHEST-precision value
    pass-through; the fallback/reference formulation)."""
    m = rows.shape[0]
    ds = psize // t
    iy = _window_indices(y0[:, None], psize, ds)
    ix = _window_indices(x0[:, None], psize, ds)
    r = rows.reshape(m, 2, 2, t, t * c).transpose(0, 1, 3, 2, 4).reshape(
        m, 2 * t, 2 * t * c)
    sy = (iy[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * t), 2)
          ).astype(rows.dtype)
    yw = jax.lax.dot_general(
        sy, r, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(rows.dtype)
    ywr = yw.reshape(m, psize, 2 * t, c)
    sx = (ix[:, :, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * t), 2)
          ).astype(rows.dtype)
    out = jax.lax.dot_general(
        sx, ywr, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(rows.dtype)
    return out.transpose(0, 2, 1, 3)  # (M, p, q, C)


def output_slice_map(ds_list: Sequence[int], cs: Sequence[int],
                     psize: int) -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """Regressor kernel-channel slices for each output of
    :func:`expand_scale_pair`, in output order. The regressor's cin
    layout is [side-1 levels | side-2 levels]; a paired output covers
    both sides' slices of its level, per-side outputs one each."""
    d = sum(cs)
    offs = []
    o = 0
    for c in cs:
        offs.append(o)
        o += c
    out = []
    for c, off in zip(cs, offs):
        if _mode(c) == _DUALPASS:
            out.append(((off, c), (d + off, c)))
        else:  # _SLICED and _XLA levels emit per-side outputs
            out.append(((off, c),))
            out.append(((d + off, c),))
    return tuple(out)


def expand_scale_pair_xla(
    rows1: Sequence[jax.Array],
    rows2: Sequence[jax.Array],
    y1: jax.Array,
    x1: jax.Array,
    y2: jax.Array,
    x2: jax.Array,
    psize: int,
    ds_list: Sequence[int],
    out_dtype,
) -> Tuple[jax.Array, ...]:
    """Reference XLA implementation of the kernel's math (also the
    custom-VJP backward path). rows*: per-level (M, 4, t_l, t_l*C_l)
    superblock rows; y*/x*: (M,) padded patch corners. Output
    structure matches the kernel's (see :func:`output_slice_map`)."""
    ts = tuple(r.shape[2] for r in rows1)
    cs = tuple(r.shape[3] // r.shape[2] for r in rows1)
    sides = []
    for rows, y0, x0 in ((rows1, y1, x1), (rows2, y2, x2)):
        es = [
            _xla_expand_side(r, y0, x0, psize, t, c)
            for r, t, c in zip(rows, ts, cs)
        ]
        sq = None
        for e in es:
            s = jnp.sum(jnp.square(e.astype(jnp.float32)), axis=-1)
            sq = s if sq is None else sq + s
        inv = jax.lax.rsqrt(sq + EPS).astype(out_dtype)[..., None]
        sides.append([e.astype(out_dtype) * inv for e in es])
    outs = []
    for li, c in enumerate(cs):
        if _mode(c) == _DUALPASS:
            outs.append(jnp.concatenate(
                [sides[0][li], sides[1][li]], axis=-1))
        else:
            outs.append(sides[0][li])
            outs.append(sides[1][li])
    return tuple(outs)


def _pallas_impl(rows1, rows2, y1, x1, y2, x2, psize, ds_list,
                 out_dtype, block_n=BLOCK_N, interpret=False):
    m = y1.shape[0]
    ts = tuple(r.shape[2] for r in rows1)
    cs = tuple(r.shape[3] // r.shape[2] for r in rows1)
    modes = tuple(_mode(c) for c in cs)
    if all(mo == _XLA for mo in modes):
        return expand_scale_pair_xla(rows1, rows2, y1, x1, y2, x2,
                                     psize, ds_list, out_dtype)

    pad = (-m) % block_n
    mp = m + pad

    def padm(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) \
            if pad else a

    y1p, x1p, y2p, x2p = (padm(v)[:, None] for v in (y1, x1, y2, x2))

    # XLA levels: expand both sides now; their sq's feed the kernel
    xla_es = {}   # li -> (e1, e2) operand-dtype expansions
    sq_ins = []
    for li, (t, c, mo) in enumerate(zip(ts, cs, modes)):
        if mo != _XLA:
            continue
        e1 = _xla_expand_side(rows1[li], y1, x1, psize, t, c)
        e2 = _xla_expand_side(rows2[li], y2, x2, psize, t, c)
        xla_es[li] = (e1, e2)
        sq_ins.append(padm(
            jnp.sum(jnp.square(e1.astype(jnp.float32)), axis=-1)))
        sq_ins.append(padm(
            jnp.sum(jnp.square(e2.astype(jnp.float32)), axis=-1)))

    # kernel levels: paired interleaved rows
    row_ins = []
    k_levels = []
    for li, (t, c, mo) in enumerate(zip(ts, cs, modes)):
        if mo == _XLA:
            k_levels.append(None)
        else:
            k_levels.append((t, c, mo))
            row_ins.append(padm(_interleave_pair(
                rows1[li], rows2[li], t, c)))

    corner_spec = pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((block_n, psize, psize), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    row_specs = []
    for lv in k_levels:
        if lv is None:
            continue
        t, c, _ = lv
        row_specs.append(pl.BlockSpec(
            (block_n, 2 * t, 2 * t * 2 * c), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))

    inv_spec = pl.BlockSpec((block_n, psize, psize), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [inv_spec, inv_spec]
    out_shapes = [jax.ShapeDtypeStruct((mp, psize, psize), jnp.float32)] * 2
    for lv in k_levels:
        if lv is None:
            continue
        t, c, mo = lv
        n_out = 1 if mo == _DUALPASS else 2
        width = 2 * c if mo == _DUALPASS else c
        for _ in range(n_out):
            out_specs.append(pl.BlockSpec(
                (block_n, psize, psize, width), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct(
                (mp, psize, psize, width), out_dtype))

    kernel = functools.partial(
        _kernel, tuple(k_levels), len(xla_es), psize, out_dtype)
    results = pl.pallas_call(
        kernel,
        grid=(mp // block_n,),
        in_specs=[corner_spec] * 4 + [sq_spec] * len(sq_ins) + row_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(y1p, x1p, y2p, x2p, *sq_ins, *row_ins)

    inv1, inv2 = results[0], results[1]
    k_outs = list(results[2:])
    if pad:
        inv1, inv2 = inv1[:m], inv2[:m]
        k_outs = [o[:m] for o in k_outs]

    # assemble outputs in level order; scale XLA levels with the
    # kernel's inv exactly as the unfused path would
    outs = []
    ki = 0
    inv1_od = inv1.astype(out_dtype)
    inv2_od = inv2.astype(out_dtype)
    for li, (t, c, mo) in enumerate(zip(ts, cs, modes)):
        if mo == _XLA:
            # scale in XLA with the fallback's exact expression shape
            # (under --xla_allow_excess_precision the compiler may keep
            # the product in f32 either way; matching the form keeps
            # this path bit-identical to expand_scale_pair_xla)
            e1, e2 = xla_es[li]
            outs.append(e1.astype(out_dtype) * inv1_od[..., None])
            outs.append(e2.astype(out_dtype) * inv2_od[..., None])
        elif mo == _DUALPASS:
            outs.append(k_outs[ki])
            ki += 1
        else:
            outs.append(k_outs[ki])
            outs.append(k_outs[ki + 1])
            ki += 2
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def expand_scale_pair_pallas(rows1, rows2, y1, x1, y2, x2,
                             psize, ds_list, out_dtype, interpret=False):
    """Fused two-sided expansion+normalise+scale of superblock rows
    (see module docstring). rows1/rows2: per-level (M, 4, t_l,
    t_l*C_l) in the level's dtype; y*/x*: (M,) int32 PADDED patch
    corners (the ``gather_local_patches_tiled_levels`` convention:
    +psize ring, clipped). Output structure per
    :func:`output_slice_map`: channel-paired (M, p, p, 2C_l) for C=64
    levels, per-side (M, p, p, C_l) pairs otherwise, all scaled by the
    cross-level inverse hypercolumn norm, in ``out_dtype``."""
    return _pallas_impl(tuple(rows1), tuple(rows2), y1, x1, y2, x2,
                        psize, tuple(ds_list), out_dtype,
                        interpret=interpret)


def _fwd(rows1, rows2, y1, x1, y2, x2, psize, ds_list, out_dtype,
         interpret):
    out = expand_scale_pair_pallas(rows1, rows2, y1, x1, y2, x2,
                                   psize, ds_list, out_dtype, interpret)
    return out, (tuple(rows1), tuple(rows2), y1, x1, y2, x2)


def _bwd(psize, ds_list, out_dtype, interpret, res, g):
    rows1, rows2, y1, x1, y2, x2 = res
    _, vjp = jax.vjp(
        lambda r1, r2: expand_scale_pair_xla(
            r1, r2, y1, x1, y2, x2, psize, ds_list, out_dtype
        ),
        rows1, rows2,
    )
    d1, d2 = vjp(g)
    return (d1, d2, None, None, None, None)


expand_scale_pair_pallas.defvjp(_fwd, _bwd)
