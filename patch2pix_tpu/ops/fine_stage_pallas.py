"""Fused fine-stage head: superblock rows -> pooled regressor features.

The regression stages dominate the change_stride iteration budget
(round-4/5 traces): the fused expansion kernel writes ~640 MB of bf16
patch tensors per stage, the regressor's first conv reads them back,
its (M, 8, 8, 512) output round-trips HBM again into conv1, and the
conv1+BN+relu+max fusion writes pooled features. This module splits
the stage so the heavy levels never leave VMEM:

XLA prolog (:func:`head_prolog_xla`):
  * the inverse hypercolumn norms, computed WITHOUT expanding any
    patches: the window expansion is a one-hot pass-through, so the
    per-pixel channel square-sum of an expanded patch equals the
    expansion of the rows' per-pixel square-sums (tiny C=1 data);
  * the C=3 image level's conv0 contribution (its 16-lane pairing is
    below Mosaic's 128-lane granularity for in-kernel dots — measured
    "unsupported shape cast" on every in-kernel formulation tried in
    tools/try_fine_stage.py).

Pallas kernel (:func:`fused_fine_head_pallas`), per proposal block:
    window expansion (both sides, the C>=64 levels)
    -> scale by the prolog's inv
    -> conv0 (3x3 stride 2, per-level kernel slices = SegmentedConv)
    -> + image-level partial -> BN0 affine (inference running stats)
    -> conv1 (3x3 stride 1) -> BN1 affine -> ReLU -> global max
writing only (M, 512) pooled features. The FC head stays in XLA where
the full-M matmul is already optimal.

Formulation notes (v5e-validated):
  * conv taps are CONSTANT one-hot row/column selection matmuls
    (iota-built in-kernel; strided VMEM slices are a Mosaic hazard);
  * each conv0 level-segment accumulates its 9 taps as K=128 MXU dots
    (exactly one systolic pass deep — no underfill) into one f32
    accumulator;
  * BN at inference is a per-channel affine — scale/shift enter as
    (1, 512) f32 inputs computed from running stats in XLA.

Inference-only: training keeps the expansion kernel + XLA regressor
(whose custom VJP replays exact XLA math). Numerics: inv is
bit-identical to the unfused path; conv tap/segment f32 add order
differs from lax.conv's internal order, so pooled features agree to
bf16 rounding (tolerance-tested), not bitwise.

No reference counterpart: /root/reference/networks/patch2pix.py:186-217
runs this as a chunked per-pair Python loop of gathers + cuDNN convs.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patch2pix_tpu.ops.patch_expand_pallas import (
    EPS,
    _interleave_pair,
    _onehot,
    _select,
    _window_indices,
    _xla_expand_side,
)

# proposals per grid step; P2P_FINE_HEAD_BLOCK overrides
BLOCK_N = int(os.environ.get("P2P_FINE_HEAD_BLOCK", "8"))


def _alltap_input_pos(oh: int, stride: int):
    """(1, 3*oh) iota of conv input positions: row r = d*oh + o reads
    input index stride*o - 1 + d (may be out of range — mask it)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * oh), 1)
    return stride * (r % oh) - 1 + (r // oh)


def _alltap_window_onehot(base, psize: int, ds: int, two_t: int,
                          stride: int, oh: int, dt):
    """Expansion one-hots for ALL 3 conv taps at once: (bn, 3*oh, 2t)
    where row r = d*oh + o selects the superblock window index of
    patch position stride*o - 1 + d (zero row when out of the patch —
    the conv's SAME zero padding). Composing the conv-tap selection
    into the expansion selector replaces 9 per-tap batched dot pairs
    per segment with ONE pair (the per-tap batched small dots
    dominated the first formulation: 36 vs 16 ms/stage)."""
    t = psize // ds
    i = _alltap_input_pos(oh, stride)  # (1, 3*oh)
    idx = (base + i) // ds - (base // psize) * t  # (bn, 3*oh)
    # fold the out-of-patch mask into the index (a sentinel that can
    # never equal a window id) — expanding a bool with [:, :, None] is
    # an unsupported Mosaic shape cast
    idx = jnp.where((i >= 0) & (i < psize), idx, -1_000_000)
    oh_mat = (
        idx[:, :, None] ==
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, two_t), 2)
    ).astype(jnp.float32)
    return oh_mat if dt == jnp.float32 else oh_mat.astype(dt)


def _alltap_const_onehot(in_w: int, stride: int, oh: int, bn: int, dt):
    """Constant all-taps selector (bn, 3*oh, in_w) for selecting from
    an ALREADY-expanded (bn, in_w, in_w, C) tensor (inv windows,
    conv1 input)."""
    i = _alltap_input_pos(oh, stride)  # (1, 3*oh)
    i = jnp.where((i >= 0) & (i < in_w), i, -1_000_000)  # see above
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * oh, in_w), 2)
    m = (j == i[:, :, None]).astype(jnp.float32)
    m = m if dt == jnp.float32 else m.astype(dt)
    return jnp.broadcast_to(m[0], (bn, 3 * oh, in_w))


def _alltap_select(x: jax.Array, sy: jax.Array, sx: jax.Array):
    """x (bn, H, W, C), sy/sx (bn, 3*oh, H|W) -> f32
    (bn, 3*oh_y, 3*oh_x, C): every conv tap's strided window; tap
    (dy, dx) is the [dy*oh:(dy+1)*oh, dx*oh:(dx+1)*oh] sublane block."""
    xw = jax.lax.dot_general(
        sx, x, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (bn, 3*oh_x, H, C)
    return jax.lax.dot_general(
        sy, xw, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # f32 (bn, 3*oh_y, 3*oh_x, C)


def _head_kernel(levels, psize, bn, out_dtype, *refs):
    """levels: (t, cp, paired) per kernel row input (C >= 64 pyramid
    levels). ref order: y1, x1, y2, x2, inv1, inv2, partial0, rows*,
    w0_segments*, wc1, bn0s, bn0t, bn1s, bn1t -> out (bn, F)."""
    n_lv = len(levels)
    y1_ref, x1_ref, y2_ref, x2_ref = refs[:4]
    inv1_ref, inv2_ref, part0_ref = refs[4:7]
    row_refs = refs[7:7 + n_lv]
    n_seg = sum(1 if lv[2] else 2 for lv in levels)
    w0_refs = refs[7 + n_lv: 7 + n_lv + n_seg]
    wc1_ref, bn0s_ref, bn0t_ref, bn1s_ref, bn1t_ref = refs[
        7 + n_lv + n_seg: 7 + n_lv + n_seg + 5]
    out_ref = refs[-1]

    oh = psize // 2  # conv0 stride-2 output extent
    corners = ((y1_ref[:], x1_ref[:]), (y2_ref[:], x2_ref[:]))

    # 0. all-tap inv windows per side: (bn, 3*oh, 3*oh) f32
    sc0 = _alltap_const_onehot(psize, 2, oh, bn, jnp.float32)
    inv_alls = []
    for inv_ref in (inv1_ref, inv2_ref):
        a = jax.lax.dot_general(
            sc0, inv_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bn, 3*oh_x, psize_y)
        inv_alls.append(jax.lax.dot_general(
            sc0, a, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # (bn, 3*oh_y, 3*oh_x)

    # 1. per segment: ONE all-taps expansion (conv-tap selection is
    # composed into the expansion one-hots), scale by the windowed
    # inv, then 9 sublane-sliced K=C' channel dots into the f32 conv0
    # accumulator (seeded with the XLA image-level partial)
    acc0 = part0_ref[:].astype(jnp.float32)
    si = 0
    for li, (t, cp, paired) in enumerate(levels):
        ds = psize // t
        r4 = row_refs[li][:].reshape(bn, 2 * t, 2 * t, 2 * cp)
        dt = r4.dtype
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * cp), 3)
        scaled_sides = []
        for side, (yb, xb) in enumerate(corners):
            sy = _alltap_window_onehot(yb, psize, ds, 2 * t, 2, oh, dt)
            sx = _alltap_window_onehot(xb, psize, ds, 2 * t, 2, oh, dt)
            if paired:
                e = _alltap_select(r4, sy, sx)  # f32 (bn, 3oh, 3oh, 2cp)
                hm = ((lane // cp) == side).astype(jnp.float32)
                e = e * hm
            else:
                rs = r4[..., side * cp:(side + 1) * cp]
                e = _alltap_select(rs, sy, sx)
            inv_od = (
                inv_alls[side] if out_dtype == jnp.float32
                else inv_alls[side].astype(out_dtype).astype(jnp.float32)
            )
            scaled_sides.append(
                (e.astype(dt).astype(jnp.float32)
                 * inv_od[..., None]).astype(out_dtype))
        # dual-pass sides are zero on each other's channel half, so
        # their sum is the channel-paired tensor matching the paired
        # weight segment
        xs = [scaled_sides[0] + scaled_sides[1]] if paired \
            else scaled_sides
        for k, x in enumerate(xs):
            w0 = w0_refs[si + k][:]
            for dy in range(3):
                for dx in range(3):
                    xt = x[:, dy * oh:(dy + 1) * oh,
                           dx * oh:(dx + 1) * oh, :]
                    acc0 = acc0 + jax.lax.dot_general(
                        xt, w0[3 * dy + dx],
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        si += len(xs)

    # 2. BN0 affine, round to pipeline dtype
    x1b = (acc0 * bn0s_ref[0][None, None, None, :]
           + bn0t_ref[0][None, None, None, :]).astype(out_dtype)

    # 3. conv1 (stride 1) + BN1 + relu + spatial max, same all-taps
    # pattern with a constant selector
    sc1 = _alltap_const_onehot(oh, 1, oh, bn, out_dtype)
    x1_all = _alltap_select(x1b, sc1, sc1).astype(out_dtype)
    acc1 = jnp.zeros((bn, oh, oh, wc1_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xt = x1_all[:, dy * oh:(dy + 1) * oh,
                        dx * oh:(dx + 1) * oh, :]
            acc1 = acc1 + jax.lax.dot_general(
                xt, wc1_ref[3 * dy + dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = (acc1 * bn1s_ref[0][None, None, None, :]
         + bn1t_ref[0][None, None, None, :]).astype(out_dtype)
    y = jnp.maximum(y, jnp.zeros((), out_dtype))
    out_ref[...] = jnp.max(y, axis=(1, 2))


def bn_affine(scale, bias, mean, var, eps: float = 1e-5):
    """Inference BatchNorm -> per-channel (scale, shift) f32."""
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    t = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return s, t


def _segment_weights(kernel: jax.Array, cs: Sequence[int], dtype):
    """Regressor conv0 kernel (3, 3, 2D, F) -> per-segment im2col'd
    (9, C', F) slices for the KERNEL levels (C >= 64), pyramid order.
    Paired levels (C=64) concatenate both sides' slices (the in-kernel
    dual-pass output is channel-paired)."""
    d = sum(cs)
    segs = []
    offs = []
    o = 0
    for c in cs:
        offs.append(o)
        o += c
    for c, off in zip(cs, offs):
        if c < 64:
            continue  # image level handled by the XLA prolog
        s1 = kernel[:, :, off:off + c, :]
        s2 = kernel[:, :, d + off:d + off + c, :]
        f = kernel.shape[-1]
        if c == 64:
            sl = jnp.concatenate([s1, s2], axis=2)
            segs.append(sl.reshape(9, 2 * c, f).astype(dtype))
        else:
            segs.append(s1.reshape(9, c, f).astype(dtype))
            segs.append(s2.reshape(9, c, f).astype(dtype))
    return segs


def _expand_sq(rows: jax.Array, y0: jax.Array, x0: jax.Array,
               psize: int, t: int, c: int) -> jax.Array:
    """Per-pixel channel square-sum of the expanded window, computed
    by expanding the rows' square-sums (C=1): exact because the
    one-hot expansion is a value pass-through."""
    m = rows.shape[0]
    rsq = jnp.sum(
        jnp.square(rows.reshape(m, 4, t, t, c).astype(jnp.float32)),
        axis=-1,
    ).reshape(m, 4, t, t)
    return _xla_expand_side(rsq, y0, x0, psize, t, 1)[..., 0]


def head_prolog_xla(
    rows1: Sequence[jax.Array],
    rows2: Sequence[jax.Array],
    y1: jax.Array,
    x1: jax.Array,
    y2: jax.Array,
    x2: jax.Array,
    conv0_kernel: jax.Array,
    psize: int,
    out_dtype,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (inv1, inv2, partial0): the per-side inverse hypercolumn
    norms (bit-identical to the unfused path) and the image level's
    conv0 contribution (M, p/2, p/2, F) in f32.

    rows*: ALL pyramid levels' (M, 4, t, t*C) superblock rows;
    conv0_kernel: the regressor's (3, 3, 2D, F) kernel."""
    ts = tuple(r.shape[2] for r in rows1)
    cs = tuple(r.shape[3] // r.shape[2] for r in rows1)
    d = sum(cs)
    f = conv0_kernel.shape[-1]

    invs = []
    e0s = []
    for rows, y0, x0 in ((rows1, y1, x1), (rows2, y2, x2)):
        sq = None
        for r, t, c in zip(rows, ts, cs):
            s = _expand_sq(r, y0, x0, psize, t, c)
            sq = s if sq is None else sq + s
        invs.append(jax.lax.rsqrt(sq + EPS))
        # the image level's expanded (unscaled) patches
        e0s.append(_xla_expand_side(rows[0], y0, x0, psize, ts[0], cs[0]))

    partial0 = None
    for side, (e0, inv) in enumerate(zip(e0s, invs)):
        inv_od = inv if out_dtype == jnp.float32 else inv.astype(out_dtype)
        scaled = e0.astype(out_dtype) * inv_od[..., None]
        off = side * d
        ks = conv0_kernel[:, :, off:off + cs[0], :].astype(out_dtype)
        y = jax.lax.conv_general_dilated(
            scaled, ks, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(
                jnp.float32 if out_dtype == jnp.float32 else None
            ),
        ).astype(jnp.float32)
        partial0 = y if partial0 is None else partial0 + y
    return invs[0], invs[1], partial0


@functools.partial(
    jax.jit,
    static_argnames=("psize", "out_dtype", "block_n", "interpret"),
)
def fused_fine_head_pallas(
    rows1: Sequence[jax.Array],
    rows2: Sequence[jax.Array],
    y1: jax.Array,
    x1: jax.Array,
    y2: jax.Array,
    x2: jax.Array,
    inv1: jax.Array,
    inv2: jax.Array,
    partial0: jax.Array,
    w0_segs: Sequence[jax.Array],
    wc1: jax.Array,
    bn0: Tuple[jax.Array, jax.Array],
    bn1: Tuple[jax.Array, jax.Array],
    psize: int,
    out_dtype=jnp.bfloat16,
    block_n: int = BLOCK_N,
    interpret: bool = False,
) -> jax.Array:
    """rows*: the KERNEL levels' (M, 4, t, t*C) superblock rows
    (C >= 64); y*/x*: (M,) padded patch corners; inv1/inv2: (M, p, p)
    f32 from :func:`head_prolog_xla`; partial0: its (M, p/2, p/2, F)
    image-level conv0 contribution (any float dtype); w0_segs:
    per-segment (9, C', F) conv0 slices (:func:`_segment_weights`);
    wc1: (9, F, F) im2col'd conv1 kernel; bn0/bn1: per-channel affine
    (scale, shift) f32 pairs. Returns pooled (M, F) features after
    conv0-BN0-conv1-BN1-relu-max in ``out_dtype``."""
    m = y1.shape[0]
    f = wc1.shape[-1]
    levels = tuple(
        (r.shape[2], r.shape[3] // r.shape[2],
         (r.shape[3] // r.shape[2]) == 64)
        for r in rows1
    )
    psz = psize

    pad = (-m) % block_n
    mp = m + pad

    def padm(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) \
            if pad else a

    y1p, x1p, y2p, x2p = (padm(v)[:, None] for v in (y1, x1, y2, x2))

    row_ins = []
    row_specs = []
    for li, (r1, r2) in enumerate(zip(rows1, rows2)):
        t, cp, _ = levels[li]
        row_ins.append(padm(_interleave_pair(r1, r2, t, cp)))
        row_specs.append(pl.BlockSpec(
            (block_n, 2 * t, 2 * t * 2 * cp), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))

    corner_spec = pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((block_n, psz, psz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec(
        (block_n, psz // 2, psz // 2, f), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for w in w0_segs
    ]
    wc1_spec = pl.BlockSpec(wc1.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, f), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    affs = [
        bn0[0].reshape(1, f), bn0[1].reshape(1, f),
        bn1[0].reshape(1, f), bn1[1].reshape(1, f),
    ]

    kernel = functools.partial(
        _head_kernel, levels, psz, block_n, out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_n,),
        in_specs=(
            [corner_spec] * 4 + [inv_spec] * 2 + [part_spec]
            + row_specs + w_specs + [wc1_spec] + [aff_spec] * 4
        ),
        out_specs=pl.BlockSpec((block_n, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, f), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        y1p, x1p, y2p, x2p, padm(inv1), padm(inv2), padm(partial0),
        *row_ins, *w0_segs, wc1, *affs,
    )
    return out[:m] if pad else out
