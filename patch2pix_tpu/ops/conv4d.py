"""4D convolution for neighbourhood consensus.

The reference emulates conv4d with a Python loop over the first spatial
dim, each step issuing 2*pad+1 cuDNN conv3d calls
(/root/reference/networks/ncn/conv4d.py:12-74). On TPU we instead
decompose the k x k taps over (h1, w1) into an im2col-style shift stack
folded into the channel axis, leaving one ordinary 2D convolution over
(h2, w2) — a single large MXU contraction per layer with no Python loop
over traced dims.

Shapes are channels-last 6D: ``(B, h1, w1, h2, w2, C)``.

conv4d(x, w)[b, i, j, k, l, co] =
    sum_{di, dj, dk, dl, ci} x[b, i+di-p, j+dj-p, k+dk-p, l+dl-p, ci]
                             * w[di, dj, dk, dl, ci, co]
with zero padding p = ksize // 2 on all four spatial dims (SAME).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

K_PALLAS = 3  # kernel size the Pallas fast path supports


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


def _pallas_ok() -> bool:
    from patch2pix_tpu.ops.dispatch import pallas_allowed

    return pallas_allowed()


def conv4d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    out_dtype: jax.typing.DTypeLike | None = None,
) -> jax.Array:
    """SAME 4D convolution, stride 1.

    Args:
      x: ``(B, h1, w1, h2, w2, Cin)`` input volume.
      w: ``(k, k, k, k, Cin, Cout)`` filters (spatial order di, dj, dk, dl).
      b: optional ``(Cout,)`` bias.
      out_dtype: output storage dtype (accumulation is always float32);
        default float32. Passing bf16 halves the HBM write+read of a
        large intermediate volume (the NCN's 16-channel tensor).

    Returns:
      ``(B, h1, w1, h2, w2, Cout)``.
    """
    k = w.shape[0]
    assert w.shape[:4] == (k, k, k, k), f"expected 4D cubic kernel, got {w.shape}"
    pad = k // 2
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]

    # Dispatch (measured at the change_stride eval scale, see
    # BASELINE.md): tiny-Cin layers fold the outer taps into Cin
    # (15 -> 5.4 ms for the NCN's 1->16 layer, both symmetric branches
    # in one call), tiny-Cout layers fold them into Cout + shift-add
    # (30 -> ~15 ms for the 16->1 consensus layer). Both are exact
    # reassociations and pure XLA, so they differentiate and run on
    # every backend. The Pallas shift-panel kernel covers the remaining
    # small-channel configurations on TPU (its w2-folded panels carry
    # an intrinsic ~43x MXU-padding floor for cout=1, which is why the
    # fold formulations replaced it on the hot path); everything else
    # takes the per-tap conv accumulation.
    if k == K_PALLAS and cin <= 2:
        return conv4d_fold_in(x, w, b, out_dtype=out_dtype)
    if k == K_PALLAS and cout <= 2:
        return conv4d_fold_out(x, w, b, out_dtype=out_dtype)
    if k == K_PALLAS and cout * cin <= 16 and _tpu_backend() and _pallas_ok():
        from patch2pix_tpu.ops.conv4d_pallas import conv4d_pallas

        return conv4d_pallas(x, w, b, out_dtype=out_dtype)

    out = conv4d_xla_taps(x, w, b)
    return out if out_dtype is None else out.astype(out_dtype)


def _outer_shifts_all(x: jax.Array, k: int = 3):
    """The k^2 views x[..., i+di-1, j+dj-1, ...] over the (h1, w1) axes
    (1, 2), zero padded — ONE pad, k^2 static slices (padding per tap
    would materialise k^2 full copies)."""
    pad = k // 2
    h1, w1 = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)) + ((0, 0),) * (x.ndim - 3))
    return [
        jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, di, di + h1, axis=1),
            dj, dj + w1, axis=2,
        )
        for di in range(k)
        for dj in range(k)
    ]


def _flat_shift_masks(h1: int, w1: int, k: int = 3) -> list:
    """Validity masks for FLAT (h1*w1) shifts of the outer taps.

    A shift by (di-1, dj-1) over the (h1, w1) grid equals a shift by
    s = (di-1)*w1 + (dj-1) of the row-major flat index — except at grid
    edges, where the flat shift wraps into the neighbouring row instead
    of reading the zero padding. mask[t][f] = 1 iff flat cell f's tap-t
    source (i+di-1, j+dj-1) is inside the grid, restoring exact SAME
    zero-pad semantics. Slicing the flat axis keeps XLA's layouts
    intact; slicing separate (h1, w1) axes of the 6D view made layout
    assignment pick (h1, w1)-minor layouts for the huge NCN volumes and
    spend more time relayouting than convolving (measured ~8 ms/iter of
    pure copies/reshapes at the change_stride eval scale).
    """
    pad = k // 2
    i = np.arange(h1)[:, None]
    j = np.arange(w1)[None, :]
    masks = []
    for di in range(k):
        for dj in range(k):
            ok = (
                (i + di - pad >= 0) & (i + di - pad < h1)
                & (j + dj - pad >= 0) & (j + dj - pad < w1)
            )
            masks.append(ok.reshape(h1 * w1))
    return masks


def _spmd_mode() -> bool:
    from patch2pix_tpu.ops.dispatch import spmd_mode

    return spmd_mode()


def _outer_shifts_flat(
    xf: jax.Array, bs: int, h1: int, w1: int, k: int = 3
):
    """The k^2 outer-tap views of a FLAT volume as (slice, mask) pairs —
    no (h1, w1) axes ever exist, so no relayout-prone reshapes (slicing
    separate spatial axes made XLA's layout assignment relayout the
    huge NCN volumes, ~8 ms/iter at the change_stride eval scale).
    Shifts that cross a row boundary in the flat index land on cells
    whose mask is 0 — the grid-edge condition.

    Single chip: ``xf`` is fully flat ``(B*h1*w1, ...)`` and shifts
    slice axis 0 (one pad serves every batch; batch-boundary crossings
    are masked like row crossings). SPMD mode: ``xf`` is per-batch flat
    ``(B, h1*w1, ...)`` and shifts slice axis 1 — merged-flat shifts
    cross PAIR boundaries, which under a data-sharded mesh lower as
    per-step halo collective-permutes (the train step must move only
    the gradient all-reduce)."""
    pad = k // 2
    p = pad * w1 + pad  # max |flat shift|
    masks = _flat_shift_masks(h1, w1, k)
    spmd = _spmd_mode()
    axis = 1 if spmd else 0
    n = h1 * w1 if spmd else bs * h1 * w1
    padw = [(0, 0)] * xf.ndim
    padw[axis] = (p, p)
    xp = jnp.pad(xf, padw)
    out = []
    for t, mask in enumerate(masks):
        di, dj = t // k, t % k
        s = (di - pad) * w1 + (dj - pad)
        view = jax.lax.slice_in_dim(xp, p + s, p + s + n, axis=axis)
        m = jnp.asarray(mask if spmd else np.tile(mask, bs))
        out.append((view, m))
    return out


def _tap_sum_feasible(n: int, row_bytes: int) -> bool:
    """True iff the Pallas tap-sum kernel can pick a block size for
    this shape (ops/tap_sum_pallas.py _pick_nb returns 0 when no
    multiple-of-8 divisor of n fits its VMEM budget)."""
    from patch2pix_tpu.ops.tap_sum_pallas import _pick_nb

    return _pick_nb(n, row_bytes) > 0


def _tap_sum_feasible_t(hw: int, np_: int, n: int) -> bool:
    from patch2pix_tpu.ops.tap_sum_pallas import tap_sum_feasible_t

    return tap_sum_feasible_t(hw, np_, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tap_sum(zf: jax.Array, bias: jax.Array, bs: int, h1: int, w1: int):
    """bias + masked outer-tap shift-add of PREPADDED
    ``zf (9, N + 2p + 8, M)`` -> (N, M) f32 (Pallas kernel; see
    ops/tap_sum_pallas.py). Callers pad the fold-out conv's INPUT rows
    instead of its 9x larger output (conv of zero rows is zero). The
    custom VJP keeps the NCN differentiable for pretraining: the
    adjoint is the same masked shift with flipped taps, in plain jnp
    (training-only)."""
    from patch2pix_tpu.ops.tap_sum_pallas import tap_sum_pallas

    return tap_sum_pallas(
        zf, bias, bs, h1, w1, interpret=not _tpu_backend(), prepadded=True
    )


def _tap_sum_fwd(zf, bias, bs, h1, w1):
    return _tap_sum(zf, bias, bs, h1, w1), jnp.zeros((0,), zf.dtype)


def _tap_sum_bwd(bs, h1, w1, res, g):
    zdtype = res.dtype
    k = 3
    pad = k // 2
    p = pad * w1 + pad
    n, m = g.shape
    gp = jnp.pad(g, ((p, p), (0, 0)))
    masks = _flat_shift_masks(h1, w1, k)
    dz = []
    for t in range(k * k):
        di, dj = t // k, t % k
        s = (di - pad) * w1 + (dj - pad)
        # d z[t, f'] = mask_t[f' - s] * g[f' - s]; the source-validity
        # mask evaluated at f' - s equals the FLIPPED tap's mask at f'
        view = jax.lax.slice_in_dim(gp, p - s, p - s + n, axis=0)
        mflip = jnp.asarray(
            np.tile(masks[(k - 1 - di) * k + (k - 1 - dj)], bs), jnp.float32
        )
        dz.append(view * mflip[:, None])
    # the forward's PAD rows never contribute (masked): zero cotangent
    dzf = jnp.pad(jnp.stack(dz), ((0, 0), (p, p + 8), (0, 0)))
    return dzf.astype(zdtype), jnp.sum(g)


_tap_sum.defvjp(_tap_sum_fwd, _tap_sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tap_sum_t(zt: jax.Array, bias: jax.Array, bs: int, h1: int, w1: int):
    """Transposed-domain tap-sum (ops/tap_sum_pallas.tap_sum_pallas_t):
    zt ``(HW, 9, Np)`` is the fold-out conv's native N-minor CNHW
    output viewed transposed (a bitcast) -> ``(HW, N)`` f32. The VJP
    mirrors ``_tap_sum``'s flipped-tap masked shift, on the lane axis."""
    from patch2pix_tpu.ops.tap_sum_pallas import tap_sum_pallas_t

    return tap_sum_pallas_t(
        zt, bias, bs, h1, w1, interpret=not _tpu_backend()
    )


def _tap_sum_t_fwd(zt, bias, bs, h1, w1):
    # zero-size residual carries zt's shape/dtype (valid JAX leaf)
    shadow = jnp.zeros((zt.shape[0], 0, zt.shape[2]), zt.dtype)
    return _tap_sum_t(zt, bias, bs, h1, w1), shadow


def _tap_sum_t_bwd(bs, h1, w1, res, g):
    hw, _, np_ = res.shape
    zdtype = res.dtype
    k = 3
    pad = k // 2
    p = pad * w1 + pad
    n = bs * h1 * w1
    # d zt[hw, t, j] = mask_t[j - p - s_t] * g[hw, j - p - s_t]:
    # multiply g by the tap's own mask, then shift right by p + s_t.
    # s in [-p, p] and p_right >= p, so every tap's pad amounts
    # (p + s, p_right - s) are non-negative; masked-out cells are
    # exactly the ones whose shift would land in the pad lanes, so the
    # pad-lane cotangent is zero by construction.
    masks = _flat_shift_masks(h1, w1, k)
    dz = []
    for t in range(k * k):
        di, dj = t // k, t % k
        s = (di - pad) * w1 + (dj - pad)
        m = jnp.asarray(np.tile(masks[t], bs), jnp.float32)
        dz.append(jnp.pad(
            g * m[None, :], ((0, 0), (p + s, np_ - n - p - s))
        ))
    return jnp.stack(dz, axis=1).astype(zdtype), jnp.sum(g)


_tap_sum_t.defvjp(_tap_sum_t_fwd, _tap_sum_t_bwd)


def conv4d_fold_in(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None,
    out_dtype: jax.typing.DTypeLike | None = None,
) -> jax.Array:
    """conv4d (k=3) with the OUTER (h1, w1) taps folded into Cin.

    For small Cin the natural lowerings starve the MXU: the contraction
    depth of a 2D conv over (h2, w2) is only 9*Cin. Stacking the 9
    outer-shifted copies of the volume as extra input channels makes
    the whole 4D kernel ONE ordinary 2D convolution with K = 81*Cin:

        out[b,i,j,k,l,co] = conv2d_{(k,l)}(xs9, W)[...]
        xs9[b,i,j,k,l,(t,ci)] = x[b, i+di(t)-1, j+dj(t)-1, k, l, ci]
        W[dk,dl,(t,ci),co]    = w[di(t), dj(t), dk, dl, ci, co]

    Exact (same f32-accumulated contraction, reassociated). Memory: the
    9-fold shifted stack is materialised (9x the input volume) — meant
    for Cin=1 (the NCN's first layer), where that is 9/16 of the
    OUTPUT's size.
    """
    k = w.shape[0]
    assert k == 3, f"fold-in path is k=3 only, got {w.shape}"
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    # masked FLAT shifts (see _outer_shifts_flat): exactly the
    # zero-padded 9 outer-tap views, sliced along a flat axis so no 6D
    # reshape/relayout ever touches the volume
    if _spmd_mode():
        xf = x.reshape(bs, h1 * w1, h2, w2, cin)
        xs9 = jnp.concatenate(
            [
                v * m[None, :, None, None, None].astype(v.dtype)
                for v, m in _outer_shifts_flat(xf, bs, h1, w1, k)
            ],
            axis=-1,
        ).reshape(bs * h1 * w1, h2, w2, k * k * cin)
    else:
        xf = x.reshape(bs * h1 * w1, h2, w2, cin)
        xs9 = jnp.concatenate(
            [
                v * m[:, None, None, None].astype(v.dtype)
                for v, m in _outer_shifts_flat(xf, bs, h1, w1, k)
            ],
            axis=-1,
        )  # (B*h1*w1, h2, w2, 9*cin)
    # W[dk, dl, (t, ci), co] = w[di(t), dj(t), dk, dl, ci, co]
    wf = w.transpose(2, 3, 0, 1, 4, 5).reshape(k, k, k * k * cin, cout)
    out = jax.lax.conv_general_dilated(
        xs9,
        wf,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # f32 output from bf16 operands breaks the conv TRANSPOSE
        # (mixed-dtype cotangent); low-precision configs emit the
        # operand dtype — the MXU still accumulates the K=81*cin
        # contraction in f32 internally
        preferred_element_type=(
            jnp.float32 if x.dtype == jnp.float32 else None
        ),
    ).reshape(bs, h1, w1, h2, w2, cout)
    out = out.astype(jnp.float32)
    if b is not None:
        out = out + b
    return out if out_dtype is None else out.astype(out_dtype)


def conv4d_fold_out(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None,
    out_dtype: jax.typing.DTypeLike | None = None,
) -> jax.Array:
    """conv4d (k=3) with the OUTER (h1, w1) taps folded into Cout.

    For small Cout (the NCN's 16->1 consensus layer) a 2D-conv lowering
    leaves the MXU's output lanes ~empty. Emitting the 9 outer-tap
    contributions as output channels of ONE 2D convolution over
    (h2, w2) raises N to 9*Cout (and keeps K = 9*Cin):

        z[b,i,j,k,l,(t,co)] = conv2d_{(k,l)}(x, V)
        V[dk,dl,ci,(t,co)]  = w[di(t), dj(t), dk, dl, ci, co]
        out[b,i,j,...]      = sum_t z[b, i+di(t)-1, j+dj(t)-1, ..., t]

    The tap-sum reads z per-channel, so z is produced FEATURE-MAJOR
    (conv output spec "CNHW") — each z_t is a contiguous slab and the
    9 shift-adds are pure pad/slice passes. Exact (reassociation only).
    """
    k = w.shape[0]
    assert k == 3, f"fold-out path is k=3 only, got {w.shape}"
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    n = bs * h1 * w1
    pad = k // 2
    p = pad * w1 + pad
    # v2 (default): the tap-sum runs in the conv's NATIVE N-minor CNHW
    # layout — the transposed view is a bitcast, killing the 347 MB
    # standard-layout relayout copy per symmetric branch that feeds the
    # v1 kernel (measured ~0.9 ms each at change_stride eval scale,
    # tools/profile_ncn_layout.py). Needs 128-lane granularity on the
    # flat-N axis; P2P_TAPSUM=v1 forces the windowed-DMA kernel.
    p_right = (-(n + p)) % 128
    while p_right < p:
        p_right += 128
    np_ = n + p + p_right
    use_pallas_t = (
        cout == 1 and _tpu_backend() and _pallas_ok()
        and os.environ.get("P2P_TAPSUM", "v2") != "v1"
        and _tap_sum_feasible_t(h2 * w2, np_, n)
    )
    use_pallas = (
        not use_pallas_t
        and cout == 1 and _tpu_backend() and n % 8 == 0 and _pallas_ok()
        # Mosaic DMA windows must be lane-aligned: the flattened minor
        # (h2*w2) dim must fill whole 128-lane tiles (true at every
        # snapped eval/train scale; tiny init shapes take the jnp path)
        and (h2 * w2) % 128 == 0
        # and a multiple-of-8 block must fit the kernel's VMEM budget
        # (an unusually large h2*w2 row can make every nb infeasible)
        and _tap_sum_feasible(n, h2 * w2 * x.dtype.itemsize)
    )
    xf = x.reshape(bs * h1 * w1, h2, w2, cin)
    if use_pallas_t:
        # pre-pad the conv INPUT rows to Np = p + n + p_right (lane
        # multiple); pad-row values are never read unmasked
        xf = jnp.pad(xf, ((p, p_right), (0, 0), (0, 0), (0, 0)))
        vf = w.transpose(2, 3, 4, 0, 1, 5).reshape(k, k, cin, k * k * cout)
        z = jax.lax.conv_general_dilated(
            xf, vf, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "CNHW"),
            preferred_element_type=(
                jnp.float32 if x.dtype == jnp.float32 else None
            ),
        ).astype(x.dtype)  # (9, Np, h2, w2) physically N-minor
        zt = jnp.transpose(z.reshape(k * k, np_, h2 * w2), (2, 0, 1))
        bias0 = jnp.zeros((), jnp.float32) if b is None else b.reshape(())
        out_t = _tap_sum_t(zt, bias0, bs, h1, w1)  # (HW, N) f32
        out = jnp.transpose(out_t, (1, 0)).reshape(
            bs, h1, w1, h2, w2, 1
        )
        return out if out_dtype is None else out.astype(out_dtype)
    if use_pallas:
        # pre-pad the kernel's (p, p+8) zero rows on the conv INPUT
        # side: conv of zero rows is zero, so the conv emits the
        # padded z the kernel wants directly — 9x less pad traffic
        # than padding the conv output (115 MB -> 13 MB at the
        # change_stride eval scale, and no post-conv pad pass)
        xf = jnp.pad(xf, ((p, p + 8), (0, 0), (0, 0), (0, 0)))
    # V[dk, dl, ci, (t, co)] = w[di(t), dj(t), dk, dl, ci, co]
    vf = w.transpose(2, 3, 4, 0, 1, 5).reshape(k, k, cin, k * k * cout)
    z = jax.lax.conv_general_dilated(
        xf,
        vf,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "CNHW"),
        # operand dtype out in low-precision configs: f32 output from
        # bf16 operands breaks the conv transpose (mixed-dtype
        # cotangent), and z was rounded to x.dtype right after anyway
        preferred_element_type=(
            jnp.float32 if x.dtype == jnp.float32 else None
        ),
    )  # (9*cout, rows, h2, w2) feature-major
    z = z.astype(x.dtype)  # rounding matches the bf16 pipeline's
    # layer-output storage; the tap-sum below still accumulates in f32
    if use_pallas:
        # Pallas masked shift-add: one DMA'd read of z + one write of
        # the output. The jnp pad/slice chain below is exact too, but
        # XLA materialises padded copies of the whole z tensor per
        # branch (~9 ms/iter at change_stride eval scale vs ~1.5 here).
        zf = z.reshape(k * k, n + 2 * p + 8, h2 * w2)
        bias0 = (
            jnp.zeros((), jnp.float32) if b is None else b.reshape(())
        )
        out = _tap_sum(zf, bias0, bs, h1, w1).reshape(
            bs, h1, w1, h2, w2, 1
        )
        return out if out_dtype is None else out.astype(out_dtype)
    # masked FLAT shift-adds (see _outer_shifts_flat): slicing a flat
    # axis instead of separate (h1, w1) axes keeps the slices on the
    # layout XLA gave the conv output (the 6D reshape + relayout copies
    # this replaces cost ~6 ms/iter at change_stride eval scale). SPMD
    # mode keeps the batch dim separate so the shifts never cross pair
    # boundaries (no halo collectives under a data-sharded mesh).
    pad = k // 2
    p = pad * w1 + pad
    masks = _flat_shift_masks(h1, w1, k)
    spmd = _spmd_mode()
    if spmd:
        z = z.reshape(k * k, cout, bs, h1 * w1, h2, w2)
        zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (p, p), (0, 0), (0, 0)))
    else:
        z = z.reshape(k * k, cout, n, h2, w2)
        zp = jnp.pad(z, ((0, 0), (0, 0), (p, p), (0, 0), (0, 0)))
    out = None
    for t in range(k * k):
        di, dj = t // k, t % k
        s = (di - pad) * w1 + (dj - pad)
        if spmd:
            shifted = jax.lax.slice_in_dim(
                zp[t], p + s, p + s + h1 * w1, axis=2
            )
            m = jnp.asarray(masks[t], jnp.float32)[None, None, :, None, None]
        else:
            shifted = jax.lax.slice_in_dim(zp[t], p + s, p + s + n, axis=1)
            m = jnp.asarray(
                np.tile(masks[t], bs), jnp.float32
            )[None, :, None, None]
        shifted = shifted.astype(jnp.float32) * m
        out = shifted if out is None else out + shifted
    out = out.reshape(cout, bs, h1, w1, h2, w2)
    out = jnp.moveaxis(out, 0, -1)  # (B, h1, w1, h2, w2, cout)
    if b is not None:
        out = out + b
    return out if out_dtype is None else out.astype(out_dtype)


def conv4d_xla_taps(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None
) -> jax.Array:
    """XLA path: accumulate one 2D conv over (h2, w2) per (di, dj)
    tap — never materialises the k^2-fold shifted volume. Also serves
    as the adjoint operator for the Pallas kernel's custom VJP."""
    k = w.shape[0]
    pad = k // 2
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for di in range(k):
        for dj in range(k):
            xs = xp[:, di : di + h1, dj : dj + w1]
            xs = xs.reshape(bs * h1 * w1, h2, w2, cin)
            y = jax.lax.conv_general_dilated(
                xs,
                w[di, dj],
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                # see conv4d_fold_in: operand-dtype output keeps the
                # conv transpose single-dtype; the cross-tap sum
                # upcasts explicitly
                preferred_element_type=(
                    jnp.float32 if xs.dtype == jnp.float32 else None
                ),
            ).astype(jnp.float32)
            out = y if out is None else out + y
    out = out.reshape(bs, h1, w1, h2, w2, cout)
    if b is not None:
        out = out + b
    return out


def conv4d_transpose_symmetric(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    out_dtype: jax.typing.DTypeLike | None = None,
) -> jax.Array:
    """conv4d applied to the A<->B transposed volume, transposed back.

    Used by symmetric neighbourhood consensus: the (h2, w2, h1, w1)
    re-ordering of the volume is convolved and re-ordered back
    (/root/reference/networks/ncn/model.py:145-155 semantics).

    Implemented WITHOUT touching the data: by the axis-pair symmetry
    of the 4D convolution,

        T(conv4d(T(x), w)) == conv4d(x, w'),
        w'[a, b, c, d] = w[c, d, a, b],

    so transposing the (huge, layout-hostile) volume twice reduces to
    permuting the (tiny) filter's spatial axes once.
    """
    return conv4d(x, w.transpose(2, 3, 0, 1, 4, 5), b, out_dtype=out_dtype)
