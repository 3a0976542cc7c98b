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

import jax
import jax.numpy as jnp

K_PALLAS = 3  # kernel size the Pallas fast path supports


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


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

    # Dispatch the expensive configurations to the blocked Pallas
    # kernel on TPU backends: a lax.conv with tiny Cout pays the MXU's
    # 128-lane output padding (~100x wasted FLOPs for the NCN's 16->1
    # layer, 8x for the 1->16 layer — and the tap path additionally
    # re-materialises the 16-channel volume per accumulation step);
    # the Pallas kernel's shift-panel matmuls scale with w2*Cout.
    if k == K_PALLAS and cout * cin <= 16 and _tpu_backend():
        from patch2pix_tpu.ops.conv4d_pallas import conv4d_pallas

        return conv4d_pallas(x, w, b, out_dtype=out_dtype)

    out = conv4d_xla_taps(x, w, b)
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
                preferred_element_type=jnp.float32,
            )
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
