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


def conv4d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
) -> jax.Array:
    """SAME 4D convolution, stride 1.

    Args:
      x: ``(B, h1, w1, h2, w2, Cin)`` input volume.
      w: ``(k, k, k, k, Cin, Cout)`` filters (spatial order di, dj, dk, dl).
      b: optional ``(Cout,)`` bias.

    Returns:
      ``(B, h1, w1, h2, w2, Cout)``.
    """
    k = w.shape[0]
    assert w.shape[:4] == (k, k, k, k), f"expected 4D cubic kernel, got {w.shape}"
    pad = k // 2
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]

    # Zero-pad the (h1, w1) dims, then build the k*k shifted views and fold
    # them into the channel axis. (h2, w2) taps stay as the true spatial
    # dims of a single 2D convolution.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0), (0, 0)))
    shifts = []
    for di in range(k):
        for dj in range(k):
            shifts.append(xp[:, di : di + h1, dj : dj + w1])
    # (B, h1, w1, h2, w2, k*k*Cin) with (di, dj) major over Cin
    xs = jnp.concatenate(shifts, axis=-1)
    xs = xs.reshape(bs * h1 * w1, h2, w2, k * k * cin)

    # Weights: (di, dj, dk, dl, Cin, Cout) -> (dk, dl, (di, dj, Cin), Cout)
    wr = w.transpose(2, 3, 0, 1, 4, 5).reshape(k, k, k * k * cin, cout)

    out = jax.lax.conv_general_dilated(
        xs,
        wr,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(bs, h1, w1, h2, w2, cout)
    if b is not None:
        out = out + b
    return out


def conv4d_transpose_symmetric(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None
) -> jax.Array:
    """conv4d applied to the A<->B transposed volume, transposed back.

    Used by symmetric neighbourhood consensus: the (h2, w2, h1, w1)
    re-ordering of the volume is convolved and re-ordered back
    (/root/reference/networks/ncn/model.py:145-155 semantics).
    """
    xt = x.transpose(0, 3, 4, 1, 2, 5)
    yt = conv4d(xt, w, b)
    return yt.transpose(0, 3, 4, 1, 2, 5)
