"""Neighbourhood-consensus network: stacked 4D convs with ReLU.

Capability parity with /root/reference/networks/ncn/model.py:124-155
(``NeighConsensus``): symmetric mode convolves both the volume and its
A<->B transpose and sums (the two passes see independent ReLUs, so this
is not the same as symmetrising the filters).

The conv4d itself is the shift-stacked single-2D-conv formulation from
``patch2pix_tpu.ops.conv4d`` (Pallas fast path to follow), not the
reference's Python loop of conv3d calls.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from patch2pix_tpu.ops.conv4d import conv4d, conv4d_transpose_symmetric


class NeighConsensus(nn.Module):
    """corr (B, h1, w1, h2, w2) -> filtered corr, same shape.

    Patch2Pix config: kernel_sizes=[3, 3], channels=[16, 1]
    (/root/reference/networks/patch2pix.py:32).
    """

    kernel_sizes: Sequence[int] = (3, 3)
    channels: Sequence[int] = (16, 1)
    symmetric_mode: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr: jax.Array) -> jax.Array:
        weights = []
        cin = 1
        for li, (k, cout) in enumerate(zip(self.kernel_sizes, self.channels)):
            w = self.param(
                f"conv{li}_kernel",
                nn.initializers.xavier_uniform(),
                (k, k, k, k, cin, cout),
            )
            b = self.param(f"conv{li}_bias", nn.initializers.zeros, (cout,))
            weights.append((w, b))
            cin = cout

        def stack(x, transpose: bool):
            op = conv4d_transpose_symmetric if transpose else conv4d
            for li, (w, b) in enumerate(weights):
                # intermediate volumes are stored in the compute dtype
                # (halves the HBM round-trip of the 16-channel tensor);
                # the final layer keeps the f32 accumulator
                od = self.dtype if li < len(weights) - 1 else None
                x = nn.relu(
                    op(x.astype(self.dtype), w.astype(self.dtype), b,
                       out_dtype=od)
                )
            return x

        x = corr[..., None]  # add channel axis
        if self.symmetric_mode:
            y = stack(x, False) + stack(x, True)
        else:
            y = stack(x, False)
        return y[..., 0].astype(jnp.float32)
