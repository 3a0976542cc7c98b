"""Mid/fine local-patch regressor.

Capability parity with ``FeatRegressNet``
(/root/reference/networks/modules.py:56-112): a small CNN over
psize x psize hypercolumn patches from both images producing 4 offset
logits + 1 confidence logit per proposal.

TPU redesign: patches arrive channels-last ``(M, psize, psize, D)`` and
the whole proposal set is one batched forward — the reference's 1200-
proposal chunk loop disappears (memory is handled by remat + bf16 at
the pipeline level, not host-side chunking).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_out_size(w: int, k: int, s: int, p: int) -> int:
    return (w - k + 2 * p) // s + 1


class FeatRegressNet(nn.Module):
    """(M, psize, psize, D) x2 -> (M, 5) raw regressor outputs."""

    conv_dims: Sequence[int] = (512, 512)
    conv_kers: Sequence[int] = (3, 3)
    conv_strs: Sequence[int] = (2, 1)
    fc_dims: Sequence[int] = (512, 256)
    feat_comb: str = "pre"  # concat inputs before ('pre') or after ('post') convs
    psize: int = 16
    out_dim: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, train: bool = False) -> jax.Array:
        f1 = f1.astype(self.dtype)
        f2 = f2.astype(self.dtype)
        convs = []
        for i, (dim, k, s) in enumerate(
            zip(self.conv_dims, self.conv_kers, self.conv_strs)
        ):
            convs.append(
                (
                    nn.Conv(dim, (k, k), strides=(s, s), padding=[(1, 1), (1, 1)],
                            use_bias=False, dtype=self.dtype, name=f"conv{i}"),
                    nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name=f"convbn{i}"),
                )
            )

        def conv_stack(x):
            # the reference closes the stack with ReLU + MaxPool(kernel=w)
            # to 1x1; at that point the spatial extent equals w, so it is
            # a global spatial max
            for conv, bn in convs:
                x = bn(conv(x))
            x = nn.relu(x)
            return jnp.max(x, axis=(1, 2))

        if self.feat_comb == "pre":
            feat = conv_stack(jnp.concatenate([f1, f2], axis=-1))
        else:
            # 'post': shared conv stack applied to each image's patches
            feat = jnp.concatenate([conv_stack(f1), conv_stack(f2)], axis=-1)

        for i, dim in enumerate(self.fc_dims):
            feat = nn.Dense(dim, dtype=self.dtype, name=f"fc{i}")(feat)
            feat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=f"fcbn{i}")(feat)
            feat = nn.relu(feat)
        return nn.Dense(self.out_dim, name="fc_out")(feat.astype(jnp.float32))
