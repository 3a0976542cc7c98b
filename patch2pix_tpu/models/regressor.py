"""Mid/fine local-patch regressor.

Capability parity with ``FeatRegressNet``
(/root/reference/networks/modules.py:56-112): a small CNN over
psize x psize hypercolumn patches from both images producing 4 offset
logits + 1 confidence logit per proposal.

TPU redesign: patches arrive channels-last ``(M, psize, psize, D)`` and
the whole proposal set is one batched forward — the reference's 1200-
proposal chunk loop disappears (memory is handled by remat + bf16 at
the pipeline level, not host-side chunking). Inputs may also arrive as
PER-PYRAMID-LEVEL tensors (see :class:`SegmentedConv`): the first conv
contracts over the hypercolumn channel axis, so by linearity it can be
applied per level slice and summed — the wide (M, psize, psize, D)
concat tensor (0.8 GB of f32 at eval scale) never materialises.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Patches = Union[jax.Array, Sequence[jax.Array]]


def _conv_out_size(w: int, k: int, s: int, p: int) -> int:
    return (w - k + 2 * p) // s + 1


def _as_tuple(x: Patches) -> Tuple[jax.Array, ...]:
    return tuple(x) if isinstance(x, (list, tuple)) else (x,)


class SegmentedConv(nn.Module):
    """``nn.Conv(features, (k, k), strides, padding=1, use_bias=False)``
    over the channel-concat of several inputs, WITHOUT concatenating.

    Owns the identical ``kernel`` parameter (same name, shape and init
    as the nn.Conv it replaces, so torch-checkpoint conversion is
    untouched) and applies the per-segment kernel slices as separate
    convolutions accumulated in f32 — exactly the concat conv by
    linearity of the contraction.
    """

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Patches, slice_map=None) -> jax.Array:
        """``slice_map``: optional per-input list of (offset, size)
        kernel channel slices whose concat matches that input's channel
        layout. Default: inputs cover the kernel channels sequentially.
        The channel-paired fused gather (ops/patch_expand_pallas.py)
        passes ``((off_l, C_l), (D + off_l, C_l))`` for its paired
        levels so both images' kernel slices contract in one conv call
        (the pairing itself is free there — it falls out of the
        dual-pass kernel; tools/profile_conv0.py shows explicit-concat
        pairing alone is NOT a win, 95 vs 85 TF/s)."""
        xs = _as_tuple(xs)
        if slice_map is None:
            cin = sum(x.shape[-1] for x in xs)
            off = 0
            slice_map = []
            for x in xs:
                slice_map.append(((off, x.shape[-1]),))
                off += x.shape[-1]
        else:
            cin = sum(s for sl in slice_map for _, s in sl)
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
        )
        # preferred_element_type=f32 with bf16 operands makes the conv
        # TRANSPOSE (backward) mix an f32 cotangent with the bf16
        # kernel, which lax.conv rejects — so in low-precision configs
        # each segment conv emits its operand dtype (the MXU still
        # accumulates its own contraction in f32 internally) and the
        # cross-segment sum upcasts explicitly
        preferred = jnp.float32 if self.dtype == jnp.float32 else None
        acc = None
        for x, sl in zip(xs, slice_map):
            ks = jnp.concatenate(
                [kernel[:, :, o : o + s, :] for o, s in sl], axis=2
            ) if len(sl) > 1 else kernel[:, :, sl[0][0] : sl[0][0] + sl[0][1], :]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                ks.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=preferred,
            ).astype(jnp.float32)
            acc = y if acc is None else acc + y
        return acc.astype(self.dtype)


class FeatRegressNet(nn.Module):
    """(M, psize, psize, D) x2 -> (M, 5) raw regressor outputs.

    ``f1``/``f2`` may each be a single hypercolumn tensor or a sequence
    of per-level tensors whose channel concat is the hypercolumn (the
    zero-concat fast path; identical math).
    """

    conv_dims: Sequence[int] = (512, 512)
    conv_kers: Sequence[int] = (3, 3)
    conv_strs: Sequence[int] = (2, 1)
    fc_dims: Sequence[int] = (512, 256)
    feat_comb: str = "pre"  # concat inputs before ('pre') or after ('post') convs
    psize: int = 16
    out_dim: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, f1: Patches, f2: Patches | None = None, train: bool = False,
        slice_map=None,
    ) -> jax.Array:
        """``f2=None`` marks ``f1`` as the fused-gather layout: a flat
        tuple of patch tensors whose kernel-channel slices are given by
        ``slice_map`` (ops/patch_gather.gather_scaled_patch_pairs_fused
        returns both); 'pre' feat_comb only."""
        convs = []
        for i, (dim, k, s) in enumerate(
            zip(self.conv_dims, self.conv_kers, self.conv_strs)
        ):
            conv = (
                SegmentedConv(features=dim, kernel_size=k, stride=s,
                              dtype=self.dtype, name=f"conv{i}")
                if i == 0
                else nn.Conv(dim, (k, k), strides=(s, s),
                             padding=[(1, 1), (1, 1)], use_bias=False,
                             dtype=self.dtype, name=f"conv{i}")
            )
            convs.append(
                (
                    conv,
                    nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name=f"convbn{i}"),
                )
            )

        def conv_stack(x, slice_map=None):
            # the reference closes the stack with ReLU + MaxPool(kernel=w)
            # to 1x1; at that point the spatial extent equals w, so it is
            # a global spatial max
            first = True
            for conv, bn in convs:
                x = bn(conv(x, slice_map) if first else conv(x))
                first = False
            x = nn.relu(x)
            return jnp.max(x, axis=(1, 2))

        if self.feat_comb == "pre":
            if f2 is None:  # fused-gather layout with explicit slices
                feat = conv_stack(_as_tuple(f1), list(slice_map))
            else:
                feat = conv_stack(_as_tuple(f1) + _as_tuple(f2))
        else:
            # 'post': shared conv stack applied to each image's patches
            feat = jnp.concatenate([conv_stack(f1), conv_stack(f2)], axis=-1)

        for i, dim in enumerate(self.fc_dims):
            feat = nn.Dense(dim, dtype=self.dtype, name=f"fc{i}")(feat)
            feat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=f"fcbn{i}")(feat)
            feat = nn.relu(feat)
        return nn.Dense(self.out_dim, name="fc_out")(feat.astype(jnp.float32))
