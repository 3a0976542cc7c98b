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


class ScaledKernelConv(nn.Module):
    """``nn.Conv(features, (k, k), stride, padding=1, use_bias=False)``
    with an optional per-input-channel BN affine FOLDED into the
    weights: ``conv(x*s + t) = conv_{kernel*s}(x) + conv_kernel(t)``,
    where the second term is a conv over a constant per-channel map —
    (1, H, W, Cin) of broadcast ``t`` — whose cost is negligible.
    Owns the identical ``kernel`` parameter (name/shape/init of the
    nn.Conv it replaces), so checkpoint conversion is untouched."""

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, in_affine=None) -> jax.Array:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
        )

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype), kern,
                window_strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.float32 if self.dtype == jnp.float32 else None
                ),
            )

        if in_affine is None:
            return conv(x, kernel.astype(self.dtype))
        s, t = in_affine
        ks = (kernel.astype(jnp.float32) * s[None, None, :, None]
              ).astype(self.dtype)
        tmap = jnp.broadcast_to(
            t.astype(self.dtype), (1,) + x.shape[1:3] + (cin,))
        return conv(x, ks) + conv(tmap, kernel.astype(self.dtype))


class BNAffine(nn.Module):
    """BatchNorm with nn.BatchNorm's exact parameters and running-stat
    state, returning the per-channel affine ``(s, t)`` (y = x*s + t)
    instead of applying it.

    Why: applying BN to the regressor's (M, 8, 8, 512) conv outputs is
    a full tensor pass, and at training scale (M = 12800) the
    stats+normalize fusions cost ~99 ms of the 374 ms step (round-5
    trace). Returning the affine lets the caller FOLD it away:
      * the conv0 BN folds into conv1's weights (conv is linear in its
        input: conv(x*s + t) = conv_{k*s}(x) + conv_k(t_map), where
        the second term is a conv over a constant 8x8 map — tiny);
      * the conv1 BN + ReLU + global max folds into per-channel
        max/min reductions: max_hw relu(x*s + t) = relu(s * (s > 0 ?
        max_hw x : min_hw x) + t).
    Both big normalize passes disappear; only the stat reductions
    touch the tensor. Stats match flax (f32, biased variance, same
    momentum update); the stat reduction runs as one fused
    sum/sum-of-squares pass over a 2D view.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, use_running_average: bool
    ) -> Tuple[jax.Array, jax.Array]:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32).reshape(-1, c)
            n = xf.shape[0]
            s1 = jnp.sum(xf, axis=0)
            s2 = jnp.sum(jnp.square(xf), axis=0)
            mean = s1 / n
            # E[x^2] - mean^2: one pass instead of flax's two; exact up
            # to f32 rounding (activations are zero-centred-ish, no
            # cancellation hazard), clamped against negative round-off
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        s = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        t = bias.astype(jnp.float32) - mean * s
        return s, t


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
                else ScaledKernelConv(features=dim, kernel_size=k,
                                      stride=s, dtype=self.dtype,
                                      name=f"conv{i}")
            )
            convs.append((conv, BNAffine(name=f"convbn{i}")))

        def conv_stack(x, slice_map=None):
            # the reference closes the stack with ReLU + MaxPool(kernel=w)
            # to 1x1; at that point the spatial extent equals w, so it
            # is a global spatial max. The BatchNorms come back as
            # per-channel affines (see BNAffine): every BN except the
            # last folds into the NEXT conv's weights (conv is linear;
            # the constant-shift term becomes a conv over a tiny
            # constant map), and the last BN + ReLU + max folds into
            # per-channel max/min reductions — the (M, 8, 8, 512)
            # normalize passes (~99 ms of the 374 ms training step at
            # M = 12800, round-5 trace) never materialise.
            affine = None
            y = None
            for conv, bn in convs:
                if y is None:
                    y = conv(x, slice_map)
                else:
                    y = conv(y, in_affine=affine)
                affine = bn(y, use_running_average=not train)
            # last BN + ReLU + global max fold into per-channel
            # max/min reductions (monotonicity of x -> s*x + t per
            # sign of s). The win is modest — the max/min VJP
            # re-materialises (M, 8, 8, 512) indicator passes in the
            # backward — but measured net positive (367.5 vs 370.9
            # ms/step with an explicit normalize)
            sa, ta = affine
            xmax = jnp.max(y, axis=(1, 2)).astype(jnp.float32)
            xmin = jnp.min(y, axis=(1, 2)).astype(jnp.float32)
            pooled = nn.relu(sa * jnp.where(sa > 0, xmax, xmin) + ta)
            return pooled.astype(self.dtype)

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
