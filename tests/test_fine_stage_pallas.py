"""Fused fine-stage head kernel (ops/fine_stage_pallas) — correctness.

The kernel is a MEASURED NEGATIVE RESULT for dispatch (see BASELINE.md
round 5: every formulation loses to the unfused expansion-kernel +
XLA-regressor path because the conv-tap selection adds more
per-proposal MXU-latency-bound work than the fused HBM traffic saves),
kept in-tree with its harness (tools/try_fine_stage.py) as the
documented exploration. This test pins its math against the unfused
composition in interpret mode so the artifact stays correct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


LEVELS = ((16, 3), (8, 64), (4, 64), (2, 128))
PSIZE = 16
F = 64  # small regressor width keeps interpret mode fast


def test_fused_head_matches_unfused_composition(rng):
    from patch2pix_tpu.ops.fine_stage_pallas import (
        _segment_weights,
        bn_affine,
        fused_fine_head_pallas,
        head_prolog_xla,
    )
    from patch2pix_tpu.ops.patch_expand_pallas import (
        expand_scale_pair_xla,
        output_slice_map,
    )

    m = 16
    rows1, rows2 = [], []
    for t, c in LEVELS:
        rows1.append(jnp.asarray(
            rng.standard_normal((m, 4, t, t * c)), jnp.float32))
        rows2.append(jnp.asarray(
            rng.standard_normal((m, 4, t, t * c)), jnp.float32))
    rows1, rows2 = tuple(rows1), tuple(rows2)
    y1, x1, y2, x2 = (
        jnp.asarray(rng.integers(0, 2 * PSIZE, (m,)), jnp.int32)
        for _ in range(4)
    )
    cs = tuple(c for _, c in LEVELS)
    ds_list = tuple(PSIZE // t for t, _ in LEVELS)
    d = sum(cs)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 2 * d, F)) * 0.05,
                     jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, F, F)) * 0.05, jnp.float32)
    bn0 = (jnp.asarray(rng.uniform(0.5, 1.5, F), jnp.float32),
           jnp.asarray(rng.uniform(-0.2, 0.2, F), jnp.float32))
    bn1 = (jnp.asarray(rng.uniform(0.5, 1.5, F), jnp.float32),
           jnp.asarray(rng.uniform(-0.2, 0.2, F), jnp.float32))

    # unfused: expansion -> segmented conv0 -> bn -> conv1 -> bn ->
    # relu -> max, all in XLA f32
    outs = expand_scale_pair_xla(
        rows1, rows2, y1, x1, y2, x2, PSIZE, ds_list, jnp.float32)
    smap = output_slice_map(ds_list, cs, PSIZE)
    acc = None
    for x, sl in zip(outs, smap):
        ks = jnp.concatenate(
            [k0[:, :, o:o + s, :] for o, s in sl], axis=2
        ) if len(sl) > 1 else k0[:, :, sl[0][0]:sl[0][0] + sl[0][1], :]
        y = jax.lax.conv_general_dilated(
            x, ks, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    xb = acc * bn0[0] + bn0[1]
    yb = jax.lax.conv_general_dilated(
        xb, k1, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    yb = jnp.maximum(yb * bn1[0] + bn1[1], 0.0)
    want = jnp.max(yb, axis=(1, 2))

    # fused: prolog + kernel (interpret mode, f32)
    inv1, inv2, partial0 = head_prolog_xla(
        rows1, rows2, y1, x1, y2, x2, k0, PSIZE, jnp.float32)
    w0_segs = tuple(_segment_weights(k0, cs, jnp.float32))
    got = fused_fine_head_pallas(
        rows1[1:], rows2[1:], y1, x1, y2, x2, inv1, inv2, partial0,
        w0_segs, k1.reshape(9, F, F), bn0, bn1, PSIZE, jnp.float32,
        8, True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
