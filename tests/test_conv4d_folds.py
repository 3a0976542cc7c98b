"""Tap-folded conv4d formulations vs the literal k^4 oracle.

The fold-in / fold-out paths implement their outer (h1, w1) taps as
masked FLAT-index shifts (ops/conv4d.py ``_outer_shifts_flat``), which
must exactly reproduce SAME zero padding — in particular the grid-edge
cells where a flat shift would otherwise wrap into the neighbouring
row. Non-square grids catch (h1, w1) index transpositions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patch2pix_tpu.ops.conv4d import (
    conv4d_fold_in,
    conv4d_fold_out,
    conv4d_xla_taps,
)
from tests.golden import conv4d_np


@pytest.mark.parametrize("shape", [(1, 3, 5, 4, 6), (2, 5, 3, 2, 4)])
@pytest.mark.parametrize("cin,cout", [(1, 16), (2, 4)])
def test_fold_in_matches_oracle(rng, shape, cin, cout):
    b, h1, w1, h2, w2 = shape
    x = rng.standard_normal((b, h1, w1, h2, w2, cin)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 3, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    want = conv4d_np(x, w, bias)
    got = np.asarray(conv4d_fold_in(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 3, 5, 4, 6), (2, 5, 3, 2, 4)])
@pytest.mark.parametrize("cin,cout", [(16, 1), (4, 2)])
def test_fold_out_matches_oracle(rng, shape, cin, cout):
    b, h1, w1, h2, w2 = shape
    x = rng.standard_normal((b, h1, w1, h2, w2, cin)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 3, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    want = conv4d_np(x, w, bias)
    got = np.asarray(
        conv4d_fold_out(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_folds_match_tap_path(rng):
    """All three XLA formulations agree on an asymmetric volume."""
    x = rng.standard_normal((1, 4, 7, 3, 5, 2)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 3, 3, 2, 3)) * 0.3).astype(np.float32)
    ref = np.asarray(conv4d_xla_taps(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(
        np.asarray(conv4d_fold_in(jnp.asarray(x), jnp.asarray(w))), ref,
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(conv4d_fold_out(jnp.asarray(x), jnp.asarray(w))), ref,
        rtol=1e-4, atol=1e-5,
    )


def test_tap_sum_pallas_interpret_matches_jnp(rng):
    """The Pallas shift-add kernel (interpret mode) == the jnp pad/slice
    formulation, including edge masks and bias, on a non-square grid."""
    from patch2pix_tpu.ops.conv4d import _flat_shift_masks
    from patch2pix_tpu.ops.tap_sum_pallas import tap_sum_pallas

    bs, h1, w1, m = 2, 4, 6, 8
    n = bs * h1 * w1
    z = rng.standard_normal((9, n, m)).astype(np.float32)
    bias = np.float32(0.37)

    masks = _flat_shift_masks(h1, w1, 3)
    want = np.full((n, m), bias, np.float32)
    zp = np.pad(z, ((0, 0), (w1 + 1, w1 + 1), (0, 0)))
    for t in range(9):
        di, dj = t // 3, t % 3
        s = (di - 1) * w1 + (dj - 1)
        view = zp[t, (w1 + 1) + s : (w1 + 1) + s + n]
        want += view * np.tile(masks[t], bs).astype(np.float32)[:, None]

    got = np.asarray(
        tap_sum_pallas(
            jnp.asarray(z), jnp.float32(bias), bs, h1, w1, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tap_sum_t_interpret_matches_v1_math(rng):
    """The transposed-domain (v2) kernel == the v1 shift-add math on a
    non-square grid, in interpret mode."""
    from patch2pix_tpu.ops.conv4d import _flat_shift_masks
    from patch2pix_tpu.ops.tap_sum_pallas import (
        tap_sum_feasible_t,
        tap_sum_pallas_t,
    )

    bs, h1, w1, hw = 1, 8, 16, 8
    n = bs * h1 * w1  # 128: v2 needs 128-lane granularity on flat N
    p = w1 + 1
    p_right = (-(n + p)) % 128
    while p_right < p:
        p_right += 128
    np_ = n + p + p_right
    assert tap_sum_feasible_t(hw, np_, n)
    z = rng.standard_normal((9, n, hw)).astype(np.float32)
    bias = np.float32(0.37)

    masks = _flat_shift_masks(h1, w1, 3)
    want = np.full((n, hw), bias, np.float32)
    zp = np.pad(z, ((0, 0), (p, p), (0, 0)))
    for t in range(9):
        di, dj = t // 3, t % 3
        s = (di - 1) * w1 + (dj - 1)
        want += zp[t, p + s : p + s + n] * np.tile(
            masks[t], bs
        ).astype(np.float32)[:, None]

    # v2 convention: zt (HW, 9, Np) with (p, p_right) zero pad rows
    zt = np.transpose(
        np.pad(z, ((0, 0), (p, p_right), (0, 0))), (2, 0, 1)
    )
    got = np.asarray(
        tap_sum_pallas_t(
            jnp.asarray(zt), jnp.float32(bias), bs, h1, w1, interpret=True
        )
    )
    np.testing.assert_allclose(got.T, want, rtol=1e-5, atol=1e-5)


def test_tap_sum_t_vjp_matches_autodiff(rng):
    """Custom VJP of the transposed-domain _tap_sum_t == autodiff of
    the explicit formulation."""
    from patch2pix_tpu.ops.conv4d import _flat_shift_masks, _tap_sum_t

    bs, h1, w1, hw = 1, 8, 16, 8
    n = bs * h1 * w1
    p = w1 + 1
    p_right = (-(n + p)) % 128
    while p_right < p:
        p_right += 128
    np_ = n + p + p_right
    z = jnp.asarray(rng.standard_normal((9, n, hw)), jnp.float32)
    bias = jnp.float32(0.1)
    g = jnp.asarray(rng.standard_normal((hw, n)), jnp.float32)

    def explicit(zf, b):
        masks = _flat_shift_masks(h1, w1, 3)
        out = jnp.full((n, hw), b, jnp.float32)
        zp = jnp.pad(zf, ((0, 0), (p, p), (0, 0)))
        for t in range(9):
            di, dj = t // 3, t % 3
            s = (di - 1) * w1 + (dj - 1)
            view = jax.lax.slice_in_dim(zp[t], p + s, p + s + n, axis=0)
            out = out + view * jnp.asarray(
                np.tile(masks[t], bs), jnp.float32
            )[:, None]
        return out.T  # (hw, n), the v2 output orientation

    zt = jnp.transpose(jnp.pad(z, ((0, 0), (p, p_right), (0, 0))), (2, 0, 1))
    out, vjp = jax.vjp(lambda zt, b: _tap_sum_t(zt, b, bs, h1, w1), zt, bias)
    out_ref, vjp_ref = jax.vjp(explicit, z, bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    dzt, db = vjp(g)
    dz_ref, db_ref = vjp_ref(g)
    # pad lanes never contribute -> zero cotangent there
    np.testing.assert_array_equal(np.asarray(dzt[:, :, :p]), 0.0)
    np.testing.assert_array_equal(np.asarray(dzt[:, :, p + n:]), 0.0)
    np.testing.assert_allclose(
        np.transpose(np.asarray(dzt[:, :, p : p + n]), (1, 2, 0)),
        np.asarray(dz_ref), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(db_ref), rtol=1e-5, atol=1e-5
    )


def test_tap_sum_vjp_matches_autodiff(rng):
    """Custom VJP of _tap_sum == autodiff of the explicit formulation."""
    from patch2pix_tpu.ops.conv4d import _flat_shift_masks, _tap_sum

    bs, h1, w1, m = 1, 4, 6, 4  # n % 8 == 0 (kernel block constraint)
    n = bs * h1 * w1
    z = jnp.asarray(rng.standard_normal((9, n, m)), jnp.float32)
    bias = jnp.float32(0.1)
    g = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)

    def explicit(zf, b):
        masks = _flat_shift_masks(h1, w1, 3)
        out = jnp.full((n, m), b, jnp.float32)
        zp = jnp.pad(zf, ((0, 0), (w1 + 1, w1 + 1), (0, 0)))
        for t in range(9):
            di, dj = t // 3, t % 3
            s = (di - 1) * w1 + (dj - 1)
            view = jax.lax.slice_in_dim(zp[t], (w1 + 1) + s, (w1 + 1) + s + n, axis=0)
            out = out + view * jnp.asarray(np.tile(masks[t], bs), jnp.float32)[:, None]
        return out

    # _tap_sum takes PREPADDED z (callers pad the fold-out conv input)
    p = w1 + 1
    zpad = jnp.pad(z, ((0, 0), (p, p + 8), (0, 0)))
    out, vjp = jax.vjp(lambda zf, b: _tap_sum(zf, b, bs, h1, w1), zpad, bias)
    out_ref, vjp_ref = jax.vjp(explicit, z, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5)
    dzp, db = vjp(g)
    dz_ref, db_ref = vjp_ref(g)
    # pad rows never contribute -> zero cotangent there
    np.testing.assert_array_equal(np.asarray(dzp[:, :p]), 0.0)
    np.testing.assert_array_equal(np.asarray(dzp[:, p + n:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(dzp[:, p : p + n]), np.asarray(dz_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-5, atol=1e-5)


def test_fold_paths_exact_in_spmd_mode(rng):
    """The per-batch-flat SPMD formulations equal the merged-flat
    single-chip ones (and the direct-tap oracle)."""
    from patch2pix_tpu.ops.dispatch import spmd_safe_dispatch
    from patch2pix_tpu.ops.conv4d import (
        conv4d_fold_in, conv4d_fold_out, conv4d_xla_taps,
    )

    x1 = jnp.asarray(rng.standard_normal((2, 4, 5, 3, 4, 1)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 1, 4)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 4, 5, 3, 4, 4)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4, 1)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(1), jnp.float32)

    plain_in = conv4d_fold_in(x1, w1, b1)
    plain_out = conv4d_fold_out(x2, w2, b2)
    with spmd_safe_dispatch():
        spmd_in = conv4d_fold_in(x1, w1, b1)
        spmd_out = conv4d_fold_out(x2, w2, b2)
    np.testing.assert_allclose(np.asarray(spmd_in), np.asarray(plain_in),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmd_out), np.asarray(plain_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmd_in),
                               np.asarray(conv4d_xla_taps(x1, w1, b1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(spmd_out),
                               np.asarray(conv4d_xla_taps(x2, w2, b2)),
                               rtol=1e-4, atol=1e-4)
