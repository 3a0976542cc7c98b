"""Pallas kernel for the fold-out conv4d's outer-tap shift-add.

``conv4d_fold_out`` (ops/conv4d.py) reduces the 4D consensus conv to an
ordinary 2D convolution emitting one output channel per outer (h1, w1)
tap, followed by

    out[f] = bias + sum_t mask_t[f] * z[t, f + s_t]

over the flat f = (b*h1 + i)*w1 + j cell index, where s_t is the flat
shift of tap t and mask_t restores SAME zero-padding at grid edges
(ops/conv4d.py ``_flat_shift_masks``). The ideal cost is one read of z
and one write of out (~0.5 GB at the change_stride eval scale). XLA
lowers the pad+slice+add chain as materialised padded copies of the
whole z tensor per symmetric branch (measured ~9 ms/iter); this kernel
does it with 9 DMA windows per output block and in-VMEM masked
accumulation instead.

The masks are recomputed in-kernel from the flat index (two integer
div/mods + four compares on an (nb, 1) iota) — no mask tensors in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3  # NCN kernel size; taps = K*K


def _pick_nb(n: int, row_bytes: int, budget: int = 6 << 20) -> int:
    """Largest multiple-of-8 divisor of n whose (window + f32
    accumulator + double-buffered output) VMEM footprint stays under
    budget. A multiple of 8 keeps every DMA start's sublane residue
    static (see _make_kernel)."""
    for nb in range(min(n - n % 8, 2048), 0, -8):
        if n % nb == 0 and nb * row_bytes * (2 + 4 + 4) <= budget:
            return nb
    return 0


def _make_kernel(nb: int, h1: int, w1: int, p: int, taps):
    def kernel(zp_hbm, bias_ref, o_ref, win, sem):
        """DMA starts must be sublane(8)-aligned: nb % 8 == 0 makes the
        misalignment of base + p + s_t the STATIC residue
        (p + s_t) % 8, so each tap DMAs an 8-row-larger window from the
        aligned-down start and applies a static sublane slice."""
        i = pl.program_id(0)
        base = i * nb
        f = base + jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
        row = (f // w1) % h1
        col = f % w1
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        for t, (di, dj, s) in enumerate(taps):
            delta = (p + s) % 8
            cp = pltpu.make_async_copy(
                zp_hbm.at[t, pl.ds(base + (p + s) - delta, nb + 8)], win, sem
            )
            cp.start()
            cp.wait()
            ok = (
                (row + (di - 1) >= 0) & (row + (di - 1) < h1)
                & (col + (dj - 1) >= 0) & (col + (dj - 1) < w1)
            )
            v = win[pl.ds(delta, nb), :].astype(jnp.float32)
            acc = acc + v * ok.astype(jnp.float32)
        o_ref[...] = acc + bias_ref[0]

    return kernel


def _pick_hb(hw: int, np_: int, n: int, budget: int = 12 << 20) -> int:
    """Largest multiple-of-8 divisor of hw fitting the v2 kernel's VMEM
    footprint: double-buffered (9, hb, Np) bf16 input block + f32
    accumulator + double-buffered (hb, n) f32 output block."""
    for hb in range(min(hw - hw % 8, 256), 0, -8):
        if hw % hb == 0 and hb * (9 * np_ * 2 * 2 + n * 4 * 3) <= budget:
            return hb
    return 0


def tap_sum_feasible_t(hw: int, np_: int, n: int) -> bool:
    """v2 needs 128-lane granularity on the flat-N axis (rolls/slices
    along lanes) and a feasible row block."""
    return n % 128 == 0 and np_ % 128 == 0 and _pick_hb(hw, np_, n) > 0


def _make_kernel_t(hb: int, h1: int, w1: int, p: int, np_: int, n: int,
                   taps):
    def kernel(zt_ref, bias_ref, o_ref):
        """Transposed-domain shift-add: the flat cell index f lives on
        the LANE axis (the fold-out conv's native layout is
        (hw, tap, N) with N minor), so each tap is a static lane
        rotate instead of a sublane-windowed DMA — no relayout copy
        ever touches the 9x z tensor.

        Mosaic rotates are 32-bit only: each tap row upcasts to f32
        first (the accumulator is f32 regardless)."""
        f = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        row = (f // w1) % h1
        col = f % w1
        acc = jnp.zeros((hb, n), jnp.float32)
        for t, (di, dj, s) in enumerate(taps):
            v = pltpu.roll(
                zt_ref[:, t, :].astype(jnp.float32), np_ - (p + s), axis=1
            )[:, :n]
            ok = (
                (row + (di - 1) >= 0) & (row + (di - 1) < h1)
                & (col + (dj - 1) >= 0) & (col + (dj - 1) < w1)
            ).astype(jnp.float32)
            acc = acc + v * ok
        o_ref[...] = acc + bias_ref[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("bs", "h1", "w1", "interpret")
)
def tap_sum_pallas_t(
    zt: jax.Array,
    bias: jax.Array,
    bs: int,
    h1: int,
    w1: int,
    interpret: bool = False,
) -> jax.Array:
    """Transposed tap-sum: zt ``(HW, 9, Np)`` -> ``(HW, N)`` f32.

    ``Np = p + N + p_right`` with ``Np % 128 == 0`` and
    ``p_right >= p`` — the conv-input prepad convention of
    ``conv4d_fold_out``'s v2 path. zt is the fold-out conv's CNHW
    output viewed transposed — physically a BITCAST (the conv's native
    layout is ``{1,0,2}`` = (hw, tap, N) with N minor), which is the
    whole point: the v1 kernel's standard-layout operand cost a 347 MB
    relayout copy per symmetric branch at the change_stride eval scale
    (see tools/profile_ncn_layout.py). Bit-identical to
    :func:`tap_sum_pallas` (same 9-term f32 adds in the same order).
    """
    hw, t9, np_ = zt.shape
    n = bs * h1 * w1
    pad = K // 2
    p = pad * w1 + pad
    assert t9 == K * K and np_ >= n + 2 * p and np_ % 128 == 0, (
        zt.shape, n, p)
    taps = [
        (di, dj, (di - pad) * w1 + (dj - pad))
        for di in range(K)
        for dj in range(K)
    ]
    hb = _pick_hb(hw, np_, n)
    if hb == 0 or n % 128 != 0:
        raise ValueError(
            f"tap_sum_pallas_t infeasible for zt {zt.shape} (n={n})"
        )
    return pl.pallas_call(
        _make_kernel_t(hb, h1, w1, p, np_, n, taps),
        grid=(hw // hb,),
        in_specs=[
            pl.BlockSpec((hb, t9, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((hb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(zt, bias.astype(jnp.float32).reshape(1))


@functools.partial(
    jax.jit, static_argnames=("bs", "h1", "w1", "interpret", "prepadded")
)
def tap_sum_pallas(
    z: jax.Array,
    bias: jax.Array,
    bs: int,
    h1: int,
    w1: int,
    interpret: bool = False,
    prepadded: bool = False,
) -> jax.Array:
    """z ``(9, N, M)`` (N = bs*h1*w1, M = flattened minor dims) ->
    ``(N, M)`` float32: bias + masked outer-tap shift-add.

    ``prepadded``: z already carries the (p, p+8) zero rows on axis 1
    (callers can pad the CONV INPUT instead — 9x less pad traffic
    than padding the conv output here; conv of zero rows is zero, and
    the pad rows are masked regardless).
    """
    pad = K // 2
    p = pad * w1 + pad
    if prepadded:
        t9, n_padded, m = z.shape
        n = n_padded - 2 * p - 8
        assert t9 == K * K and n == bs * h1 * w1
        zp = z
    else:
        t9, n, m = z.shape
        assert t9 == K * K and n == bs * h1 * w1
        # +8 tail margin: each DMA window is 8 rows larger than nb so
        # the aligned-down start never reads past the end
        zp = jnp.pad(z, ((0, 0), (p, p + 8), (0, 0)))
    taps = [
        (di, dj, (di - pad) * w1 + (dj - pad))
        for di in range(K)
        for dj in range(K)
    ]
    nb = _pick_nb(n, m * z.dtype.itemsize)
    if nb == 0:
        raise ValueError(
            f"tap_sum_pallas: no multiple-of-8 block of n={n} fits the "
            f"VMEM budget at row_bytes={m * z.dtype.itemsize} "
            f"(z shape {z.shape}); use the jnp fold-out path instead"
        )
    return pl.pallas_call(
        _make_kernel(nb, h1, w1, p, taps),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded z in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb + 8, m), z.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(zp, bias.astype(jnp.float32).reshape(1))
