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
