"""Blocked Pallas TPU kernel for the 4D neighbourhood-consensus conv.

The BASELINE.json centerpiece ("conv4d correlation -> blocked Pallas
kernel"). The reference emulates conv4d with a Python loop of cuDNN
conv3d calls (/root/reference/networks/ncn/conv4d.py:12-74); XLA
formulations either re-read the 4D volume k^2 times or pay the MXU's
128-lane Cout padding (1 real output channel -> ~100x wasted FLOPs).

Kernel design — every shape is chosen so NO Mosaic relayout (vector
reshape / unaligned DMA) ever happens:

  * the padded volume is stored as ``(B, h1p, w1p, h2p, w2pp*Cin)``
    where ``w2pp`` is padded so the flat minor dim is a multiple of
    128 lanes — each (batch, h1-row) program DMAs its 3-row window
    HBM -> VMEM exactly once,
  * the filter is pre-baked host-side into 27 shift-structured panels
    ``W[(di,dj), dk] in R^{w2pp*Cin x w2*Cout}`` with
    ``W[(q+dl)*Cin+ci, q*Cout+o] = w[di,dj,dk,dl,ci,o]`` — the whole
    (dl, ci) -> (q, o) contraction INCLUDING the w2-axis shifts
    becomes one K=w2pp*Cin matmul per (tap-row, dk),
  * the kernel loops over w1 columns: 27 MXU matmuls
    ``(h2, w2pp*Cin) @ (w2pp*Cin, w2*Cout)`` accumulate in f32, one
    output row written per iteration. Panels are plain 2D matrices
    throughout — no reshapes, no transposes.

Economical when ``w2*Cout*Cin`` is modest — both NCN layers (1->16 and
16->1) dispatch here automatically on TPU backends (see
:func:`patch2pix_tpu.ops.conv4d.conv4d`); big-Cin*Cout configurations
stay on the XLA im2col path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3  # the NCN's conv4d kernel size


def _pick_w2pp(w2: int, cin: int) -> int:
    """Smallest padded w2 with (w2pp*cin) % 128 == 0 and w2pp >= w2+2."""
    w2pp = w2 + 2
    while (w2pp * cin) % 128 != 0:
        w2pp += 1
    return w2pp


def _pick_h2pp(h2: int, dtype) -> int:
    """Pad h2+2 up to a full sublane tile (8 f32 / 16 bf16) so DMA
    windows never touch partial tiles."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    h2p = h2 + 2
    return ((h2p + sub - 1) // sub) * sub


def _weight_panels(w: jax.Array, w2: int, w2pp: int) -> jax.Array:
    """(3,3,3,3,Cin,Cout) -> (9, 3, w2pp*Cin, w2*Cout) shift panels.

    One vectorised scatter: index arrays are static numpy, values are
    the (traced) filter broadcast over the w2 output positions.
    """
    _, _, _, _, cin, cout = w.shape
    # static index grids over (di, dj, dk, dl, ci, o, q)
    di, dj, dk, dl, ci, o, q = np.meshgrid(
        np.arange(K), np.arange(K), np.arange(K), np.arange(K),
        np.arange(cin), np.arange(cout), np.arange(w2), indexing="ij",
    )
    t_idx = (di * K + dj).ravel()
    dk_idx = dk.ravel()
    row_idx = ((q + dl) * cin + ci).ravel()
    col_idx = (q * cout + o).ravel()
    vals = jnp.broadcast_to(
        w[..., None], (K, K, K, K, cin, cout, w2)
    ).reshape(-1)
    panels = jnp.zeros((K * K, K, w2pp * cin, w2 * cout), w.dtype)
    return panels.at[t_idx, dk_idx, row_idx, col_idx].set(vals)


def _pick_jb(w1: int, max_jb: int = 8) -> int:
    """Largest divisor of w1 up to max_jb: w1-columns processed per
    matmul so the MXU sees M = jb*h2 rows instead of h2."""
    for jb in range(min(max_jb, w1), 0, -1):
        if w1 % jb == 0:
            return jb
    return 1


def _pick_wb(
    w1: int, bytes_per_col: int, out_bytes_per_col: int,
    fixed_bytes: int, budget: int = 12 << 20,
) -> int:
    """w1-block size: largest divisor of w1 whose VMEM working set
    (3-row DMA window of wb+2 columns + the wb-column output block +
    the resident weight panels) fits the budget. At stride-16 eval
    scale the whole row fits (wb = w1, one DMA per (b, i)); at
    change_stride scale the window would be ~30 MB, so rows are split
    — the 2-column overlap between adjacent blocks is the only re-read
    traffic."""
    for wb in range(w1, 0, -1):
        used = (
            (wb + 2) * bytes_per_col * K
            # output blocks are double-buffered by the pipeline
            + 2 * wb * out_bytes_per_col
            + fixed_bytes
        )
        if w1 % wb == 0 and used <= budget:
            return wb
    return 1


def _make_kernel(h2: int, w2: int, cin: int, cout: int, h2p: int, w2pp: int,
                 jb: int):
    def kernel(x_hbm, w_ref, b_ref, o_ref, xs, sem):
        """One (batch, h1-row, w1-block) program.

        x_hbm: (B, h1p, w1p, h2p, w2pp*Cin) padded volume in HBM.
        w_ref: (9, 3, w2pp*Cin, w2*Cout) shift panels in VMEM.
        b_ref: (1, w2*Cout) bias row (tiled over q) in VMEM.
        o_ref: (1, 1, wb, h2, w2*Cout) output block in VMEM.
        xs:    (3, wb+2, h2p, w2pp*Cin) VMEM scratch (the DMA window).

        Processes ``jb`` w1-columns per loop step: column c uses rows
        [c+dj] of the window, so a jb-column block uses the contiguous
        row slice [j+dj, j+dj+jb) — stacked into one (jb*h2, K) matmul
        per tap (leading-dim reshapes only, no lane movement).
        """
        b = pl.program_id(0)
        i = pl.program_id(1)
        jw = pl.program_id(2)
        wb = o_ref.shape[2]

        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i, K), pl.ds(jw * wb, wb + 2)], xs, sem
        )
        cp.start()
        cp.wait()

        def col_body(jj, _):
            j = jj * jb
            acc = jnp.zeros((jb * h2, w2 * cout), jnp.float32)
            for t in range(K * K):
                di, dj = t // K, t % K
                blk = xs[di, pl.ds(j + dj, jb)]  # (jb, h2p, w2pp*Cin)
                for dk in range(K):
                    panel = jax.lax.slice(
                        blk, (0, dk, 0), (jb, dk + h2, w2pp * cin)
                    ).reshape(jb * h2, w2pp * cin)
                    acc = acc + jnp.dot(
                        panel, w_ref[t, dk],
                        preferred_element_type=jnp.float32,
                    )
            out = acc + b_ref[0][None, :]
            o_ref[0, 0, pl.ds(j, jb)] = out.reshape(
                jb, h2, w2 * cout
            ).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, wb // jb, col_body, 0)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv4d_pallas(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """SAME 4D convolution (k=3, stride 1) as a blocked Pallas kernel.

    Args/returns match :func:`patch2pix_tpu.ops.conv4d.conv4d`:
    x ``(B, h1, w1, h2, w2, Cin)``, w ``(3, 3, 3, 3, Cin, Cout)``,
    optional bias ``(Cout,)`` -> ``(B, h1, w1, h2, w2, Cout)`` float32.

    Differentiable via a custom VJP (NCN weak-supervision pretraining
    needs grads through the consensus filter): the adjoint of a SAME
    stride-1 conv4d is a conv4d with spatially-flipped, in/out-swapped
    filters (runs on the XLA tap path), and the weight gradient is a
    per-tap tensor contraction.
    """
    return _conv4d_pallas_impl(x, w, b, interpret, out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _conv4d_pallas_impl(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    assert w.shape[:4] == (K, K, K, K), f"pallas conv4d is k=3 only, got {w.shape}"
    bs, h1, w1, h2, w2, cin = x.shape
    cout = w.shape[-1]
    pad = K // 2
    h2p = _pick_h2pp(h2, x.dtype)
    w2pp = _pick_w2pp(w2, cin)

    xp = jnp.pad(
        x,
        (
            (0, 0), (pad, pad), (pad, pad), (pad, h2p - h2 - pad),
            (pad, w2pp - w2 - pad), (0, 0),
        ),
    ).reshape(bs, h1 + 2 * pad, w1 + 2 * pad, h2p, w2pp * cin)
    panels = _weight_panels(w.astype(x.dtype), w2, w2pp)
    bias = jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32)
    bias_row = jnp.tile(bias, (w2,)).reshape(1, w2 * cout)

    odtype = jnp.dtype(jnp.float32 if out_dtype is None else out_dtype)
    bytes_per_col = h2p * w2pp * cin * x.dtype.itemsize
    out_bytes_per_col = h2 * w2 * cout * odtype.itemsize
    jb_max = _pick_jb(w1)
    panel_bytes = (
        K * K * K * w2pp * cin * w2 * cout * x.dtype.itemsize
        # the f32 accumulator tile inside col_body
        + jb_max * h2 * w2 * cout * 4
    )
    wb = _pick_wb(w1, bytes_per_col, out_bytes_per_col, panel_bytes)
    jb = _pick_jb(wb)
    out = pl.pallas_call(
        _make_kernel(h2, w2, cin, cout, h2p, w2pp, jb),
        grid=(bs, h1, w1 // wb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded volume in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, wb, h2, w2 * cout),
            lambda b_, i, jw: (b_, i, jw, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bs, h1, w1, h2, w2 * cout),
            jnp.float32 if out_dtype is None else jnp.dtype(out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, wb + 2 * pad, h2p, w2pp * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the _pick_wb working-set model keeps blocks SMALL for pipeline
        # overlap; the compiler's default 16 MiB scoped-vmem ceiling is
        # raised so double-buffering overheads it adds on top never
        # hard-fail the compile (v5e VMEM is 128 MiB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, panels, bias_row)
    return out.reshape(bs, h1, w1, h2, w2, cout)


def _conv4d_pallas_fwd(x, w, b, interpret, out_dtype):
    return (
        _conv4d_pallas_impl(x, w, b, interpret, out_dtype),
        (x, w, b is not None),
    )


def _conv4d_pallas_bwd(interpret, out_dtype, res, g):
    from patch2pix_tpu.ops.conv4d import conv4d_xla_taps

    x, w, has_bias = res
    g = g.astype(x.dtype)
    # dx: adjoint conv — flip all four spatial axes, swap Cin/Cout
    w_rev = jnp.flip(w, axis=(0, 1, 2, 3)).transpose(0, 1, 2, 3, 5, 4)
    dx = conv4d_xla_taps(g, w_rev).astype(x.dtype)
    # dw[a,b,c,d,ci,co] = sum over cells of x[shifted] * g
    pad = K // 2
    xp = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (pad, pad), (0, 0))
    )
    bs, h1, w1, h2, w2, cout = g.shape
    taps = []
    for di in range(K):
        for dj in range(K):
            for dk in range(K):
                for dl in range(K):
                    xt = xp[
                        :, di : di + h1, dj : dj + w1,
                        dk : dk + h2, dl : dl + w2, :,
                    ]
                    taps.append(
                        jnp.einsum(
                            "bijklc,bijklo->co", xt, g,
                            preferred_element_type=jnp.float32,
                        )
                    )
    dw = jnp.stack(taps).reshape(K, K, K, K, *taps[0].shape).astype(w.dtype)
    db = (
        jnp.sum(g, axis=(0, 1, 2, 3, 4)).astype(jnp.float32)
        if has_bias else None
    )
    return dx, dw, db


conv4d_pallas.defvjp(_conv4d_pallas_fwd, _conv4d_pallas_bwd)
