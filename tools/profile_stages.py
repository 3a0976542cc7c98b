"""Per-stage marginal timings of the inference pipeline on the real TPU.

Splits ``predict_fine`` into its stages (backbone, corr+pool,
mutual+NCN, extraction+delta, mid gather+regress, fine gather+regress)
and times each with the in-jit ``fori_loop`` marginal method (the only
honest timing on the relay backend — see bench.py). The stage sum
should roughly reproduce the bench number; discrepancies mean a fusion
boundary moved.

Usage::

    python tools/profile_stages.py [--change_stride] [--fine_cap 1200]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

H, W = 768, 1024
BATCH = 2
LO, HI = 2, 8


def marginal(fn, *args, lo=LO, hi=HI):
    def timed(iters):
        float(fn(*args, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def loopify(body_fn):
    """body_fn(x, i) -> scalar; returns jitted loop runner.

    The scalar is fed back into the (float) input each iteration so the
    body has a real inter-iteration data dependency — without it XLA
    hoists the loop-invariant body and the marginal time is ~0.
    """

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, carry):
            x, acc = carry
            s = body_fn(x, i)
            bump = (s * 1e-20).astype(x.dtype)
            return x + bump, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--change_stride", action="store_true")
    ap.add_argument("--fine_cap", type=int, default=None)
    args = ap.parse_args()

    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.models.patch2pix import Patch2Pix, _tileable
    from patch2pix_tpu.ops.match_extract import Matches

    cfg = ModelConfig(
        dtype="bfloat16", change_stride=args.change_stride
    ).resolved()
    model = Patch2Pix(config=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    small = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, small, small, ksize=2, ptmax=16,
        train=False,
    )
    im1 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, H, W, 3), jnp.float32)
    im2 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, H, W, 3), jnp.float32)

    apply = functools.partial(model.apply, variables)

    # ---- materialise stage inputs once ----
    feats1 = apply(im1, method=model.extract_pyramid)
    feats2 = apply(im2, method=model.extract_pyramid)
    corr, delta4d = apply(feats1[-1], feats2[-1], 2, method=model.coarse_corr)
    cm = apply(corr, delta4d, 2, method=model.coarse_matches)
    nb = corr.shape[3] * corr.shape[4]
    cm_half = Matches(cm.coords[:, :nb], cm.scores[:, :nb], cm.valid[:, :nb])
    if args.fine_cap and args.fine_cap < cm_half.coords.shape[1]:
        rank = jnp.where(cm_half.valid, cm_half.scores, -jnp.inf)
        order = jnp.argsort(-rank, axis=1)[:, : args.fine_cap]
        cm_half = Matches(
            jnp.take_along_axis(cm_half.coords, order[..., None], axis=1),
            jnp.take_along_axis(cm_half.scores, order, axis=1),
            jnp.take_along_axis(cm_half.valid, order, axis=1),
        )
    aligned = cfg.upsample == cfg.regressor.psize[0]
    mid_m, _ = apply(
        feats1, feats2, cm_half.coords, "mid", False, aligned,
        method=model.fine_match,
    )

    # ---- stage loops (each perturbs its input with a data dependency) ----
    def t_backbone():
        run = loopify(
            lambda x, i: jnp.sum(
                apply(x, method=model.extract_pyramid)[-1].astype(jnp.float32)
            ) * 1e-12
        )
        return marginal(run, im1)

    def t_coarse_corr():
        def body(x, i):
            c, _ = apply(x, feats2[-1], 2, method=model.coarse_corr)
            return jnp.sum(c) * 1e-12

        run = loopify(body)
        return marginal(run, feats1[-1] + 0.0)

    def t_extract():
        def body(x, i):
            c = apply(x, delta4d, 2, method=model.coarse_matches)
            return jnp.sum(c.coords) * 1e-12 + jnp.sum(c.scores)

        run = loopify(body)
        return marginal(run, corr)

    def t_stage(coords_in, stage, grid_aligned):
        def body(x, i):
            m, p = apply(
                feats1, feats2, x, stage, False, grid_aligned,
                method=model.fine_match,
            )
            return jnp.sum(m) * 1e-12 + jnp.sum(p) * 1e-12

        run = loopify(body)
        return marginal(run, coords_in)

    names_times = [
        ("backbone_x1", t_backbone()),
        ("corr_pool_mutual_ncn", t_coarse_corr()),
        ("extract_matches", t_extract()),
        ("mid_gather_regress", t_stage(cm_half.coords, "mid", aligned)),
        ("fine_gather_regress", t_stage(mid_m, "fine", False)),
    ]
    total = 0.0
    for name, t in names_times:
        ms = t * 1e3
        mult = 2 if name == "backbone_x1" else 1
        total += ms * mult
        print(f"{name:24s} {ms:8.2f} ms" + ("  (x2)" if mult == 2 else ""))
    print(f"{'stage sum':24s} {total:8.2f} ms  "
          f"({BATCH / (total / 1e3):.2f} pairs/s)")


if __name__ == "__main__":
    main()
