"""Throughput vs batch size for the fine-matching pipeline.

Same marginal in-jit methodology as bench.py; sweeps the pair batch to
find the serving batch that maximises pairs/s/chip at the validation
image scale (1024x768).

Usage: python tools/bench_batch_sweep.py [--change_stride] [--batches 1,2,4]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

H, W = 768, 1024
LO, HI = 2, 8


def build(change_stride: bool):
    from patch2pix_tpu.config import ModelConfig
    from patch2pix_tpu.models.patch2pix import Patch2Pix

    model = Patch2Pix(
        config=ModelConfig(dtype="bfloat16", change_stride=change_stride).resolved()
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    small = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = model.init(
        {"params": k1, "proposal": k2}, small, small, ksize=2, ptmax=16,
        train=False,
    )

    @functools.partial(jax.jit, static_argnums=3)
    def predict_loop(variables, im1, im2, iters):
        def body(i, carry):
            im1c, acc = carry
            fine, mid, coarse = model.apply(
                variables, im1c, im2, ksize=2, fine_cap=1200,
                method=model.predict_fine,
            )
            bump = jnp.mean(fine.coords) * 1e-12
            return im1c + bump, acc + jnp.sum(fine.scores)

        _, acc = jax.lax.fori_loop(0, iters, body, (im1, jnp.float32(0.0)))
        return acc

    return variables, predict_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--change_stride", action="store_true")
    ap.add_argument("--batches", type=str, default="1,2,4,8")
    args = ap.parse_args()

    variables, predict_loop = build(args.change_stride)
    for b in [int(x) for x in args.batches.split(",")]:
        im1 = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, 3), jnp.float32)
        im2 = jax.random.normal(jax.random.PRNGKey(2), (b, H, W, 3), jnp.float32)

        def timed(iters):
            float(predict_loop(variables, im1, im2, iters))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(predict_loop(variables, im1, im2, iters))
                best = min(best, time.perf_counter() - t0)
            return best

        try:
            per_iter = (timed(HI) - timed(LO)) / (HI - LO)
        except Exception as e:  # OOM at large batch
            print(f"B={b}: failed ({type(e).__name__})")
            continue
        print(f"B={b}: {per_iter * 1e3:8.2f} ms/iter  {b / per_iter:7.2f} pairs/s")


if __name__ == "__main__":
    main()
