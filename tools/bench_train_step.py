"""Marginal-timed training step at the reference best-model scale.

batch 4, 480x320, ptmax 400, panc 8 (the 48 GB-GPU configuration of
/root/reference/README.md:82-84). Methodology as bench.py: the step is
iterated inside one jit via lax.scan threading the TrainState (a real
data dependency), and the marginal per-step time between two loop
lengths is reported — per-call host timing is meaningless through the
remote-TPU relay.

Usage: python tools/bench_train_step.py [--batch 4] [--lo 2 --hi 6]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ht", type=int, default=320)
    ap.add_argument("--wt", type=int, default=480)
    ap.add_argument("--ptmax", type=int, default=400)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=6)
    ap.add_argument("--remat", default="auto",
                    choices=["auto", "both", "fine", "none", "dots"])
    args = ap.parse_args()

    from patch2pix_tpu.config import ModelConfig, OptimConfig
    from patch2pix_tpu.data.synthetic import synthetic_batch
    from patch2pix_tpu.models.patch2pix import Patch2Pix
    from patch2pix_tpu.train.state import create_train_state, make_optimizer
    from patch2pix_tpu.train.step import make_train_step

    model = Patch2Pix(config=ModelConfig(dtype="bfloat16").resolved())
    optim_cfg = OptimConfig(lr_init=5e-4)
    state = create_train_state(
        rng=jax.random.PRNGKey(0), model=model, optim_cfg=optim_cfg,
        image_shape=(1, 96, 128, 3),
    )
    tx = make_optimizer(optim_cfg, state.params)
    step = make_train_step(model, tx, ksize=2, ptmax=args.ptmax,
                           remat=args.remat)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.RandomState(7), args.batch, args.ht, args.wt
        ).items()
    }

    # no donation: the same initial state is reused across timed calls
    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(state, batch, iters):
        def body(carry, i):
            st, _ = carry
            st2, metrics = step(st, batch, jax.random.fold_in(
                jax.random.PRNGKey(0), i))
            return (st2, metrics["loss/pair"]), None
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(iters))
        return st, loss

    def timed(iters):
        _, loss = loop(state, batch, iters)
        float(loss)  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, l2 = loop(state, batch, iters)
            float(l2)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(args.lo)
    t_hi = timed(args.hi)
    ms = (t_hi - t_lo) / (args.hi - args.lo) * 1e3
    mem = ""
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats and "peak_bytes_in_use" in stats:
        mem = f", peak {stats['peak_bytes_in_use'] / 1e9:.2f} GB"
    print(f"train step: {ms:.1f} ms/step = "
          f"{args.batch / ms * 1e3:.2f} pairs/s/chip "
          f"(batch {args.batch}, {args.wt}x{args.ht}, ptmax {args.ptmax}, "
          f"remat {args.remat}{mem})")


if __name__ == "__main__":
    main()
