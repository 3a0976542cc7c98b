"""Op-level attribution of the training step via a jax.profiler trace.

Same methodology as tools/profile_trace.py, applied to the
best-model-scale train step (batch 4, 480x320, ptmax 400, panc 8):
the step is iterated inside one jit via lax.scan and the xplane trace
is aggregated per HLO op.

Usage: python tools/profile_train_step.py [--top 50] [--iters 3]
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ht", type=int, default=320)
    ap.add_argument("--wt", type=int, default=480)
    ap.add_argument("--ptmax", type=int, default=400)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from patch2pix_tpu.config import ModelConfig, OptimConfig
    from patch2pix_tpu.data.synthetic import synthetic_batch
    from patch2pix_tpu.models.patch2pix import Patch2Pix
    from patch2pix_tpu.train.state import create_train_state, make_optimizer
    from patch2pix_tpu.train.step import make_train_step
    from tools.profile_trace import print_top_ops

    model = Patch2Pix(config=ModelConfig(dtype="bfloat16").resolved())
    optim_cfg = OptimConfig(lr_init=5e-4)
    state = create_train_state(
        rng=jax.random.PRNGKey(0), model=model, optim_cfg=optim_cfg,
        image_shape=(1, 96, 128, 3),
    )
    tx = make_optimizer(optim_cfg, state.params)
    step = make_train_step(model, tx, ksize=2, ptmax=args.ptmax, remat=args.remat)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.RandomState(7), args.batch, args.ht, args.wt
        ).items()
    }

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

    _, loss = loop(state, batch, args.iters)
    float(loss)  # compile + warm

    log_dir = tempfile.mkdtemp(prefix="p2p_train_trace_")
    jax.profiler.start_trace(log_dir)
    _, loss = loop(state, batch, args.iters)
    float(loss)
    jax.profiler.stop_trace()

    pbs = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not pbs:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    print_top_ops(pbs[0], args.top)
    print(f"(trace: {pbs[0]}; durations cover {args.iters} steps)")


if __name__ == "__main__":
    main()
