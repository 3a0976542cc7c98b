"""Benchmark: Patch2Pix fine-matching throughput (pairs/s/chip).

Runs the full jitted inference pipeline (backbone -> 4D correlation ->
NCN conv4d -> match extraction -> mid+fine regression) at the
reference's validation image scale (max dim 1024,
/root/reference/utils/train/eval_epoch_immatch.py:14) and prints ONE
JSON line with pairs/s on the current default JAX backend.

Timing methodology: the remote-TPU relay used in this environment has
~30 ms host round-trip latency and an optimistic ``block_until_ready``,
so per-call host timing is meaningless. Instead the pipeline is
iterated INSIDE one jit via ``lax.fori_loop`` with a data dependency
between iterations (so XLA cannot hoist the loop body), and the
marginal per-iteration time between two loop lengths is reported.

The reference never measured throughput (only total eval wall time,
eval_epoch_immatch.py:81-83), so ``vs_baseline`` is reported against
the round-1 TPU measurement in BENCH_BASELINE (self-relative; >1.0
means faster than round 1).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

# pairs/s on 1x TPU v5 lite chip, round 1 (B=2, 1024x768, marginal timing).
BENCH_BASELINE = 6.9959

H, W = 768, 1024  # reference val scale, multiples of upsample*ksize=32
BATCH = 2
ITERS_LO, ITERS_HI = 2, 10


def build(change_stride: bool = False):
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
            # fine_cap=1200 is the Matcher default (evaluation/matcher.py);
            # a no-op at stride 16 (nb=768 rows), the dominant saving at
            # change_stride (nb=3072, mostly invalid padding rows)
            fine, mid, coarse = model.apply(
                variables, im1c, im2, ksize=2, fine_cap=1200,
                method=model.predict_fine,
            )
            # feed a scalar of the output back into the next input: a
            # real data dependency so the loop body cannot be hoisted
            bump = jnp.mean(fine.coords) * 1e-12
            return im1c + bump, acc + jnp.sum(fine.scores)

        _, acc = jax.lax.fori_loop(0, iters, body, (im1, jnp.float32(0.0)))
        return acc

    return variables, predict_loop


def measure(change_stride: bool, batch: int = BATCH) -> float:
    variables, predict_loop = build(change_stride)
    im1 = jax.random.normal(jax.random.PRNGKey(1), (batch, H, W, 3), jnp.float32)
    im2 = jax.random.normal(jax.random.PRNGKey(2), (batch, H, W, 3), jnp.float32)

    def timed(iters):
        float(predict_loop(variables, im1, im2, iters))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(predict_loop(variables, im1, im2, iters))  # host sync
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(ITERS_LO)
    t_hi = timed(ITERS_HI)
    per_iter = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    return batch / per_iter


def main():
    pairs_per_s = measure(change_stride=False)
    # the reference's BEST-model configuration (change_stride=True,
    # upsample 8, /root/reference/README.md:74-80): 16x larger 4D
    # volume at the same image size — reported alongside the headline
    # so both deployment configs have tracked numbers
    pairs_per_s_cs = measure(change_stride=True)
    # serving-batch winners from the round-4 batch sweep (BASELINE.md:
    # u16 B=1 56.2 / B=2 49.9; cs B=4 26.4 / B=2 25.8): the latency-
    # optimal u16 batch is 1 and the cs throughput-optimal batch is 4
    pairs_per_s_b1 = measure(change_stride=False, batch=1)
    pairs_per_s_cs_b4 = measure(change_stride=True, batch=4)

    vs = pairs_per_s / BENCH_BASELINE if BENCH_BASELINE else 1.0
    print(
        json.dumps(
            {
                "metric": f"patch2pix_fine_match_pairs_per_s_chip_{W}x{H}",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 4),
                "extra": {
                    f"change_stride_pairs_per_s_chip_{W}x{H}": round(
                        pairs_per_s_cs, 4
                    ),
                    "best_batch_pairs_per_s_chip": round(pairs_per_s_b1, 4),
                    "best_batch": 1,
                    "change_stride_best_batch_pairs_per_s_chip": round(
                        pairs_per_s_cs_b4, 4
                    ),
                    "change_stride_best_batch": 4,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
