"""Training-convergence demonstration at reference best-model scale.

Trains the full Patch2Pix stack (frozen backbone + regressors, exactly
the reference recipe semantics, /root/reference/train_patch2pix.py:77-222)
on synthetic epipolar-consistent planar-scene pairs with exact ground
truth F (patch2pix_tpu/data/synthetic.py) and records the loss curves
plus a held-out epipolar-error metric — evidence the jitted/sharded
train step LEARNS, not just runs.

Defaults mirror the reference best-model configuration: batch 4,
480x320 images, ptmax 400, panc 8, lr 5e-4 (README.md:74-80). A fixed
pool of pairs is pre-generated on the host and cycled.

Usage:
  python tools/train_synth_demo.py [--steps 300] [--out artifacts/synth_train]
"""

from __future__ import annotations

import argparse
import csv
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from patch2pix_tpu.config import ModelConfig, OptimConfig
from patch2pix_tpu.data.synthetic import synthetic_batch
from patch2pix_tpu.models.patch2pix import Patch2Pix
from patch2pix_tpu.ops.geometry import sampson_dist_batched
from patch2pix_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ht", type=int, default=320)
    ap.add_argument("--wt", type=int, default=480)
    ap.add_argument("--ptmax", type=int, default=400)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--pool", type=int, default=64, help="distinct pairs")
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--out", default="artifacts/synth_train")
    ap.add_argument(
        "--refresh_pool", action="store_true",
        help="regenerate the training pool with FRESH synthetic pairs "
        "between scan chunks (unlimited data): the fixed pool is "
        "memorised within a few epochs and the held-out metric turns "
        "back up; fresh data keeps it falling. Costs one pool H2D "
        "per chunk (~235 MB per eval_every steps at the defaults).",
    )
    ap.add_argument(
        "--unfreeze_tail", action="store_true",
        help="train the backbone's layer3 too (the reference's "
        "freeze_feat<87 regimes): with the random-init backbone this "
        "demo uses (no ImageNet download), frozen features cap what "
        "the regressors can learn and the held-out metric stays flat; "
        "unfreezing the tail lets features adapt so generalisation is "
        "demonstrable",
    )
    ap.add_argument(
        "--real_textures", action="store_true",
        help="texture the synthetic planes with random crops of the "
        "reference's bundled real photographs "
        "(/root/reference/examples/images) instead of band-limited "
        "noise — natural-image statistics without egress",
    )
    ap.add_argument(
        "--warmup_steps", type=int, default=0,
        help="self-supervised backbone warm-up before the matching "
        "recipe: dense InfoNCE over layer3 feature grids of "
        "homography-related views (the exact plane H gives dense "
        "correspondence labels). The no-egress stand-in for the "
        "reference's ImageNet init (README.md:76) — random-init "
        "frozen features are the measured blocker for a falling "
        "held-out curve (ROUND4_NOTES.md item 7)",
    )
    ap.add_argument(
        "--ncn_steps", type=int, default=0,
        help="NCNet weak-supervision pretrain of the consensus filter "
        "between the backbone warm-up and the matching recipe — the "
        "reference's ncn_ivd_5ep stage (its NCN is FROZEN during the "
        "main recipe, train_patch2pix.py:301, so the consensus only "
        "ever learns here). Round 4 measured this degenerate on "
        "random features; with the warmed backbone the features are "
        "matchable and the stage has signal",
    )
    ap.add_argument(
        "--train_ncn", action="store_true",
        help="train the NCN too (the reference optimizer covers "
        "regressors + NCN, networks/patch2pix.py:81-91); the demo "
        "default freezes it for step-time comparability",
    )
    args = ap.parse_args()

    model = Patch2Pix(config=ModelConfig(dtype="bfloat16").resolved())
    optim_cfg = OptimConfig(lr_init=args.lr)
    freeze = ("extract",) if args.train_ncn else ("extract", "ncn")
    if args.unfreeze_tail:
        freeze = ("extract/conv1", "extract/bn1", "extract/layer1*",
                  "extract/layer2*", "ncn")
    # the state's opt_state must be built with the SAME freeze labels
    # as the tx the step uses (masked subtree structures must match)
    state = create_train_state(
        rng=jax.random.PRNGKey(0), model=model, optim_cfg=optim_cfg,
        image_shape=(1, 96, 128, 3), freeze=freeze,
    )
    tx = make_optimizer(optim_cfg, state.params, freeze=freeze)
    step = make_train_step(model, tx, ksize=2, ptmax=args.ptmax)

    texture_pool = None
    if args.real_textures:
        import glob

        from patch2pix_tpu.data.synthetic import load_texture_pool

        paths = sorted(glob.glob(
            "/root/reference/examples/images/pair_*/[12].jpg"))
        assert paths, "reference example images not found"
        texture_pool = load_texture_pool(paths)

    def gen_batch(rs_):
        return synthetic_batch(
            rs_, args.batch, args.ht, args.wt,
            texture_pool=texture_pool, with_h=args.warmup_steps > 0,
        )

    # fixed data pool (train), staged onto the device ONCE as a stacked
    # (P, B, H, W, 3) tree — the old loop re-uploaded ~15 MB of images
    # through the relay every step — plus held-out pairs (val)
    rs = np.random.RandomState(7)
    pool = [gen_batch(rs) for _ in range(args.pool // args.batch)]
    n_pool = len(pool)

    def fresh_pool():
        fresh = [gen_batch(rs) for _ in range(n_pool)]
        return jax.device_put(
            {k: np.stack([b[k] for b in fresh]) for k in fresh[0]}
        )

    pool_dev = jax.device_put(
        {k: np.stack([b[k] for b in pool]) for k in pool[0]}
    )
    # held out: same texture statistics, unseen geometry/crops (8 pairs
    # for a steadier metric than one training-sized batch)
    val = synthetic_batch(
        np.random.RandomState(1234), 8, args.ht, args.wt,
        texture_pool=texture_pool,
    )
    val_j = {k: jnp.asarray(v) for k, v in val.items()}

    # ------------------------------------------------ backbone warm-up
    if args.warmup_steps:
        from patch2pix_tpu.train.state import TrainState

        tx_w = make_optimizer(
            OptimConfig(lr_init=1e-3), state.params,
            freeze=("ncn", "regress_mid", "regress_fine"),
        )

        def warmup_loss(params, batch_stats, batch):
            """Dense InfoNCE between layer3 feature grids of the two
            homography-related views: the positive for cell i of view 1
            is the cell its centre maps to under the exact plane H."""
            v = {"params": params, "batch_stats": batch_stats}
            f1s, upd = model.apply(
                v, batch["im1"], train=True, mutable=["batch_stats"],
                method=model.extract_pyramid,
            )
            v2 = {"params": params, "batch_stats": upd["batch_stats"]}
            f2s, upd2 = model.apply(
                v2, batch["im2"], train=True, mutable=["batch_stats"],
                method=model.extract_pyramid,
            )
            f1, f2 = f1s[-1], f2s[-1]
            b, fh, fw, c = f1.shape
            ds = batch["im1"].shape[1] // fh
            xs = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * ds
            ys = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * ds
            gx, gy = jnp.meshgrid(xs, ys)
            pts = jnp.stack(
                [gx.ravel(), gy.ravel(), jnp.ones(fh * fw)], axis=0)
            p2 = jnp.einsum("bij,jn->bin", batch["H"], pts)
            x2 = p2[:, 0] / p2[:, 2]
            y2 = p2[:, 1] / p2[:, 2]
            ix = jnp.floor(x2 / ds).astype(jnp.int32)
            iy = jnp.floor(y2 / ds).astype(jnp.int32)
            ok = (ix >= 0) & (ix < fw) & (iy >= 0) & (iy < fh)
            labels = jnp.clip(iy, 0, fh - 1) * fw + jnp.clip(ix, 0, fw - 1)

            def l2n(f):
                f = f.reshape(b, fh * fw, c).astype(jnp.float32)
                return f * jax.lax.rsqrt(
                    jnp.sum(f * f, -1, keepdims=True) + 1e-6)

            n1, n2 = l2n(f1), l2n(f2)
            logits = jnp.einsum("bnc,bmc->bnm", n1, n2) / 0.07
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, :, None], 2)[..., 0]
            okf = ok.astype(jnp.float32)
            loss = jnp.sum(nll * okf) / jnp.maximum(jnp.sum(okf), 1.0)
            acc = jnp.sum(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32) * okf
            ) / jnp.maximum(jnp.sum(okf), 1.0)
            return loss, (upd2["batch_stats"], acc)

        @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
        def warmup_chunk(wstate, pool, n, start):
            def body(carry, i):
                params, bs, opt = carry
                batch = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, i % n_pool, keepdims=False), pool)
                (loss, (new_bs, acc)), grads = jax.value_and_grad(
                    warmup_loss, has_aux=True)(params, bs, batch)
                upd, opt = tx_w.update(grads, opt, params)
                params = jax.tree.map(lambda p, u: p + u, params, upd)
                return (params, new_bs, opt), (loss, acc)

            return jax.lax.scan(body, wstate, start + jnp.arange(n))

        wstate = (state.params, state.batch_stats, tx_w.init(state.params))
        done_w = 0
        t0 = time.time()
        while done_w < args.warmup_steps:
            n = min(100, args.warmup_steps - done_w)
            wstate, (wloss, wacc) = warmup_chunk(
                wstate, pool_dev, n, jnp.int32(done_w))
            if args.refresh_pool:
                # fresh pairs each chunk: a fixed 64-pair pool is
                # memorised within a few hundred InfoNCE steps and the
                # warmed features stop generalising to held-out pairs
                pool_dev = fresh_pool()
            done_w += n
            print(json.dumps({
                "warmup_step": done_w,
                "nce_loss": float(jnp.mean(wloss[-20:])),
                "cell_match_acc": float(jnp.mean(wacc[-20:])),
            }))
        print(json.dumps({"warmup_wall_s": round(time.time() - t0, 1)}))
        # warmed backbone (+BN stats) enters the matching recipe; the
        # optimizer state restarts clean
        state = TrainState(
            step=jnp.int32(0), params=wstate[0], batch_stats=wstate[1],
            opt_state=tx.init(wstate[0]),
        )

    # -------------------------------------------- NCN weak pretraining
    if args.ncn_steps:
        import optax

        from patch2pix_tpu.train.ncn_pretrain import ncn_weak_loss
        from patch2pix_tpu.train.state import TrainState

        tx_n = optax.multi_transform(
            {"train": optax.adam(1e-3), "frozen": optax.set_to_zero()},
            lambda params: {
                k: ("train" if k == "ncn" else "frozen") for k in params
            },
        )

        # scan-chunked like the other phases: negatives come from the
        # NEXT pool slot; everything stays device-resident (a per-step
        # python loop stalled on relay H2D of ~22 MB per step)
        @functools.partial(jax.jit, static_argnums=(2,),
                           donate_argnums=(0,))
        def ncn_chunk(carry, pool, n, start):
            def body(c, i):
                params, opt = c
                b = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, i % n_pool, keepdims=False), pool)
                b2 = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, (i + 1) % n_pool, keepdims=False), pool)
                batch = {"im_src": b["im1"], "im_pos": b["im2"],
                         "im_neg": b2["im1"]}

                def loss_fn(p):
                    variables = {
                        "params": p, "batch_stats": state.batch_stats}
                    return ncn_weak_loss(model, variables, batch, ksize=2)

                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                upd, opt = tx_n.update(grads, opt, params)
                params = optax.apply_updates(params, upd)
                return (params, opt), metrics

            return jax.lax.scan(body, carry, start + jnp.arange(n))

        carry = (state.params, tx_n.init(state.params))
        done_n = 0
        t0 = time.time()
        while done_n < args.ncn_steps:
            n = min(100, args.ncn_steps - done_n)
            carry, nmetrics = ncn_chunk(
                carry, pool_dev, n, jnp.int32(done_n))
            if args.refresh_pool:
                pool_dev = fresh_pool()
            done_n += n
            print(json.dumps({
                "ncn_step": done_n,
                **{k.replace("/", "_"): float(jnp.mean(v[-20:]))
                   for k, v in nmetrics.items()},
            }))
        print(json.dumps({"ncn_wall_s": round(time.time() - t0, 1)}))
        state = TrainState(
            step=jnp.int32(0), params=carry[0],
            batch_stats=state.batch_stats, opt_state=tx.init(carry[0]),
        )

    # chunked multi-step: `chunk` optimizer steps run inside ONE jit via
    # lax.scan (batch picked from the resident pool by step index), so
    # end-to-end wall-clock IS the in-jit time — no per-step dispatch,
    # H2D, or metric syncs. Metrics come back stacked (chunk,) per key.
    # The pool is an ARGUMENT, not a closure capture: captured arrays
    # embed in the lowered HLO as constants, and at --pool 256 that is
    # a ~1 GB compile payload (it broke the remote-compile relay).
    @functools.partial(jax.jit, static_argnums=3, donate_argnums=0)
    def multi_step(state, pool, start, n):
        def body(st, i):
            batch = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % n_pool, keepdims=False
                ),
                pool,
            )
            st2, metrics = step(
                st, batch, jax.random.fold_in(jax.random.PRNGKey(42), i)
            )
            return st2, metrics

        return jax.lax.scan(body, state, start + jnp.arange(n))

    @jax.jit
    def val_epi(params, batch_stats, im1, im2, F):
        fine, mid, cm = model.apply(
            {"params": params, "batch_stats": batch_stats},
            im1, im2, ksize=2, method=model.predict_fine,
        )
        d = sampson_dist_batched(fine.coords, F)
        # confidence-gated like the reference's io_thres filter
        # (model_helper.py:97-105), keep-all fallback per pair
        conf = fine.valid & (fine.scores > 0.5)
        any_conf = jnp.any(conf, axis=1, keepdims=True)
        v = jnp.where(any_conf, conf, fine.valid).astype(jnp.float32)
        # median-ish robust mean: clip at 50 px so misses don't swamp it
        fine_px = jnp.sum(jnp.minimum(d, 50.0) * v) / jnp.maximum(
            jnp.sum(v), 1.0)
        # coarse-level diagnostic: does the matching FRONT-END improve
        # even when the regressed metric pins?
        dc = sampson_dist_batched(cm.coords, F)
        vc = cm.valid.astype(jnp.float32)
        coarse_px = jnp.sum(jnp.minimum(dc, 50.0) * vc) / jnp.maximum(
            jnp.sum(vc), 1.0)
        # regressor-generalisation diagnostic: fine error over the
        # FIXABLE set (coarse error within the two regressors' +-16 px
        # correction range, parse_regressor_out's psize*tanh clamp) —
        # front-end misses beyond that range are unfixable by design
        # and belong to the coarse metric, not the regressors
        fx = (dc < 16.0).astype(jnp.float32) * fine.valid.astype(
            jnp.float32)
        fine_fixable_px = jnp.sum(jnp.minimum(d, 50.0) * fx) / jnp.maximum(
            jnp.sum(fx), 1.0)
        return fine_px, coarse_px, fine_fixable_px

    os.makedirs(args.out, exist_ok=True)
    chunks = []  # (start_step, stacked device metrics, post-chunk val)
    val0, val0_coarse, val0_fixable = (float(v) for v in val_epi(
        state.params, state.batch_stats,
        val_j["im1"], val_j["im2"], val_j["F"],
    ))

    def run_chunk(done):
        n = min(args.eval_every, args.steps - done)
        st, metrics = multi_step(
            run_chunk.state, run_chunk.pool, jnp.int32(done), n
        )
        run_chunk.state = st
        if args.refresh_pool:
            # stage the NEXT chunk's fresh pool while this one runs
            fresh = [gen_batch(rs) for _ in range(n_pool)]
            run_chunk.pool = jax.device_put(
                {k: np.stack([b[k] for b in fresh]) for k in fresh[0]}
            )
        val_v = val_epi(
            st.params, st.batch_stats,
            val_j["im1"], val_j["im2"], val_j["F"],
        )  # device scalar; fetched lazily with the metrics below
        chunks.append((done, metrics, val_v))
        return done + n

    run_chunk.state = state
    run_chunk.pool = pool_dev
    # first chunk pays the compile; time the rest (steady-state rate)
    done = run_chunk(0)
    jax.block_until_ready(chunks[-1][1])
    timed_from = done
    t0 = time.time()
    while done < args.steps:
        done = run_chunk(done)
    # ONE host sync for the whole timed stretch
    jax.block_until_ready(chunks[-1][1])
    wall = time.time() - t0
    state = run_chunk.state

    rows = []
    for start, metrics, val_v in chunks:
        host = jax.device_get(metrics)
        n = len(next(iter(host.values())))
        for j in range(n):
            rows.append(
                {"step": start + j,
                 **{k.replace("/", "_"): float(v[j]) for k, v in host.items()}}
            )
        rows[-1]["val_fine_sampson_px"] = float(val_v[0])
        rows[-1]["val_coarse_sampson_px"] = float(val_v[1])
        rows[-1]["val_fine_fixable_px"] = float(val_v[2])
        print(json.dumps(
            {"step": start + n - 1, "loss_pair": rows[-1]["loss_pair"],
             "val_fine_sampson_px": float(val_v[0]),
             "val_coarse_sampson_px": float(val_v[1]),
             "val_fine_fixable_px": float(val_v[2])}
        ))
    csv_path = os.path.join(args.out, "losses.csv")
    keys = sorted({k for r in rows for k in r})
    with open(csv_path, "w", newline="") as f:
        wcsv = csv.DictWriter(f, fieldnames=keys)
        wcsv.writeheader()
        wcsv.writerows(rows)

    # summary + plot
    def win(key, sl):
        vals = [r[key] for r in rows if key in r]
        return float(np.mean(vals[sl]))

    timed_steps = max(args.steps - timed_from, 1)
    summary = {
        "steps": args.steps,
        "wall_s": round(wall, 1),
        # steady-state end-to-end rate (first chunk excluded: compile)
        "ms_per_step_avg": round(1e3 * wall / timed_steps, 1),
        "loss_pair_first25": win("loss_pair", slice(0, 25)),
        "loss_pair_last25": win("loss_pair", slice(-25, None)),
        "epi_fine_first25": win("loss_epi_fine", slice(0, 25)),
        "epi_fine_last25": win("loss_epi_fine", slice(-25, None)),
        "val_sampson_init": val0,
        "val_coarse_init": val0_coarse,
        "val_fixable_init": val0_fixable,
        "val_coarse_last": [r["val_coarse_sampson_px"] for r in rows
                            if "val_coarse_sampson_px" in r][-1],
        "val_sampson_first": [r["val_fine_sampson_px"] for r in rows
                              if "val_fine_sampson_px" in r][0],
        "val_sampson_last": [r["val_fine_sampson_px"] for r in rows
                             if "val_fine_sampson_px" in r][-1],
        "val_fixable_first": [r["val_fine_fixable_px"] for r in rows
                              if "val_fine_fixable_px" in r][0],
        "val_fixable_last": [r["val_fine_fixable_px"] for r in rows
                             if "val_fine_fixable_px" in r][-1],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(13, 3.5))
        steps = [r["step"] for r in rows]

        def smooth(key):
            v = np.asarray([r[key] for r in rows])
            n = min(9, len(v))
            return np.convolve(v, np.ones(n) / n, mode="same")

        axes[0].plot(steps, [r["loss_pair"] for r in rows], alpha=0.3)
        axes[0].plot(steps, smooth("loss_pair"))
        axes[0].set_title("total loss")
        axes[1].plot(steps, [r["loss_epi_mid"] for r in rows], alpha=0.3,
                     label="mid")
        axes[1].plot(steps, [r["loss_epi_fine"] for r in rows], alpha=0.3,
                     label="fine")
        axes[1].plot(steps, smooth("loss_epi_mid"))
        axes[1].plot(steps, smooth("loss_epi_fine"))
        axes[1].set_title("epipolar loss (px)")
        axes[1].legend()
        vs = [(r["step"], r["val_fine_sampson_px"]) for r in rows
              if "val_fine_sampson_px" in r]
        axes[2].plot([s for s, _ in vs], [v for _, v in vs], marker="o",
                     label="all (conf-gated)")
        fxs = [(r["step"], r["val_fine_fixable_px"]) for r in rows
               if "val_fine_fixable_px" in r]
        axes[2].plot([s for s, _ in fxs], [v for _, v in fxs], marker="s",
                     label="fixable (coarse<16px)")
        axes[2].legend()
        axes[2].set_title("held-out fine sampson (px, clipped@50)")
        for ax in axes:
            ax.set_xlabel("step")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "curves.png"), dpi=110)
        print("plot:", os.path.join(args.out, "curves.png"))
    except Exception as e:  # matplotlib optional
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
