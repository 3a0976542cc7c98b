"""Training entry point: ``python -m patch2pix_tpu.train.cli``.

Capability parity with /root/reference/train_patch2pix.py: the same
CLI flag names (:17-75), the config-encoding run-dir scheme (:239-287),
the epoch loop with per-epoch validation + best-checkpoint selection
(:321-367), and the same checkpoint tags.

TPU redesign: one jitted (optionally mesh-sharded) train step replaces
the per-batch Python hot loop; metrics stream to a JSONL writer with
the reference's visdom metric names; checkpoints are orbax.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Patch2Pix (TPU)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--save_step", type=int, default=1)
    p.add_argument("--plot_counts", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prefix", type=str, default="")
    p.add_argument("--out_dir", "-o", type=str, default="output/patch2pix")

    p.add_argument("--dataset", type=str, default="MegaDepth")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--pair_root", type=str, default="data_pairs")
    p.add_argument(
        "--match_npy", type=str,
        default="megadepth_pairs.ov0.35_imrat1.5.pair500.excl_test.npy",
    )

    p.add_argument("--backbone", type=str, default="ResNet34")
    p.add_argument("--change_stride", action="store_true")
    p.add_argument("--ksize", type=int, default=2)
    p.add_argument("--freeze_feat", type=int, default=87)
    p.add_argument("--feat_idx", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--feat_comb", type=str, default="pre")
    p.add_argument("--conv_kers", type=int, nargs="*", default=[3, 3])
    p.add_argument("--conv_dims", type=int, nargs="*", default=[512, 512])
    p.add_argument("--conv_strs", type=int, nargs="*", default=[2, 1])
    p.add_argument("--fc_dims", type=int, nargs="*", default=[512, 256])
    p.add_argument("--psize", type=int, nargs=2, default=[16, 16])
    p.add_argument("--pshift", type=int, default=8)
    p.add_argument("--panc", type=int, choices=[8, 1], default=8)
    p.add_argument("--ptmax", type=int, default=400)
    p.add_argument("--shared", action="store_true")

    p.add_argument("--cthres", type=float, default=0.5)
    p.add_argument("--cls_dthres", type=int, nargs=2, default=[50, 5])
    p.add_argument("--epi_dthres", type=int, nargs=2, default=[50, 5])

    p.add_argument("--pretrain", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--resume", action="store_true")

    p.add_argument("--lr_init", "-lr", type=float, default=5e-4)
    p.add_argument("--lr_decay", "-lrd", nargs="*", default=None)
    p.add_argument("--weight_decay", "-wd", type=float, default=0.0)
    p.add_argument("--weight_cls", "-wcls", type=float, default=10.0)
    p.add_argument("--weight_epi", "-wepi", type=float, nargs="*", default=[1, 1])

    # TPU-specific
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size (0 = all local devices)")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="cap batches per epoch (0 = full dataset)")
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--wt", type=int, default=480, help="train image width")
    p.add_argument("--ht", type=int, default=320, help="train image height")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32", help="compute dtype (params stay f32)")
    p.add_argument(
        "--remat", default="auto",
        choices=["auto", "none", "fine", "both", "dots"],
        help="rematerialisation of the regression stages: 'none' is "
        "fastest (372.9 vs 602.7 ms/step at best-model scale) and fits "
        "a 16 GB chip at batch 4; 'auto' (default) picks none/both by "
        "the proposal volume; 'fine'/'both' trade step time for memory",
    )
    p.add_argument(
        "--backbone_train_bn", action="store_true",
        help="use batch statistics in the frozen backbone's BatchNorms "
        "during training, like the reference's net.train() does "
        "(/root/reference/train_patch2pix.py:78). Default OFF: the "
        "backbone is frozen, so its running ImageNet statistics are the "
        "distribution its weights were trained for, and eval always "
        "uses them — training with them removes a train/eval skew. "
        "Pass this flag to reproduce the reference recipe exactly.",
    )
    return p.parse_args(argv)


def run_dir_tags(args) -> str:
    """The reference's config-encoded output dir
    (/root/reference/train_patch2pix.py:234-280) — this IS the
    experiment tracking scheme, kept verbatim for 1:1 comparability."""
    pair_type = (
        args.match_npy.replace("megadepth_pairs.", "")
        .replace("_imrat1.5", "")
        .replace(".npy", "")
    )
    data_tag = "Mega." + pair_type
    odir = f"{args.prefix}.{data_tag}" if args.prefix else data_tag
    odir += f".freeze{args.freeze_feat}"
    if args.change_stride:
        odir += ".cs"
    if args.pretrain:
        odir += ".pretrain"

    feat = f"ks{args.ksize}fe{''.join(str(v) for v in args.feat_idx)}"
    thres = (
        f"ep{args.epi_dthres[0]}-{args.epi_dthres[1]}"
        f"cls{args.cls_dthres[0]}-{args.cls_dthres[1]}"
    )
    train = (
        f"_wcls{args.weight_cls}wepi{args.weight_epi[0]}-{args.weight_epi[1]}"
        f".lr{args.lr_init}"
    )
    if args.weight_decay > 0:
        train += f"wd{args.weight_decay}"
    if args.lr_decay:
        kind = args.lr_decay[0]
        short = {"step": "lrst", "multistep": "lrms"}.get(kind, kind)
        train += f"{short}{args.lr_decay[1]}-{args.lr_decay[2]}"
    regress = (
        f"{args.feat_comb}{args.ptmax}"
        f"_conv{''.join(map(str, args.conv_kers))}"
        f"dim{'-'.join(map(str, args.conv_dims))}"
        f"str{'-'.join(map(str, args.conv_strs))}"
        f"fc{'-'.join(map(str, args.fc_dims))}"
        f"_psz{args.psize[0]}-{args.psize[1]}a{args.panc}"
    )
    if args.shared:
        regress += ".shared"
    return os.path.join(args.out_dir, odir, f"{feat}{thres}{train}", regress)


def build_configs(args):
    from patch2pix_tpu.config import ModelConfig, OptimConfig, RegressorConfig

    reg = RegressorConfig(
        feat_comb=args.feat_comb,
        conv_kers=tuple(args.conv_kers),
        conv_dims=tuple(args.conv_dims),
        conv_strs=tuple(args.conv_strs),
        fc_dims=tuple(args.fc_dims),
        psize=tuple(args.psize),
        pshift=args.pshift,
        panc=args.panc,
        shared=args.shared,
    )
    model_cfg = ModelConfig(
        backbone=args.backbone,
        change_stride=args.change_stride,
        feat_idx=tuple(args.feat_idx),
        regressor=reg,
        dtype=args.dtype,
    ).resolved()
    lr_decay = None
    if args.lr_decay:
        lr_decay = (args.lr_decay[0], float(args.lr_decay[1]),
                    *[int(float(v)) for v in args.lr_decay[2:]])
    optim_cfg = OptimConfig(
        opt="adam",
        lr_init=args.lr_init,
        weight_decay=args.weight_decay,
        lr_decay=lr_decay,
        epochs=args.epochs,
    )
    return model_cfg, optim_cfg


def main(argv=None):
    import jax
    from jax.sharding import Mesh

    from patch2pix_tpu.data.megadepth import MegaDepthPairDataset, batch_iterator
    from patch2pix_tpu.models.patch2pix import Patch2Pix
    from patch2pix_tpu.train import (
        create_train_state,
        make_optimizer,
        make_sharded_train_step,
        make_train_step,
    )
    from patch2pix_tpu.train.checkpoint import load_ckpt, save_ckpt
    from patch2pix_tpu.utils.logging import (
        Logger,
        MetricsWriter,
        config2str,
        count_parameters,
        make_deterministic,
    )

    args = parse_args(argv)
    make_deterministic(args.seed)
    out_dir = run_dir_tags(args)
    os.makedirs(out_dir, exist_ok=True)
    log = Logger(os.path.join(out_dir, "log.txt"))
    log(config2str(args))
    log(f"Log dir {out_dir}")

    model_cfg, optim_cfg = build_configs(args)
    model = Patch2Pix(config=model_cfg)

    # dataset
    match_npy = os.path.join(args.pair_root, args.match_npy)
    dataset = MegaDepthPairDataset(args.data_root, match_npy, wt=args.wt, ht=args.ht)
    steps_per_epoch = len(dataset) // args.batch
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    log(f">>>Load dataset: MegaDepth, pairs:{len(dataset)} steps/epoch:{steps_per_epoch}")

    # state (+ pretrain / resume)
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(
        rng, model, optim_cfg, image_shape=(1, args.ht, args.wt, 3),
        steps_per_epoch=max(steps_per_epoch, 1),
    )
    start_epoch = 0
    best_vals = [np.inf, 0.0, np.inf, 0.0]
    if args.pretrain:
        # NCNet-pretrain partial init (reference --pretrain path)
        from patch2pix_tpu.utils.torch_import import (
            convert_patch2pix_state_dict,
            load_torch_state_dict,
            merge_variables,
        )

        sd = load_torch_state_dict(args.pretrain)
        params, stats = convert_patch2pix_state_dict(sd)
        merged = merge_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            params, stats,
        )
        state = state.replace(
            params=merged["params"], batch_stats=merged["batch_stats"]
        )
        log(f"Load pretrained: {args.pretrain}")
    if args.resume and os.path.exists(os.path.join(out_dir, "last.meta.json")):
        state, meta = load_ckpt(out_dir, state, tag="last")
        start_epoch = meta["epoch"] + 1
        best_vals = meta.get("best_vals") or best_vals
        log(f"Resumed from epoch {start_epoch}")
    elif args.ckpt:
        state, meta = load_ckpt(args.ckpt, state, tag="last")
        log(f"Load model: {args.ckpt}")

    log(
        "Params backbone={} ncn={} regress_mid={} regress_fine={}".format(
            count_parameters(state.params.get("extract")),
            count_parameters(state.params.get("ncn")),
            count_parameters(state.params.get("regress_mid")),
            count_parameters(state.params.get("regress_fine")),
        )
    )

    # train step (sharded when >1 device)
    freeze = ["extract", "ncn"]
    if args.weight_epi[0] == 0:
        # reference quirk: zero fine epi weight freezes the MID
        # regressor (/root/reference/train_patch2pix.py:303-306)
        freeze.append("regress_mid")
        log("Freeze regress_mid ...")
    tx = make_optimizer(
        optim_cfg, state.params, max(steps_per_epoch, 1), freeze=tuple(freeze)
    )
    n_dev = args.mesh or jax.local_device_count()
    step_kwargs = dict(
        ksize=args.ksize,
        ptmax=args.ptmax,
        cls_dthres=tuple(args.cls_dthres),
        epi_dthres=tuple(args.epi_dthres),
        weight_cls=args.weight_cls,
        weight_epi=tuple(args.weight_epi),
        backbone_train_bn=args.backbone_train_bn,
        remat=args.remat,
    )
    batch_sharding = None
    if n_dev > 1:
        from jax.sharding import NamedSharding

        from patch2pix_tpu.train.step import shard_batch_spec

        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
        train_step = make_sharded_train_step(model, tx, mesh, **step_kwargs)
        batch_sharding = {
            k: NamedSharding(mesh, v) for k, v in shard_batch_spec().items()
        }
        log(f"Mesh: {n_dev}-device data parallel")
    else:
        train_step = jax.jit(make_train_step(model, tx, **step_kwargs), donate_argnums=0)

    writer = MetricsWriter(os.path.join(out_dir, "metrics.jsonl"), "train")
    t0 = time.time()
    log(f"Start training from {start_epoch} to {args.epochs} ..")
    for epoch in range(start_epoch, args.epochs):
        t1 = time.time()
        it = batch_iterator(
            dataset, args.batch, shuffle=True, seed=args.seed + epoch
        )
        # background H2D staging + one up-front key split: the loop body
        # has NO per-step host syncs (metrics drain lazily at flush)
        from patch2pix_tpu.data.prefetch import prefetch_to_device

        it = prefetch_to_device(it, size=2, sharding=batch_sharding)
        rng, epoch_rng = jax.random.split(rng)
        step_keys = jax.random.split(epoch_rng, max(steps_per_epoch, 1))
        for i, batch in enumerate(it):
            if i >= steps_per_epoch:
                break
            state, metrics = train_step(state, batch, step_keys[i])
            writer.append(metrics)
            if steps_per_epoch >= args.plot_counts and (
                i % max(steps_per_epoch // args.plot_counts, 1) == 0 and i > 0
            ):
                log(f"Batch:{i} {writer.summary(['loss/pair', 'skipped'])}")
        means = writer.flush(epoch + 1)
        log(
            f">Epoch:{epoch + 1} time:{time.time() - t1:.1f}s "
            + " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
        )

        save_ckpt(out_dir, state, model_cfg, epoch, best_vals, tag="last")
        if (epoch + 1) % args.save_step == 0:
            save_ckpt(out_dir, state, model_cfg, epoch, best_vals, tag=f"ep{epoch + 1}")

        if not args.no_eval:
            try:
                from patch2pix_tpu.evaluation.immatch import eval_immatch_val_sets
                from patch2pix_tpu.evaluation.matcher import Matcher

                eval_cfg = model_cfg
                matcher = Matcher(
                    Patch2Pix(config=eval_cfg),
                    {"params": state.params, "batch_stats": state.batch_stats},
                    ksize=2, io_thres=0.5, imsize=1024, eval_type="fine",
                )
                qt_err, pass_rate, _ = eval_immatch_val_sets(
                    matcher,
                    data_root=os.path.join(
                        args.data_root, "immatch_benchmark/val_dense"
                    ),
                    sample_max=150,
                    log=log,
                )
                rate = 0.34 * pass_rate[0] + 0.33 * pass_rate[4] + 0.33 * pass_rate[9]
                if qt_err < best_vals[2] or rate > best_vals[3]:
                    best_vals[2] = min(qt_err, best_vals[2])
                    best_vals[3] = max(rate, best_vals[3])
                    save_ckpt(
                        out_dir, state, model_cfg, epoch, best_vals,
                        tag="immatch_best",
                    )
                    log(
                        f">>Save best immatch model: epoch={epoch + 1} "
                        f"qt={qt_err:.3f} rate={rate:.2f}%"
                    )
            except Exception as e:  # validation crash never kills training
                log(f"Failed to eval immatch: {e}")

    log(f"Finished, time:{time.time() - t0:.1f}s")
    log.close()


if __name__ == "__main__":
    main()
