"""Train state: parameters, BN stats, optimizer, LR schedule.

Capability parity with the reference's optimizer setup
(/root/reference/networks/modules.py:114-152 ``init_optimizer`` with
Adam/SGD + StepLR/MultiStepLR, and
/root/reference/networks/patch2pix.py:66-91 trainable-parameter
selection: backbone frozen, NCN optionally frozen, regressors trained).

TPU redesign: one immutable pytree state threaded through a jitted
step; freezing is an optax ``multi_transform`` mask (frozen subtrees
get ``set_to_zero``) so the whole update stays on device.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from patch2pix_tpu.config import ModelConfig, OptimConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int = 1):
    """LR schedule matching the reference semantics.

    The reference steps its scheduler once per *epoch*
    (/root/reference/train_patch2pix.py:367); we scale boundaries by
    ``steps_per_epoch`` so per-step optax schedules line up.
    ``lr_decay`` forms: None | ('step', factor, step_size) |
    ('multistep', factor, *milestones).
    """
    if cfg.lr_decay is None:
        return cfg.lr_init
    kind = cfg.lr_decay[0]
    factor = float(cfg.lr_decay[1])
    if kind == "step":
        step_size = int(cfg.lr_decay[2])
        bounds = {
            e * steps_per_epoch: factor
            for e in range(step_size, cfg.epochs + 1, step_size)
        }
    elif kind == "multistep":
        bounds = {int(e) * steps_per_epoch: factor for e in cfg.lr_decay[2:]}
    else:
        raise ValueError(f"unknown lr_decay kind: {kind}")
    return optax.piecewise_constant_schedule(cfg.lr_init, bounds)


def _freeze_labels(params: Mapping, freeze: Sequence[str]) -> Mapping:
    """Label param subtrees 'frozen' or 'train'.

    ``freeze`` entries are '/'-joined path prefixes with fnmatch
    wildcards: "extract" freezes the whole backbone, "extract/layer1*"
    one stage (the reference's freeze_feat index boundary expressed
    structurally). A subtree is frozen when its path (or any prefix)
    matches an entry.
    """
    import fnmatch

    def frozen(path: str) -> bool:
        parts = path.split("/")
        prefixes = ["/".join(parts[: i + 1]) for i in range(len(parts))]
        return any(
            fnmatch.fnmatchcase(pref, pat)
            for pat in freeze
            for pref in prefixes
        )

    def label(path, sub):
        if isinstance(sub, Mapping):
            return {
                k: label(f"{path}/{k}" if path else k, v)
                for k, v in sub.items()
            }
        return "frozen" if frozen(path) else "train"

    return label("", params)


def make_optimizer(
    cfg: OptimConfig,
    params: Mapping,
    steps_per_epoch: int = 1,
    freeze: Sequence[str] = ("extract", "ncn"),
) -> optax.GradientTransformation:
    """Adam/SGD over the trainable subtrees only.

    Default freeze = backbone + NCN: the reference always freezes the
    backbone through layer3 and hardcodes ``config.freeze_nc = True``
    (/root/reference/train_patch2pix.py:301) — NCN weights come from
    NCNet pretraining and receive no gradient in Patch2Pix training
    (coarse extraction is argmax-based, so their grads are zero anyway).
    """
    sched = lr_schedule(cfg, steps_per_epoch)
    if cfg.opt == "adam":
        inner = optax.adam(sched)
    elif cfg.opt == "sgd":
        inner = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer: {cfg.opt}")
    if cfg.weight_decay:
        inner = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay), inner
        )
    labels = _freeze_labels(params, freeze)
    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(
    rng: jax.Array,
    model,
    optim_cfg: OptimConfig,
    image_shape: Tuple[int, int, int, int] = (1, 320, 480, 3),
    steps_per_epoch: int = 1,
    freeze: Sequence[str] = ("extract", "ncn"),
    init_variables: Optional[Mapping] = None,
) -> TrainState:
    """Initialise model variables (or adopt converted ones) + optimizer."""
    if init_variables is None:
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros(image_shape, jnp.float32)
        init_variables = model.init(
            {"params": k1, "proposal": k2},
            dummy, dummy, ksize=2, ptmax=16, train=False,
        )
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})
    tx = make_optimizer(optim_cfg, params, steps_per_epoch, freeze)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
