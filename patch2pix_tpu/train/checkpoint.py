"""Orbax checkpointing with self-describing metadata.

Capability parity with the reference's checkpoint contract
(/root/reference/utils/train/helper.py:9-61): checkpoints carry the
architecture config (so eval can rebuild the model without flags),
the epoch counter, best-validation values, model params/BN stats and
optimizer state; names follow the reference scheme
(``last``/``ep{N}``/``immatch_best``). Partial restores (NCNet-only
pretrain dicts) go through ``patch2pix_tpu.utils.torch_import``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from patch2pix_tpu.config import ModelConfig, model_config_from_json, to_json
from patch2pix_tpu.train.state import TrainState

LAST = "last"
BEST = "immatch_best"


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(create=True, max_to_keep=None),
    )


def save_ckpt(
    ckpt_dir: str,
    state: TrainState,
    model_config: ModelConfig,
    epoch: int,
    best_vals: Optional[Sequence[float]] = None,
    tag: str = LAST,
) -> None:
    """Write a named checkpoint (directory-per-tag layout)."""
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    meta = {
        "epoch": epoch,
        "best_vals": list(best_vals) if best_vals is not None else None,
        "model_config": json.loads(to_json(model_config)),
    }
    with open(os.path.join(os.path.abspath(ckpt_dir), f"{tag}.meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_ckpt(
    ckpt_dir: str, state_template: TrainState, tag: str = LAST
) -> Tuple[TrainState, dict]:
    """Restore a checkpoint onto a state template (same treedef)."""
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "step": state_template.step,
        "params": state_template.params,
        "batch_stats": state_template.batch_stats,
        "opt_state": state_template.opt_state,
    }
    restored = ckptr.restore(path, tree)
    with open(os.path.join(os.path.abspath(ckpt_dir), f"{tag}.meta.json")) as f:
        meta = json.load(f)
    state = TrainState(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, meta


def read_meta(ckpt_dir: str, tag: str = LAST) -> dict:
    with open(os.path.join(os.path.abspath(ckpt_dir), f"{tag}.meta.json")) as f:
        return json.load(f)


def restore_for_eval(ckpt_dir: str, tag: str = LAST):
    """Rebuild (model, variables) from a checkpoint directory alone —
    the checkpoint is self-describing like the reference's .pth."""
    import jax.numpy as jnp

    from patch2pix_tpu.models.patch2pix import Patch2Pix

    meta = read_meta(ckpt_dir, tag)
    cfg = model_config_from_json(json.dumps(meta["model_config"]))
    if cfg.regressor is not None:
        cfg.regressor.panc = 1  # eval forces panc=1
    cfg = cfg.resolved()
    model = Patch2Pix(config=cfg)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(ckpt_dir), tag)
    restored = ckptr.restore(path)  # template-free: raw array tree
    return model, {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }
