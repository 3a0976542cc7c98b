"""Orbax checkpoint roundtrip + self-describing eval restore."""

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.config import ModelConfig, OptimConfig
from patch2pix_tpu.models.patch2pix import Patch2Pix
from patch2pix_tpu.train import create_train_state
from patch2pix_tpu.train.checkpoint import (
    load_ckpt,
    read_meta,
    restore_for_eval,
    save_ckpt,
)


def test_ckpt_roundtrip(tmp_path):
    cfg = ModelConfig().resolved()
    model = Patch2Pix(config=cfg)
    optim_cfg = OptimConfig(lr_init=1e-3)
    state = create_train_state(
        jax.random.PRNGKey(0), model, optim_cfg, image_shape=(1, 64, 64, 3)
    )
    save_ckpt(str(tmp_path), state, cfg, epoch=3, best_vals=[1.0, 2.0], tag="last")

    meta = read_meta(str(tmp_path), "last")
    assert meta["epoch"] == 3
    assert meta["best_vals"] == [1.0, 2.0]
    assert meta["model_config"]["backbone"] == "ResNet34"

    # restore onto a fresh template
    state2 = create_train_state(
        jax.random.PRNGKey(1), model, optim_cfg, image_shape=(1, 64, 64, 3)
    )
    restored, meta2 = load_ckpt(str(tmp_path), state2, tag="last")
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    # self-describing eval restore (no flags, config from the ckpt)
    model2, variables = restore_for_eval(str(tmp_path), tag="last")
    assert model2.config.regressor.panc == 1  # eval forces panc=1
    x, y = (
        jax.tree_util.tree_leaves(state.params)[0],
        jax.tree_util.tree_leaves(variables["params"])[0],
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(y))
