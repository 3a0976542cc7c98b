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


def test_ckpt_save_restore_sharded_state(tmp_path):
    """Multi-chip checkpointing: save a state whose arrays live sharded
    on an 8-device mesh, restore, and verify values + resumability.

    Exercises the orbax path the multi-host trainer uses (the fake-mesh
    stand-in for a pod slice; real multi-host needs >1 process)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from patch2pix_tpu.config import ModelConfig, OptimConfig
    from patch2pix_tpu.models.patch2pix import Patch2Pix
    from patch2pix_tpu.train import create_train_state, make_optimizer
    from patch2pix_tpu.train.checkpoint import load_ckpt, save_ckpt

    cfg = ModelConfig().resolved()
    model = Patch2Pix(config=cfg)
    oc = OptimConfig(lr_init=1e-3)
    state = create_train_state(
        jax.random.PRNGKey(0), model, oc, image_shape=(1, 64, 64, 3)
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    # replicate the state over the mesh (the sharded trainer's layout)
    state = jax.tree.map(
        lambda x: jax.device_put(x, repl)
        if hasattr(x, "shape") else x, state
    )
    save_ckpt(str(tmp_path), state, cfg, epoch=3, best_vals=[1.0, 2.0])

    restored, meta = load_ckpt(str(tmp_path), state_template=state)
    assert meta["epoch"] == 3
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored arrays are usable under the mesh again
    out = jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(jnp.abs(x).astype(jnp.float32)),
        t.params, jnp.float32(0)))(restored)
    assert np.isfinite(float(out))
