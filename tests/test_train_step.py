"""Train-step tests: loss semantics, freezing, and mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patch2pix_tpu.config import ModelConfig, OptimConfig
from patch2pix_tpu.models.patch2pix import Patch2Pix
from patch2pix_tpu.train import (
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
    patch2pix_losses,
)


def tiny_model():
    cfg = ModelConfig().resolved()
    return Patch2Pix(config=cfg)


def make_batch(b, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # tiny F keeps sampson distances below the positive thresholds so
    # every pair participates in the loss (nonzero grads to regressors)
    return {
        "im1": jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32),
        "im2": jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32),
        "F": jnp.asarray(
            rng.normal(size=(b, 3, 3)) * 1e-9, jnp.float32
        ),
    }


def test_loss_masking_semantics():
    """Pairs with no positives are excluded exactly like the reference."""
    b, n = 3, 16
    rng = np.random.default_rng(1)
    out = {
        "coarse": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "mid": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "fine": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "mid_probs": jnp.full((b, n), 0.5),
        "fine_probs": jnp.full((b, n), 0.5),
    }
    # F ~ 0 => sampson dists ~ 0 => everything positive
    F0 = jnp.tile(jnp.eye(3)[None] * 1e-9, (b, 1, 1))
    loss, metrics = patch2pix_losses(out, F0)
    assert np.isfinite(float(loss))
    assert float(metrics["skipped"]) == 0.0
    # huge F => all dists >> thresholds => all pairs skipped, loss 0
    Fbig = jnp.tile(jnp.eye(3)[None] * 1e3, (b, 1, 1))
    loss2, metrics2 = patch2pix_losses(out, Fbig)
    assert float(loss2) == 0.0
    assert float(metrics2["skipped"]) == b


@pytest.fixture(scope="module")
def state_and_model():
    model = tiny_model()
    optim_cfg = OptimConfig(lr_init=1e-3, lr_decay=("multistep", 0.2, 5))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        rng, model, optim_cfg, image_shape=(1, 64, 64, 3)
    )
    tx = make_optimizer(optim_cfg, state.params)
    return state, model, tx


def test_train_step_updates_only_trainable(state_and_model):
    state, model, tx = state_and_model
    step = jax.jit(make_train_step(model, tx, ksize=2, ptmax=8))
    batch = make_batch(2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss/pair"]))
    # backbone + NCN frozen (reference hardcodes freeze_nc,
    # /root/reference/train_patch2pix.py:301); regressors move
    def unchanged(sub):
        t = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)),
            state.params[sub],
            new_state.params[sub],
        )
        return all(jax.tree_util.tree_leaves(t))

    assert unchanged("extract")
    assert unchanged("ncn")
    assert not unchanged("regress_mid")
    assert not unchanged("regress_fine")
    assert int(new_state.step) == 1


def test_train_step_bf16_compute():
    """The bf16 compute path must differentiate end-to-end: conv
    preferred_element_type=f32 over bf16 operands used to produce an
    f32 cotangent the conv TRANSPOSE rejected (mixed-dtype conv) —
    a latent break of the deployed low-precision training config."""
    model = Patch2Pix(config=ModelConfig(dtype="bfloat16").resolved())
    optim_cfg = OptimConfig(lr_init=1e-3)
    state = create_train_state(
        jax.random.PRNGKey(0), model, optim_cfg, image_shape=(1, 64, 64, 3)
    )
    tx = make_optimizer(optim_cfg, state.params)
    step = jax.jit(make_train_step(model, tx, ksize=2, ptmax=8))
    new_state, metrics = step(state, make_batch(2), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss/pair"]))
    assert int(new_state.step) == 1


def test_sharded_train_step_8_devices(state_and_model):
    state, model, tx = state_and_model
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    step = make_sharded_train_step(model, tx, mesh, ksize=2, ptmax=8)
    batch = make_batch(8)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss/pair"]))
    assert int(new_state.step) == 1
