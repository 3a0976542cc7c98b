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


def test_metric_schema_names_and_cls_family():
    """The metrics dict carries the reference visdom schema: the
    cls rec/prec/spec/acc/f1 family (plot_cls_metric,
    /root/reference/utils/train/helper.py:157-195) and the match_dist
    8-legend group (:147-150), with values matching a per-pair numpy
    re-implementation of the reference formulas."""
    b, n = 4, 32
    rng = np.random.default_rng(7)
    out = {
        "coarse": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "mid": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "fine": jnp.asarray(rng.uniform(0, 64, (b, n, 4)), jnp.float32),
        "mid_probs": jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32),
        "fine_probs": jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32),
    }
    F = jnp.asarray(rng.normal(size=(b, 3, 3)) * 2e-3, jnp.float32)
    loss, metrics = patch2pix_losses(out, F)
    want = {
        "cls_mid/rec", "cls_mid/prec", "cls_mid/spec", "cls_mid/acc",
        "cls_mid/f1", "cls_fine/rec", "cls_fine/prec", "cls_fine/spec",
        "cls_fine/acc", "cls_fine/f1",
        "match_dist/cmid_gt", "match_dist/mmid_gt", "match_dist/mfid_gt",
        "match_dist/ffid_gt", "match_dist/cmid_pred",
        "match_dist/mmid_pred", "match_dist/mfid_pred",
        "match_dist/ffid_pred",
        "cls_ratios/mpos_gt", "cls_ratios/fpos_gt",
        "cls_ratios/mpos_pred", "cls_ratios/fpos_pred",
    }
    assert want <= set(metrics)

    # per-pair reference math for the mid family
    from patch2pix_tpu.ops.geometry import sampson_dist_batched

    cdist = np.asarray(sampson_dist_batched(out["coarse"], F))
    mdist = np.asarray(sampson_dist_batched(out["mid"], F))
    mgt = (cdist < 50.0).astype(np.float64)
    fgt = (mdist < 5.0).astype(np.float64)
    valid = (mgt.sum(1) > 0) & (fgt.sum(1) > 0)
    assert valid.any(), "test setup: need at least one valid pair"
    mpred = (np.asarray(out["mid_probs"]) > 0.5).astype(np.float64)
    recs, precs, specs, accs, f1s = [], [], [], [], []
    for i in range(b):
        if not valid[i]:
            continue
        tp = (mpred[i] * mgt[i]).sum()
        tn = ((1 - mpred[i]) * (1 - mgt[i])).sum()
        pgt, ngt, ppred = mgt[i].sum(), (1 - mgt[i]).sum(), mpred[i].sum()
        rec = tp / pgt if pgt > 0 else (1.0 if ppred == 0 else 0.0)
        spec = tn / ngt if ngt > 0 else (1.0 if (n - ppred) == 0 else 0.0)
        prec = tp / ppred if ppred > 0 else 0.0
        acc = (mpred[i] == mgt[i]).mean()
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        recs.append(rec); precs.append(prec); specs.append(spec)
        accs.append(acc); f1s.append(f1)
    np.testing.assert_allclose(float(metrics["cls_mid/rec"]), np.mean(recs), atol=1e-5)
    np.testing.assert_allclose(float(metrics["cls_mid/prec"]), np.mean(precs), atol=1e-5)
    np.testing.assert_allclose(float(metrics["cls_mid/spec"]), np.mean(specs), atol=1e-5)
    np.testing.assert_allclose(float(metrics["cls_mid/acc"]), np.mean(accs), atol=1e-5)
    np.testing.assert_allclose(float(metrics["cls_mid/f1"]), np.mean(f1s), atol=1e-5)


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


@pytest.mark.parametrize("m", [2, 4, 8])
def test_sharded_train_step_collectives_exact(state_and_model, m):
    """The compiled data-parallel step moves ONLY all-reduces (the
    gradient/metric psums): activations never cross chips. The
    cross-pair backbone concat used to force XLA to reshard the
    stacked batch (all-to-alls + mesh-growing collective-permutes);
    the training path now applies the backbone per image."""
    from jax.sharding import Mesh

    from patch2pix_tpu.parallel.comm_stats import collective_stats

    state, model, tx = state_and_model
    mesh = Mesh(np.asarray(jax.devices()[:m]), ("data",))
    step = make_sharded_train_step(model, tx, mesh, ksize=2, ptmax=8)
    batch = make_batch(m)
    compiled = step.lower(state, batch, jax.random.PRNGKey(2)).compile()
    comm = collective_stats(compiled.as_text())
    bad = {k: v for k, v in comm.items() if k != "all-reduce"}
    assert not bad, f"unexpected collectives at mesh {m}: {bad}"
    # the all-reduce volume is the trainable-gradient psum —
    # independent of the mesh size (the scaling model's premise)
    assert comm["all-reduce"]["bytes"] > 1 << 20
