"""NCN weak-supervision pretraining: grads flow, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.config import ModelConfig
from patch2pix_tpu.models.patch2pix import Patch2Pix
from patch2pix_tpu.train.ncn_pretrain import (
    make_ncn_pretrain_step,
    ncn_weak_loss,
)


def test_ncn_pretrain_updates_ncn_only():
    model = Patch2Pix(config=ModelConfig().resolved())
    rng = np.random.default_rng(0)
    im = jnp.zeros((1, 64, 64, 3), jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    variables = model.init(
        {"params": k1, "proposal": k2}, im, im, ksize=2, ptmax=8, train=False
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    batch = {
        "im_src": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
        "im_pos": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
        "im_neg": jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32),
    }
    loss0, metrics = ncn_weak_loss(model, {"params": params, "batch_stats": stats}, batch)
    assert np.isfinite(float(loss0))
    assert 0 <= float(metrics["score/pos"]) <= 1

    step, init_opt = make_ncn_pretrain_step(model, lr=1e-2)
    opt_state = init_opt(params)
    losses = []
    for _ in range(4):
        params2, opt_state, metrics = step(params, stats, opt_state, batch)
        losses.append(float(metrics["loss/nc"]))
        # only NCN moved
        same_extract = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)),
            params["extract"], params2["extract"],
        )
        assert all(jax.tree_util.tree_leaves(same_extract))
        moved_ncn = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)),
            params["ncn"], params2["ncn"],
        )
        assert not all(jax.tree_util.tree_leaves(moved_ncn))
        params = params2
    # optimizing the weak objective on a FIXED batch must reduce it
    assert losses[-1] < losses[0]
