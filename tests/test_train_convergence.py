"""Training actually LEARNS: losses decrease on epipolar-consistent data.

Round-1 tests checked gradients and shapes; this overfits a couple of
fixed synthetic planar-scene pairs (known exact F,
patch2pix_tpu/data/synthetic.py) for a few dozen steps and asserts the
epipolar and classification losses trend down — the same signal the
reference demonstrates over MegaDepth epochs
(/root/reference/train_patch2pix.py:119-193). The full-scale on-chip
run lives in tools/train_synth_demo.py (artifacts committed under
artifacts/).
"""

import jax
import numpy as np

from patch2pix_tpu.config import ModelConfig, OptimConfig
from patch2pix_tpu.data.synthetic import synthetic_batch
from patch2pix_tpu.models.patch2pix import Patch2Pix
from patch2pix_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def test_losses_decrease_on_synthetic_pairs():
    model = Patch2Pix(config=ModelConfig().resolved())
    optim_cfg = OptimConfig(lr_init=2e-3)
    state = create_train_state(
        rng=jax.random.PRNGKey(0), model=model, optim_cfg=optim_cfg,
        image_shape=(1, 96, 128, 3),
    )
    tx = make_optimizer(optim_cfg, state.params)
    # ptmax kept small: the point is the loss TREND, not the recipe
    # scale (tools/train_synth_demo.py runs the full-scale recipe on
    # chip); 24 steps x 48 proposals keeps this test under ~10 min on
    # the CPU fake backend
    step = jax.jit(make_train_step(model, tx, ksize=2, ptmax=48))

    rs = np.random.RandomState(0)
    batch = {k: jax.numpy.asarray(v)
             for k, v in synthetic_batch(rs, 2, 96, 128).items()}

    hist = []
    for i in range(24):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        hist.append({k: float(v) for k, v in metrics.items()})

    assert all(np.isfinite(h["loss/pair"]) for h in hist)
    # early steps may epi-skip a pair (random init, no inliers within
    # the gate); once learning has progressed every pair participates
    assert all(h["skipped"] == 0.0 for h in hist[-6:]), "pairs still skipped"

    def mean(key, sl):
        return float(np.mean([h[key] for h in hist[sl]]))

    head, tail = slice(0, 6), slice(-6, None)
    # epi losses measure pixel error of the regressed matches — the
    # direct optimisation target once cls saturates
    assert mean("loss/epi_fine", tail) < 0.7 * mean("loss/epi_fine", head), hist
    assert mean("loss/epi_mid", tail) < 0.9 * mean("loss/epi_mid", head), hist
    assert mean("loss/pair", tail) < 0.5 * mean("loss/pair", head), hist
