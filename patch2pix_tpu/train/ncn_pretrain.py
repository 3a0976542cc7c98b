"""NCNet weak-supervision pretraining for the neighbourhood consensus.

The reference *ships* an NCN checkpoint pretrained on IVD
(``ncn_ivd_5ep.pth``, /root/reference/pretrained/download.sh) and
initialises Patch2Pix from it (``--pretrain``), but contains no code
to produce one. This module implements the NCNet objective natively so
users can pretrain from scratch: maximise the mean hard-assigned
(soft-max) matching score on matching pairs and minimise it on
non-matching pairs,

    L = mean_s(src, neg) - mean_s(src, pos),
    mean_s = mean over both matching directions of
             max_softmax(corr4d) per cell,

which is differentiable through the consensus filter (the Pallas
conv4d kernel carries a custom VJP for exactly this path). The
backbone stays frozen, matching how the NCN checkpoint is consumed.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from patch2pix_tpu.ops.match_extract import corr_to_matches


def mean_match_score(model, variables, im1, im2, ksize: int = 1) -> jax.Array:
    """Mean of both directions' per-cell max softmax scores."""
    feats1 = model.apply(variables, im1, method=lambda m, x: m.extract(x))
    feats2 = model.apply(variables, im2, method=lambda m, x: m.extract(x))
    corr, delta4d = model.apply(
        variables, feats1, feats2, ksize,
        method=lambda m, a, b, k: m.coarse_corr(a, b, k),
    )
    _, scores, _ = corr_to_matches(corr, delta4d, ksize=ksize)
    return jnp.mean(scores)


def ncn_weak_loss(
    model, variables, batch: Dict[str, jax.Array], ksize: int = 1
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch: im_src / im_pos / im_neg, each (B, H, W, 3)."""
    s_pos = mean_match_score(model, variables, batch["im_src"], batch["im_pos"], ksize)
    s_neg = mean_match_score(model, variables, batch["im_src"], batch["im_neg"], ksize)
    loss = s_neg - s_pos
    return loss, {"loss/nc": loss, "score/pos": s_pos, "score/neg": s_neg}


def make_ncn_pretrain_step(model, lr: float = 5e-4, ksize: int = 1):
    """Jitted step updating ONLY the NCN parameters."""
    tx = optax.multi_transform(
        {"train": optax.adam(lr), "frozen": optax.set_to_zero()},
        lambda params: {
            k: ("train" if k == "ncn" else "frozen") for k in params
        },
    )

    def init_opt(params):
        return tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            return ncn_weak_loss(model, variables, batch, ksize)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, metrics

    return step, init_opt
