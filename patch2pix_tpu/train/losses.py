"""Epipolar-guided classification + regression losses, fully vectorised.

Capability parity with the reference's per-pair loss loop
(/root/reference/train_patch2pix.py:119-193), re-designed for TPU:
the Python ``zip`` loop + ``continue`` skip logic becomes masked
reductions over a fixed ``(B, N)`` tensor, so the whole loss lives
inside one jitted train step with no host synchronisation.

Reference semantics preserved exactly:
  * labels: mid positives = sampson(coarse, F) < cls_dthres[0],
    fine positives = sampson(mid, F) < cls_dthres[1]
    (/root/reference/train_patch2pix.py:135-136),
  * class balance: positives weighted by neg_sum/pos_sum (:144,148),
  * a pair with zero mid- or fine-positives contributes nothing
    (:140-142); a pair with no epi inliers keeps its cls term (appended
    at :153, before the epi check) but contributes no epi term (:170-172),
  * epi loss = emid_weight * mean(mdist[cdist < epi_dthres[0]])
             + efine_weight * mean(fdist[mdist < epi_dthres[1]]) (:174-176),
  * total = weight_cls * mean_pairs(cls) + mean_pairs(epi) (:191-193).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from patch2pix_tpu.ops.geometry import sampson_dist_batched


def _masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    """Mean of ``x`` over elements where ``mask``; 0 where mask empty."""
    mask = mask.astype(x.dtype)
    s = jnp.sum(x * mask, axis=axis)
    c = jnp.sum(mask, axis=axis)
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def _bce(probs: jax.Array, labels: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Elementwise binary cross entropy on probabilities.

    Matches ``nn.functional.binary_cross_entropy`` on sigmoid outputs
    (the reference feeds probabilities, not logits); probabilities are
    clipped for numerical stability.
    """
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


def patch2pix_losses(
    outputs: Dict[str, jax.Array],
    Fs: jax.Array,
    cls_dthres: Tuple[float, float] = (50.0, 5.0),
    epi_dthres: Tuple[float, float] = (50.0, 5.0),
    weight_cls: float = 10.0,
    weight_epi: Tuple[float, float] = (1.0, 1.0),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total training loss from a Patch2Pix forward output dict.

    Args:
      outputs: dict from ``Patch2Pix.__call__`` with keys
        ``coarse/mid/fine`` (each ``(B, N, 4)``) and
        ``mid_probs/fine_probs`` (``(B, N)``).
      Fs: ``(B, 3, 3)`` ground-truth fundamental matrices (pixel frame).
      cls_dthres: sampson thresholds defining mid/fine positives.
      epi_dthres: sampson thresholds selecting epi-loss inliers.
      weight_cls: classification loss weight (reference ``weight_cls``).
      weight_epi: (fine, mid) epipolar weights — the reference unpacks
        ``efine_weight, emid_weight = args.weight_epi``
        (/root/reference/train_patch2pix.py:87).

    Returns:
      (scalar loss, metrics dict). Metrics mirror the reference visdom
      schema names (loss/cls_mid, loss/epi_fine, cls_ratios, skipped).
    """
    efine_w, emid_w = float(weight_epi[0]), float(weight_epi[1])

    cdist = sampson_dist_batched(outputs["coarse"], Fs)  # (B, N)
    mdist = sampson_dist_batched(outputs["mid"], Fs)
    fdist = sampson_dist_batched(outputs["fine"], Fs)

    mcls_pos = (cdist < cls_dthres[0]).astype(jnp.float32)  # (B, N)
    fcls_pos = (mdist < cls_dthres[1]).astype(jnp.float32)
    mpos_sum = jnp.sum(mcls_pos, axis=1)  # (B,)
    fpos_sum = jnp.sum(fcls_pos, axis=1)
    n = jnp.asarray(cdist.shape[1], jnp.float32)

    # a pair participates at all only if it has both mid & fine positives
    pair_cls_valid = (mpos_sum > 0) & (fpos_sum > 0)  # (B,)

    def balanced_bce(probs, pos, pos_sum):
        neg = 1.0 - pos
        neg_sum = n - pos_sum
        w = (neg_sum / jnp.maximum(pos_sum, 1.0))[:, None] * pos + neg
        return jnp.mean(w * _bce(probs, pos), axis=1)  # (B,)

    mcls_lss = balanced_bce(outputs["mid_probs"], mcls_pos, mpos_sum)
    fcls_lss = balanced_bce(outputs["fine_probs"], fcls_pos, fpos_sum)
    cls_pair = mcls_lss + fcls_lss  # (B,)

    # epipolar terms over gt-thresholded subsets
    mids = cdist < epi_dthres[0]  # (B, N)
    fids = mdist < epi_dthres[1]
    epi_mid = _masked_mean(mdist, mids, axis=1)  # (B,)
    epi_fine = _masked_mean(fdist, fids, axis=1)
    pair_epi_valid = pair_cls_valid & (jnp.any(mids, axis=1) | jnp.any(fids, axis=1))
    epi_pair = emid_w * epi_mid + efine_w * epi_fine  # (B,)

    cls_loss = _masked_mean(cls_pair, pair_cls_valid)
    epi_loss = _masked_mean(epi_pair, pair_epi_valid)
    loss = weight_cls * cls_loss + epi_loss

    cthres = 0.5
    mpred = (outputs["mid_probs"] > cthres).astype(jnp.float32)
    fpred = (outputs["fine_probs"] > cthres).astype(jnp.float32)
    mid_epi_mask = pair_epi_valid & jnp.any(mids, axis=1)
    fine_epi_mask = pair_epi_valid & jnp.any(fids, axis=1)
    metrics = {
        "loss/pair": loss,
        "loss/cls_mid": _masked_mean(mcls_lss, pair_cls_valid),
        "loss/cls_fine": _masked_mean(fcls_lss, pair_cls_valid),
        "loss/epi_mid": _masked_mean(epi_mid, mid_epi_mask),
        "loss/epi_fine": _masked_mean(epi_fine, fine_epi_mask),
        "cls_ratios/mpos_gt": jnp.mean(mpos_sum / n),
        "cls_ratios/fpos_gt": jnp.mean(fpos_sum / n),
        "cls_ratios/mpos_pred": jnp.mean(jnp.sum(mpred, axis=1) / n),
        "cls_ratios/fpos_pred": jnp.mean(jnp.sum(fpred, axis=1) / n),
        # the reference counts a pair once if it skips at EITHER gate:
        # no cls positives (:140-142) or no epi inliers (:170-172);
        # the two cases are exactly the pairs with ~pair_epi_valid
        "skipped": jnp.sum(~pair_epi_valid).astype(jnp.float32),
        # match-distance family (the reference's match_dist 8-legend
        # visdom group, /root/reference/utils/train/helper.py:147-150 +
        # train_patch2pix.py:183-188): *_gt legends are distances over
        # GT-thresholded subsets; the *_pred legends are declared in
        # the reference schema but never appended there — here they
        # carry the analogous distances over PREDICTED-positive sets.
        "match_dist/cmid_gt": _masked_mean(
            _masked_mean(cdist, mids, axis=1), mid_epi_mask
        ),
        "match_dist/mmid_gt": _masked_mean(epi_mid, mid_epi_mask),
        "match_dist/mfid_gt": _masked_mean(
            _masked_mean(mdist, fids, axis=1), fine_epi_mask
        ),
        "match_dist/ffid_gt": _masked_mean(epi_fine, fine_epi_mask),
        "match_dist/cmid_pred": _masked_mean(
            _masked_mean(cdist, mpred, axis=1), pair_cls_valid
        ),
        "match_dist/mmid_pred": _masked_mean(
            _masked_mean(mdist, mpred, axis=1), pair_cls_valid
        ),
        "match_dist/mfid_pred": _masked_mean(
            _masked_mean(mdist, fpred, axis=1), pair_cls_valid
        ),
        "match_dist/ffid_pred": _masked_mean(
            _masked_mean(fdist, fpred, axis=1), pair_cls_valid
        ),
    }
    # classification-metric family (the reference's plot_cls_metric,
    # /root/reference/utils/train/helper.py:157-195): per-pair
    # rec/prec/spec/acc/f1 appended only for pairs past the cls gate,
    # epoch-aggregated as means — reproduced as masked batch means.
    for tag, pred, gt, pos_sum in (
        ("cls_mid", mpred, mcls_pos, mpos_sum),
        ("cls_fine", fpred, fcls_pos, fpos_sum),
    ):
        tp = jnp.sum(pred * gt, axis=1)
        tn = jnp.sum((1.0 - pred) * (1.0 - gt), axis=1)
        ppred = jnp.sum(pred, axis=1)
        ngt = n - pos_sum
        rec = jnp.where(
            pos_sum > 0, tp / jnp.maximum(pos_sum, 1.0),
            (ppred == 0).astype(jnp.float32),
        )
        spec = jnp.where(
            ngt > 0, tn / jnp.maximum(ngt, 1.0),
            (ppred == n).astype(jnp.float32),
        )
        prec = jnp.where(ppred > 0, tp / jnp.maximum(ppred, 1.0), 0.0)
        acc = jnp.mean((pred == gt).astype(jnp.float32), axis=1)
        f1 = jnp.where(
            prec + rec > 0, 2.0 * prec * rec / jnp.maximum(prec + rec, 1e-12), 0.0
        )
        metrics[f"{tag}/rec"] = _masked_mean(rec, pair_cls_valid)
        metrics[f"{tag}/prec"] = _masked_mean(prec, pair_cls_valid)
        metrics[f"{tag}/spec"] = _masked_mean(spec, pair_cls_valid)
        metrics[f"{tag}/acc"] = _masked_mean(acc, pair_cls_valid)
        metrics[f"{tag}/f1"] = _masked_mean(f1, pair_cls_valid)
    return loss, metrics
