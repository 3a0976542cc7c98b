"""Patch2Pix pipeline: coarse 4D-correlation matching + two-stage
pixel-level regression.

Capability parity with /root/reference/networks/patch2pix.py (class
``Patch2Pix``: ``forward`` :220, ``predict_coarse`` :240,
``predict_fine`` :250, ``refine_matches`` :278, ``cal_coarse_matches``
:340, ``shift_to_anchors`` :377, ``parse_regressor_out`` :138), with the
TPU redesign:

  * all match plumbing is fixed-shape ``(B, N, 4)`` + validity masks —
    the per-pair Python loops and host ``np.unique`` filtering are gone,
  * both regressor stages run as one batched forward over every
    proposal (no 1200-chunk loop),
  * ``predict_*`` are pure functions of (params, images) and jit
    cleanly with static shapes.

The "NCNet-only" configuration of the reference (ImMatchNet,
/root/reference/networks/ncn/model.py:215) is this model with
``config.regressor = None`` — exactly how the reference's own eval path
builds it (/root/reference/utils/eval/model_helper.py:53-57).

Behavioural quirks preserved (accuracy-relevant, see SURVEY.md §7):
  * regressor offsets are ``psize * tanh(relu(out)) - psize/2``,
  * coarse matches are grid indices * upsample + upsample/2,
  * eval forces panc=1; training expands each proposal to 8 corner
    anchors shifted by ``pshift``,
  * match coords are clamped to ``[0, W]`` (inclusive W, as the
    reference does).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from patch2pix_tpu.config import ModelConfig
from patch2pix_tpu.models.resnet import BACKBONES
from patch2pix_tpu.models.ncn import NeighConsensus
from patch2pix_tpu.models.regressor import FeatRegressNet
from patch2pix_tpu.ops.conv4d import _tpu_backend
from patch2pix_tpu.ops.correlation import (
    l2_normalize,
    feat_correlation,
    maxpool4d,
    maxpool4d_values,
    mutual_matching,
)
from patch2pix_tpu.ops.corr_pool_pallas import (
    corr_pool_fused,
    corr_pool_supported,
)
from patch2pix_tpu.ops.match_extract import (
    Matches,
    corr_to_matches,
    grid_to_pixel,
    mutual_consistency_mask,
    score_threshold_mask,
    select_ptmax,
)
from patch2pix_tpu.ops.patch_gather import (
    gather_local_patches_grid_levels,
    gather_local_patches_levels,
    gather_local_patches_tiled_levels,
    gather_scaled_patch_pairs_fused,
    make_padded_tiles_levels,
)


def _tileable(feats, psize: int) -> bool:
    """Static check: every pyramid level supports the 2x2-superblock
    row-gather (input dims multiples of psize and >= 2*psize)."""
    h, w = feats[0].shape[1], feats[0].shape[2]
    return h % psize == 0 and w % psize == 0 and h >= 2 * psize and w >= 2 * psize


# proposal-count crossover for the fused VMEM-resident expansion kernel
# (measured on v5e, 1024x768 B=2: fine stage M=1536 at upsample-16 is
# faster unfused [50.4 vs 45.0 pairs/s], the change_stride stages at
# M=2400 faster fused [23.1 vs 21.7]); P2P_FUSED_MIN_M overrides
FUSED_GATHER_MIN_M = int(os.environ.get("P2P_FUSED_MIN_M", "2048"))


def _use_fused_gather(m: int) -> bool:
    from patch2pix_tpu.ops.dispatch import pallas_allowed

    return _tpu_backend() and pallas_allowed() and m >= FUSED_GATHER_MIN_M


def shift_to_anchors(coords: jax.Array, pshift: int, panc: int) -> jax.Array:
    """Expand each match to ``panc`` corner anchors.

    coords ``(B, N, 4)`` -> ``(B, N*panc, 4)``. The 8-anchor template
    shifts pt1 or pt2 to its four corners by ``pshift``
    (/root/reference/networks/patch2pix.py:377-402). panc=1 is identity.
    """
    if panc == 1:
        return coords
    s = float(pshift)
    template = jnp.asarray(
        [
            [-s, -s, 0, 0],
            [s, -s, 0, 0],
            [-s, s, 0, 0],
            [s, s, 0, 0],
            [0, 0, -s, -s],
            [0, 0, s, -s],
            [0, 0, -s, s],
            [0, 0, s, s],
        ],
        dtype=coords.dtype,
    )[:panc]
    b, n, _ = coords.shape
    out = coords[:, :, None, :] + template[None, None, :, :]
    return out.reshape(b, n * panc, 4)


def parse_regressor_out(
    out: jax.Array,
    in_coords: jax.Array,
    psize: int,
    ptype: str,
    bounds: Tuple[int, int, int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Raw regressor output -> refined matches + confidence.

    out ``(B, N, 5)``; in_coords ``(B, N, 4)``. Offsets follow the
    reference parameterisation ``psize * tanh(relu(o)) - psize/2``
    with clamping to the image bounds
    (/root/reference/networks/patch2pix.py:138-155).
    """
    w1, h1, w2, h2 = bounds
    offset = float(psize) * jnp.tanh(nn.relu(out[..., :4]))
    if ptype == "center":
        offset = offset - float(psize // 2)
    matches = in_coords.astype(jnp.float32) + offset
    io_probs = nn.sigmoid(out[..., 4])
    lims = jnp.asarray([w1, h1, w2, h2], dtype=jnp.float32)
    matches = jnp.clip(matches, 0.0, lims)
    return matches, io_probs


class Patch2Pix(nn.Module):
    """Full matching pipeline as a single Flax module."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype
        self.extract = BACKBONES[cfg.backbone](cfg.change_stride, dtype=dtype)
        self.ncn = NeighConsensus(
            kernel_sizes=(3, 3), channels=(16, 1), dtype=dtype
        )
        r = cfg.regressor
        if r is not None:
            self.regress_mid = FeatRegressNet(
                conv_dims=r.conv_dims, conv_kers=r.conv_kers,
                conv_strs=r.conv_strs, fc_dims=r.fc_dims,
                feat_comb=r.feat_comb, psize=r.psize[0], dtype=dtype,
                name="regress_mid",
            )
            if r.shared:
                self.regress_fine = self.regress_mid
            else:
                self.regress_fine = FeatRegressNet(
                    conv_dims=r.conv_dims, conv_kers=r.conv_kers,
                    conv_strs=r.conv_strs, fc_dims=r.fc_dims,
                    feat_comb=r.feat_comb, psize=r.psize[1], dtype=dtype,
                    name="regress_fine",
                )

    # ---------------- coarse stage ----------------

    def extract_pyramid(self, im: jax.Array, train: bool = False):
        """Backbone hypercolumn pyramid [im, conv1, layer1, layer2, layer3]."""
        return self.extract(im, train=train, pyramid=True)

    def extract_pyramid_pair(self, im1, im2, train: bool = False,
                             stack: bool = True):
        """Both images' pyramids in ONE stacked backbone call.

        Exact whenever BN runs on running averages (a per-channel
        affine — batch-size independent); measured 6.8 -> 6.0 ms
        (upsample-16) / 10.0 -> 9.3 ms (change_stride) per B=2
        iteration at 1024x768 vs two separate calls. Batch-stat BN
        (``train=True``) keeps per-image calls so the reference's
        per-image-batch statistics are preserved.

        ``stack=False`` also forces per-image calls: under a
        data-sharded mesh the cross-pair ``concatenate`` makes XLA
        reshard the doubled batch (all-to-alls + mesh-growing
        collective-permutes per step, see BASELINE.md round-4); the
        training path disables stacking so its compiled step contains
        ONLY the gradient all-reduce.
        """
        if train or not stack or im1.shape != im2.shape:
            return (
                self.extract_pyramid(im1, train=train),
                self.extract_pyramid(im2, train=train),
            )
        b = im1.shape[0]
        feats = self.extract_pyramid(
            jnp.concatenate([im1, im2], axis=0), train=train
        )
        return tuple(f[:b] for f in feats), tuple(f[b:] for f in feats)

    def coarse_corr(self, feat1: jax.Array, feat2: jax.Array, ksize: int = 1):
        """L2norm -> correlate -> pool -> mutual -> NCN -> mutual.

        Mirrors ``forward_coarse_match``
        (/root/reference/networks/patch2pix.py:120-136).
        """
        feat1 = l2_normalize(feat1, axis=-1)
        feat2 = l2_normalize(feat2, axis=-1)
        delta4d = None
        if ksize > 1 and corr_pool_supported(feat1, feat2, ksize):
            # fused Pallas correlation+pool: the pre-pool volume (1.2 GB
            # at change_stride eval scale) is never materialised; the
            # relocalisation offsets are a function of the features and
            # are recomputed lazily at the selected cells
            # (corr_pool_pallas.decode_delta_from_feats)
            corr = corr_pool_fused(
                feat1, feat2, interpret=not _tpu_backend()
            )
            delta4d = ("feats", feat1, feat2)
        elif ksize > 1:
            # values-only pooling; the raw pre-pool volume stands in
            # for delta4d and the relocalisation offsets are decoded
            # lazily at the selected cells (correlation.decode_delta_at)
            corr = feat_correlation(feat1, feat2)
            delta4d = corr
            corr = maxpool4d_values(corr, ksize)
        else:
            corr = feat_correlation(feat1, feat2)
        corr = mutual_matching(corr)
        corr = self.ncn(corr)
        corr = mutual_matching(corr)
        return corr, delta4d

    def coarse_matches(
        self,
        corr: jax.Array,
        delta4d,
        ksize: int,
        mutual: bool = True,
        ncn_thres: float = 0.0,
    ) -> Matches:
        """Correlation volume -> fixed-shape pixel matches with validity.

        Combines the reference's ``cal_coarse_matches`` + ``filter_coarse``
        (/root/reference/networks/patch2pix.py:340-375,
        /root/reference/networks/utils.py:38-72) as pure device ops.
        """
        nb = corr.shape[3] * corr.shape[4]
        grid, scores, mut = corr_to_matches(corr, delta4d, ksize=ksize)
        valid = mutual_consistency_mask(mut, nb, keep_mutual_only=mutual)
        valid = score_threshold_mask(valid, scores, ncn_thres)
        coords = grid_to_pixel(grid, upsample=self.config.upsample, center=True)
        return Matches(coords=coords, scores=scores, valid=valid)

    # ---------------- fine stage ----------------

    def _shared_tiles(self, feats1, feats2):
        """Pre-built padded tile rows shared by every regression stage
        on this pyramid pair (None when the tiled gather does not apply
        or the stages use different patch sizes)."""
        cfg = self.config
        r = cfg.regressor
        psize = r.psize[1]
        if (
            r.psize[0] != r.psize[1]
            or cfg.gather == "block"
            or not (_tileable(feats1, psize) and _tileable(feats2, psize))
        ):
            return None, None
        t1 = make_padded_tiles_levels(
            feats1, cfg.feat_idx, cfg.feats_downsample, psize
        )
        t2 = make_padded_tiles_levels(
            feats2, cfg.feat_idx, cfg.feats_downsample, psize
        )
        return t1, t2

    def fine_match(
        self,
        feats1,
        feats2,
        coords: jax.Array,
        stage: str,
        train: bool = False,
        grid_aligned: bool = False,
        tiles1=None,
        tiles2=None,
    ) -> Tuple[jax.Array, jax.Array]:
        """One regression stage over every proposal.

        coords ``(B, N, 4)`` -> (refined ``(B, N, 4)``, probs ``(B, N)``).
        ``grid_aligned=True`` asserts every coord is a coarse-cell
        centre (``g*psize + psize//2``) and takes the cheap
        space-to-depth gather path — exactly equal output.
        ``tiles1``/``tiles2``: optional pre-built padded tile rows
        (``make_padded_tiles_levels``) — the expensive pad+space-to-
        depth half of the superblock gather, hoisted so the mid and
        fine stages share one build per image.
        """
        cfg = self.config
        r = cfg.regressor
        psize = r.psize[0] if stage == "mid" else r.psize[1]
        regressor = self.regress_mid if stage == "mid" else self.regress_fine
        b, n, _ = coords.shape
        h1, w1 = feats1[0].shape[1], feats1[0].shape[2]
        h2, w2 = feats2[0].shape[1], feats2[0].shape[2]

        if grid_aligned:
            lv1, inv1 = gather_local_patches_grid_levels(
                feats1, coords[..., 0:2], cfg.feat_idx,
                cfg.feats_downsample, psize,
            )
            lv2, inv2 = gather_local_patches_grid_levels(
                feats2, coords[..., 2:4], cfg.feat_idx,
                cfg.feats_downsample, psize,
            )
        elif (
            r.feat_comb == "pre"
            and cfg.gather != "block"
            and _tileable(feats1, psize) and _tileable(feats2, psize)
            and _use_fused_gather(b * n)
        ):
            # fused gather -> expand -> normalise -> scale (Pallas on
            # TPU, identical-math XLA elsewhere): the expansion
            # intermediates never round-trip HBM and the C=64 levels
            # come out channel-paired so the regressor's first conv
            # runs fewer, fatter contractions
            patches, smap = gather_scaled_patch_pairs_fused(
                feats1, feats2, coords, cfg.feat_idx,
                cfg.feats_downsample, psize, cfg.compute_dtype,
                tiles1=tiles1, tiles2=tiles2,
            )
            out = regressor(
                patches, None, train=train, slice_map=smap
            ).reshape(b, n, 5)
            return parse_regressor_out(
                out, coords, psize, "center", (w1, h1, w2, h2)
            )
        else:
            # contiguous row-gather superblocks when the snapped sizes
            # allow it (always at eval/train resolutions); scattered
            # block slices otherwise
            gather = (
                gather_local_patches_tiled_levels
                if _tileable(feats1, psize) and _tileable(feats2, psize)
                and cfg.gather != "block"
                else gather_local_patches_levels
            )
            tiled = gather is gather_local_patches_tiled_levels
            lv1, inv1 = gather(
                feats1, coords[..., 0:2], cfg.feat_idx, cfg.feats_downsample,
                psize, ptype="center",
                **({"tiles": tiles1} if tiled and tiles1 is not None else {}),
            )
            lv2, inv2 = gather(
                feats2, coords[..., 2:4], cfg.feat_idx, cfg.feats_downsample,
                psize, ptype="center",
                **({"tiles": tiles2} if tiled and tiles2 is not None else {}),
            )

        # normalise + flatten per level; the regressor's SegmentedConv
        # contracts each level against its kernel slice, so the wide
        # hypercolumn concat never materialises. In bf16 configs the
        # normalizer multiply runs natively in bf16 (one elementwise
        # pass; the f32-upcast round-trip was ~6 ms/iter of pure
        # conversion traffic at change_stride eval scale)
        dtype = cfg.compute_dtype

        def scaled(levels, inv):
            invc = inv if dtype == jnp.float32 else inv.astype(dtype)
            return tuple(
                (lv.astype(dtype) * invc).reshape(
                    b * n, psize, psize, lv.shape[-1]
                )
                for lv in levels
            )

        out = regressor(
            scaled(lv1, inv1), scaled(lv2, inv2), train=train
        ).reshape(b, n, 5)
        return parse_regressor_out(out, coords, psize, "center", (w1, h1, w2, h2))

    # ---------------- end-to-end paths ----------------

    def __call__(
        self,
        im1: jax.Array,
        im2: jax.Array,
        ksize: int = 2,
        ptmax: int = 400,
        train: bool = True,
        backbone_train_bn: bool = False,
        remat: str = "none",
    ):
        """Training forward: coarse -> ptmax sample -> anchors -> mid -> fine.

        Returns a dict with every tensor the loss needs; all fixed-shape.

        ``remat``: rematerialisation of the regression stages — the
        (B, ptmax*panc, 16, 16, D) patch tensors and regressor
        activations dominate training memory (the reference needed a
        48 GB GPU for batch 4, README.md:82-84). Measured at that
        best-model scale on 1x 16 GB v5e (BASELINE.md round-4):
        "none" 372.9 ms/step (fits comfortably after the round-2/3
        activation-size reductions — default), "fine" 487.4, "both"
        602.7, "dots" 601.6. Use "fine"/"both" to trade time back for
        memory at larger batch/ptmax.
        """
        cfg = self.config
        r = cfg.regressor
        feats1, feats2 = self.extract_pyramid_pair(
            im1, im2, train=backbone_train_bn, stack=False
        )
        corr, delta4d = self.coarse_corr(feats1[-1], feats2[-1], ksize)
        cm = self.coarse_matches(corr, delta4d, ksize, mutual=True, ncn_thres=0.0)
        key = self.make_rng("proposal")
        sel = select_ptmax(key, cm.coords, cm.scores, cm.valid, ptmax)
        anchors = shift_to_anchors(sel.coords, r.pshift, r.panc)
        if remat in ("both", "fine"):
            fine_match_ckpt = nn.remat(
                Patch2Pix.fine_match, static_argnums=(4, 5, 6)
            )
        elif remat == "dots":
            fine_match_ckpt = nn.remat(
                Patch2Pix.fine_match, static_argnums=(4, 5, 6),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif remat == "none":
            fine_match_ckpt = Patch2Pix.fine_match
        else:
            raise ValueError(f"unknown remat mode {remat!r}")
        mid_ckpt = (
            Patch2Pix.fine_match if remat == "fine" else fine_match_ckpt
        )
        tiles1, tiles2 = self._shared_tiles(feats1, feats2)
        mid_matches, mid_probs = mid_ckpt(
            self, feats1, feats2, anchors, "mid", train, False,
            tiles1, tiles2,
        )
        fine_matches, fine_probs = fine_match_ckpt(
            self, feats1, feats2, mid_matches, "fine", train, False,
            tiles1, tiles2,
        )
        return {
            "coarse": anchors,
            "mid": mid_matches,
            "mid_probs": mid_probs,
            "fine": fine_matches,
            "fine_probs": fine_probs,
            "corr": corr,
        }

    def predict_coarse(
        self,
        im1: jax.Array,
        im2: jax.Array,
        ksize: int = 2,
        ncn_thres: float = 0.0,
        mutual: bool = False,
    ) -> Matches:
        """Coarse-only inference (the reference's NCNet-style matcher,
        /root/reference/networks/patch2pix.py:240-248)."""
        if im1.shape == im2.shape:
            feat = self.extract(
                jnp.concatenate([im1, im2], axis=0), train=False
            )
            feat1, feat2 = feat[: im1.shape[0]], feat[im1.shape[0]:]
        else:
            feat1 = self.extract(im1, train=False)
            feat2 = self.extract(im2, train=False)
        corr, delta4d = self.coarse_corr(feat1, feat2, ksize)
        return self.coarse_matches(corr, delta4d, ksize, mutual, ncn_thres)

    def predict_fine(
        self,
        im1: jax.Array,
        im2: jax.Array,
        ksize: int = 2,
        ncn_thres: float = 0.0,
        mutual: bool = True,
        fine_cap: Optional[int] = None,
        stack_backbone: bool = True,
    ):
        """Full inference (/root/reference/networks/patch2pix.py:250-276).

        Eval uses panc=1 so anchors are the coarse matches themselves.
        Returns (fine: Matches, mid: Matches, coarse: Matches) — all
        N rows with the coarse validity mask carried through.

        ``fine_cap``: optional static bound on the rows entering the
        regression stages. Valid rows are compacted to the front
        (score-ranked), so the result is EXACTLY the uncapped one
        whenever the pair has <= fine_cap valid coarse matches; beyond
        that the lowest-scoring matches are dropped (the reference has
        no eval cap, but at change_stride scale most of the nb = h2*w2
        rows are invalid padding and regressing them all is the
        dominant cost).

        ``stack_backbone=False``: per-image backbone calls — pass when
        the batch axis is sharded over a mesh (see
        extract_pyramid_pair; BatchedMatcher does this).
        """
        feats1, feats2 = self.extract_pyramid_pair(
            im1, im2, stack=stack_backbone
        )
        corr, delta4d = self.coarse_corr(feats1[-1], feats2[-1], ksize)
        cm = self.coarse_matches(corr, delta4d, ksize, mutual, ncn_thres)
        if mutual:
            # with mutual filtering every valid row lives in the
            # direction-1 half (mutual_consistency_mask zeroes the
            # direction-2 half), so the regressors only need the first
            # nb rows — half the proposal work for identical output
            nb = corr.shape[3] * corr.shape[4]
            cm = Matches(cm.coords[:, :nb], cm.scores[:, :nb], cm.valid[:, :nb])
        if fine_cap is not None and fine_cap < cm.coords.shape[1]:
            # compact valid rows to the front, highest score first
            rank = jnp.where(cm.valid, cm.scores, -jnp.inf)
            order = jnp.argsort(-rank, axis=1)[:, :fine_cap]  # (B, cap)
            cm = Matches(
                coords=jnp.take_along_axis(cm.coords, order[..., None], axis=1),
                scores=jnp.take_along_axis(cm.scores, order, axis=1),
                valid=jnp.take_along_axis(cm.valid, order, axis=1),
            )
        # at eval the coarse coords are exactly cell centres; when the
        # stride matches the patch size every mid patch is tile-aligned
        # and the cheap space-to-depth gather applies (bit-identical)
        r = self.config.regressor
        aligned = self.config.upsample == r.psize[0]
        tiles1, tiles2 = self._shared_tiles(feats1, feats2)
        mid_matches, mid_probs = self.fine_match(
            feats1, feats2, cm.coords, "mid", grid_aligned=aligned,
            tiles1=tiles1, tiles2=tiles2,
        )
        fine_matches, fine_probs = self.fine_match(
            feats1, feats2, mid_matches, "fine", tiles1=tiles1, tiles2=tiles2
        )
        return (
            Matches(fine_matches, fine_probs, cm.valid),
            Matches(mid_matches, mid_probs, cm.valid),
            cm,
        )

    def refine_matches(
        self, im1: jax.Array, im2: jax.Array, coords: jax.Array
    ):
        """Refine externally-provided coarse matches (plug-in mode,
        /root/reference/networks/patch2pix.py:278-318).

        coords: ``(B, N, 4)`` pixel matches from any detector.
        Returns (fine_matches, fine_probs, mid_matches, mid_probs).
        """
        feats1, feats2 = self.extract_pyramid_pair(im1, im2)
        tiles1, tiles2 = self._shared_tiles(feats1, feats2)
        mid_matches, mid_probs = self.fine_match(
            feats1, feats2, coords, "mid", tiles1=tiles1, tiles2=tiles2
        )
        fine_matches, fine_probs = self.fine_match(
            feats1, feats2, mid_matches, "fine", tiles1=tiles1, tiles2=tiles2
        )
        return fine_matches, fine_probs, mid_matches, mid_probs
