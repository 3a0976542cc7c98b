"""Inference façade: load checkpoints and estimate matches on images.

Capability parity with /root/reference/utils/eval/model_helper.py:
``load_model`` :28, ``estimate_matches`` :64, the matcher factories
:10-26 and plug-in ``refine_matches`` :111 — TPU redesign:

  * matching runs under jit with a per-image-shape compile cache; the
    reference's flexible resize already snaps sizes to multiples of
    ``upsample * ksize`` (shape bucketing for free),
  * the fixed-shape (N, 4)+mask device output is converted to the
    reference's variable-length numpy contract at the host boundary,
  * checkpoints: reference ``.pth`` files are converted on the fly
    (patch2pix_tpu.utils.torch_import); orbax directories restore
    natively (patch2pix_tpu.train.checkpoint).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.config import ModelConfig, RegressorConfig
from patch2pix_tpu.data.preprocess import load_im_flexible, load_im_tensor
from patch2pix_tpu.models.patch2pix import Patch2Pix


def _config_from_torch_ckpt(ckpt: dict, method: str) -> ModelConfig:
    """Reference checkpoint dict -> ModelConfig.

    The reference persists backbone/feat_idx/change_stride and a
    regressor_config Namespace inside the .pth
    (/root/reference/utils/train/helper.py:9-33); eval forces panc=1
    (/root/reference/utils/eval/model_helper.py:46).
    """
    if "patch2pix" in method:
        rc = ckpt["regressor_config"]
        reg = RegressorConfig(
            feat_comb=getattr(rc, "feat_comb", "pre"),
            conv_kers=tuple(getattr(rc, "conv_kers", (3, 3))),
            conv_dims=tuple(getattr(rc, "conv_dims", (512, 512))),
            conv_strs=tuple(getattr(rc, "conv_strs", (2, 1))),
            fc_dims=tuple(getattr(rc, "fc_dims", (512, 256))),
            psize=tuple(getattr(rc, "psize", (16, 16))),
            pshift=int(getattr(rc, "pshift", 8)),
            panc=1,
            shared=bool(getattr(rc, "shared", False)),
        )
        return ModelConfig(
            backbone=ckpt.get("backbone", "ResNet34"),
            change_stride=bool(ckpt.get("change_stride", True)),
            feat_idx=tuple(ckpt.get("feat_idx", (0, 1, 2, 3))),
            regressor=reg,
        ).resolved()
    # NCNet-only coarse matcher: Patch2Pix without regressors, exactly
    # how the reference builds method='nc'
    # (/root/reference/utils/eval/model_helper.py:53-57)
    return ModelConfig(
        backbone="ResNet34", change_stride=True, regressor=None
    ).resolved()


def load_model(
    ckpt_path: str, method: str = "patch2pix"
) -> Tuple[Patch2Pix, dict]:
    """Build a Patch2Pix model + variables from a checkpoint.

    ``ckpt_path`` may be a reference ``.pth`` file or an orbax
    checkpoint directory produced by ``patch2pix_tpu.train``.
    """
    if os.path.isdir(ckpt_path):
        from patch2pix_tpu.train.checkpoint import restore_for_eval

        return restore_for_eval(ckpt_path)

    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict):
        raise ValueError(f"unsupported checkpoint object: {type(ckpt)}")
    cfg = _config_from_torch_ckpt(ckpt, method)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    from patch2pix_tpu.utils.torch_import import (
        convert_patch2pix_state_dict,
        merge_variables,
    )

    model = Patch2Pix(config=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dummy = jnp.zeros((1, 96, 128, 3), jnp.float32)
    if cfg.regressor is not None:
        variables = model.init(
            {"params": k1, "proposal": k2}, dummy, dummy, ksize=2, ptmax=8,
            train=False,
        )
    else:
        variables = model.init(
            {"params": k1}, dummy, dummy, ksize=2,
            method=model.predict_coarse,
        )
    params, stats = convert_patch2pix_state_dict(sd)
    variables = merge_variables(variables, params, stats)
    return model, variables


class Matcher:
    """Callable matcher with a per-shape jit cache."""

    def __init__(
        self,
        model: Patch2Pix,
        variables: dict,
        ksize: int = 2,
        io_thres: float = 0.25,
        ncn_thres: float = 0.0,
        mutual: bool = True,
        imsize: Optional[int] = None,
        eval_type: str = "fine",
        fine_cap: Optional[int] = 1200,
    ):
        self.model = model
        self.variables = variables
        self.ksize = ksize
        self.io_thres = io_thres
        self.ncn_thres = ncn_thres
        self.mutual = mutual
        self.imsize = imsize
        self.eval_type = eval_type
        # static bound on rows entering the regression stages: exact
        # whenever a pair has <= fine_cap valid coarse matches (the
        # overwhelmingly common case), score-ranked truncation beyond.
        # 1200 anchors to the reference's regr_batch chunk size; the
        # stride-8 coarse grid has nb = 3072+ rows of which most are
        # invalid padding — capping them is the dominant eval speedup.
        self.fine_cap = fine_cap
        self.upsample = model.config.upsample
        # fine_cap observability: the capped match set equals the
        # uncapped one iff a pair had <= fine_cap valid coarse rows;
        # a pair whose post-cap valid count EQUALS the cap hit it
        # (top-scored truncation may have dropped rows). Counters let
        # deployments see how often the approximation engages. All
        # aggregates are O(1) per pair (running sum/min/max + a log2
        # histogram), so a long-lived Matcher never grows memory.
        self.cap_stats = self._fresh_cap_stats()

        @functools.partial(jax.jit, static_argnums=(3,))
        def _predict_fine(variables, im1, im2, mutual):
            fine, mid, coarse = self.model.apply(
                variables, im1, im2, ksize=self.ksize,
                ncn_thres=self.ncn_thres, mutual=mutual,
                fine_cap=self.fine_cap,
                method=self.model.predict_fine,
            )
            return fine, coarse

        @functools.partial(jax.jit, static_argnums=(3,))
        def _predict_coarse(variables, im1, im2, mutual):
            return self.model.apply(
                variables, im1, im2, ksize=self.ksize,
                ncn_thres=self.ncn_thres, mutual=mutual,
                method=self.model.predict_coarse,
            )

        self._predict_fine = _predict_fine
        self._predict_coarse = _predict_coarse

        @jax.jit
        def _refine(variables, im1, im2, coords):
            return self.model.apply(
                variables, im1, im2, coords, method=self.model.refine_matches
            )

        self._refine = _refine

    @staticmethod
    def _fresh_cap_stats() -> dict:
        return {
            "pairs": 0,
            "cap_hits": 0,
            "valid_sum": 0,
            "valid_min": None,
            "valid_max": None,
            # bucket k counts pairs with valid count in [2^k, 2^(k+1));
            # bucket 0 is the 0-or-1 corner. 24 buckets cover any image.
            "valid_hist": [0] * 24,
        }

    def _record_cap_stats(self, n_valid: int) -> None:
        s = self.cap_stats
        s["pairs"] += 1
        s["valid_sum"] += n_valid
        s["valid_min"] = (
            n_valid if s["valid_min"] is None else min(s["valid_min"], n_valid)
        )
        s["valid_max"] = (
            n_valid if s["valid_max"] is None else max(s["valid_max"], n_valid)
        )
        s["valid_hist"][min(max(n_valid, 1).bit_length() - 1, 23)] += 1
        if self.fine_cap is not None and n_valid >= self.fine_cap:
            s["cap_hits"] += 1

    # ------------------------------------------------------------ API

    def estimate_matches(
        self, im1_path: str, im2_path: str
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Match two images; returns (matches, scores, coarse_matches)
        in ORIGINAL image pixel coordinates — the reference contract
        (/root/reference/utils/eval/model_helper.py:64-109)."""
        im1, sc1 = load_im_flexible(
            im1_path, self.ksize, self.upsample, imsize=self.imsize
        )
        im2, sc2 = load_im_flexible(
            im2_path, self.ksize, self.upsample, imsize=self.imsize
        )
        upscale = np.asarray([*sc1, *sc2], np.float64)
        b1 = jnp.asarray(im1)[None]
        b2 = jnp.asarray(im2)[None]

        if self.eval_type == "coarse":
            cm = self._predict_coarse(self.variables, b1, b2, self.mutual)
            valid = np.asarray(cm.valid[0])
            matches = np.asarray(cm.coords[0])[valid] * upscale
            scores = np.asarray(cm.scores[0])[valid]
            return matches, scores, matches

        fine, coarse = self._predict_fine(self.variables, b1, b2, self.mutual)
        valid = np.asarray(fine.valid[0])
        self._record_cap_stats(int(valid.sum()))
        fmat = np.asarray(fine.coords[0])[valid]
        fscore = np.asarray(fine.scores[0])[valid]
        cmat = np.asarray(coarse.coords[0])[valid]

        # io_thres filter with the reference keep-all fallback
        pos = fscore > self.io_thres
        if pos.any():
            fmat, fscore, cmat = fmat[pos], fscore[pos], cmat[pos]
        return fmat * upscale, fscore, cmat * upscale

    __call__ = estimate_matches

    def refine_matches(
        self,
        im1_path: str,
        im2_path: str,
        coarse_matches: np.ndarray,
        io_thres: float = 0.0,
        max_matches: int = 2048,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Refine an external detector's matches (plug-in mode,
        /root/reference/networks/patch2pix.py:278-318).

        coarse_matches: (N, 4) pixel coords in the ORIGINAL frames.
        Returns (refined, scores, coarse) in original coords.
        """
        im1, _, sc1 = load_im_tensor(im1_path, self.imsize, with_gray=True)
        im2, _, sc2 = load_im_tensor(im2_path, self.imsize, with_gray=True)
        n = coarse_matches.shape[0]
        if n == 0:
            z = np.zeros((0, 4))
            return z, np.zeros((0,)), z
        downscale = 1.0 / np.asarray([*sc1, *sc2], np.float64)
        coords = np.asarray(coarse_matches, np.float64) * downscale

        # pad to a fixed slot count to bound jit recompiles
        slots = max_matches
        while slots < n:
            slots *= 2
        padded = np.zeros((1, slots, 4), np.float32)
        padded[0, :n] = coords
        fmat, fscore, _, _ = self._refine(
            self.variables, jnp.asarray(im1)[None], jnp.asarray(im2)[None],
            jnp.asarray(padded),
        )
        fmat = np.asarray(fmat[0])[:n]
        fscore = np.asarray(fscore[0])[:n]
        pos = fscore > io_thres
        if pos.any():
            fmat, fscore = fmat[pos], fscore[pos]
            coarse_matches = np.asarray(coarse_matches)[pos]
        return fmat / downscale, fscore, coarse_matches


def estimate_matches(
    model: Patch2Pix,
    variables: dict,
    im1_path: str,
    im2_path: str,
    ksize: int = 2,
    ncn_thres: float = 0.0,
    mutual: bool = True,
    io_thres: float = 0.25,
    eval_type: str = "fine",
    imsize: Optional[int] = None,
):
    """Functional one-shot API (compiles per call-shape; prefer the
    ``Matcher`` class in loops)."""
    return Matcher(
        model, variables, ksize=ksize, io_thres=io_thres,
        ncn_thres=ncn_thres, mutual=mutual, imsize=imsize,
        eval_type=eval_type,
    ).estimate_matches(im1_path, im2_path)


def init_patch2pix_matcher(
    ckpt: str, ksize: int = 2, io_thres: float = 0.25, imsize: Optional[int] = None
) -> Matcher:
    model, variables = load_model(ckpt, method="patch2pix")
    return Matcher(
        model, variables, ksize=ksize, io_thres=io_thres, imsize=imsize,
        eval_type="fine",
    )


def init_ncn_matcher(
    ckpt: str, ksize: int = 2, ncn_thres: float = 0.0, imsize: Optional[int] = None
) -> Matcher:
    model, variables = load_model(ckpt, method="nc")
    return Matcher(
        model, variables, ksize=ksize, ncn_thres=ncn_thres, imsize=imsize,
        eval_type="coarse", mutual=True,
    )
