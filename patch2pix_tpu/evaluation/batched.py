"""Mesh-sharded batched matching for evaluation sweeps.

BASELINE.json config 3: "Full HPatches eval ... batched pairs sharded
per chip". Image pairs are bucketed by (padded) shape, stacked into
device-count-divisible batches, and the full fine-matching pipeline
runs under one jit with the batch dimension sharded over the ``data``
mesh axis — each chip matches its own pairs, no cross-chip traffic.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patch2pix_tpu.data.preprocess import load_im_flexible
from patch2pix_tpu.parallel.mesh import make_mesh


class BatchedMatcher:
    """Match many image pairs with pair-parallel device sharding.

    Same per-pair contract as ``Matcher.estimate_matches`` (matches,
    scores, coarse in original pixel coords), but amortised over a
    mesh: pairs with the same processed shape are stacked and sharded.
    """

    def __init__(
        self,
        model,
        variables,
        mesh: Optional[Mesh] = None,
        ksize: int = 2,
        io_thres: float = 0.25,
        ncn_thres: float = 0.0,
        mutual: bool = True,
        imsize: Optional[int] = None,
        fine_cap: Optional[int] = 1200,
    ):
        self.model = model
        self.variables = variables
        self.mesh = mesh or make_mesh()
        self.n_dev = int(np.prod(list(self.mesh.shape.values())))
        self.ksize = ksize
        self.io_thres = io_thres
        self.ncn_thres = ncn_thres
        self.mutual = mutual
        self.imsize = imsize
        self.fine_cap = fine_cap  # see evaluation.matcher.Matcher
        self.upsample = model.config.upsample

        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("data"))

        def predict(variables, im1, im2):
            fine, mid, coarse = self.model.apply(
                variables, im1, im2, ksize=self.ksize,
                ncn_thres=self.ncn_thres, mutual=self.mutual,
                fine_cap=self.fine_cap,
                # per-image backbone on a sharded batch: the cross-pair
                # concat would reshard (see extract_pyramid_pair)
                stack_backbone=self.n_dev == 1,
                method=self.model.predict_fine,
            )
            return fine.coords, fine.scores, fine.valid, coarse.coords

        jitted = jax.jit(
            predict,
            in_shardings=(repl, shard, shard),
            out_shardings=(shard, shard, shard, shard),
        )
        if self.n_dev > 1:
            # Pallas custom calls are opaque to the SPMD partitioner
            # and the merged-flat conv4d shifts cross pair boundaries —
            # trace with the SPMD-safe dispatch so the compiled matcher
            # is collective-free (pairs are fully independent)
            from patch2pix_tpu.ops.dispatch import spmd_safe_dispatch

            def sharded_predict(variables, im1, im2):
                with spmd_safe_dispatch():
                    return jitted(variables, im1, im2)

            self._predict = sharded_predict
        else:
            self._predict = jitted

    def match_pairs(
        self, pairs: Sequence[Tuple[str, str]]
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Match a list of (im1_path, im2_path); returns per-pair
        (matches, scores, coarse) in original pixel coordinates."""
        # load + bucket by processed shape
        loaded = []
        buckets: Dict[Tuple, List[int]] = defaultdict(list)
        for idx, (pa, pb) in enumerate(pairs):
            im1, sc1 = load_im_flexible(pa, self.ksize, self.upsample, self.imsize)
            im2, sc2 = load_im_flexible(pb, self.ksize, self.upsample, self.imsize)
            loaded.append((im1, im2, np.asarray([*sc1, *sc2])))
            buckets[(im1.shape, im2.shape)].append(idx)

        results: List = [None] * len(pairs)
        for key, ids in buckets.items():
            # pad the bucket to a device-divisible batch
            n = len(ids)
            pad = (-n) % self.n_dev
            ids_p = ids + ids[-1:] * pad
            b1 = jnp.asarray(np.stack([loaded[i][0] for i in ids_p]))
            b2 = jnp.asarray(np.stack([loaded[i][1] for i in ids_p]))
            coords, scores, valid, coarse = self._predict(
                self.variables, b1, b2
            )
            coords = np.asarray(coords)
            scores = np.asarray(scores)
            valid = np.asarray(valid)
            coarse = np.asarray(coarse)
            for row, i in enumerate(ids):
                v = valid[row]
                m = coords[row][v]
                s = scores[row][v]
                c = coarse[row][v]
                pos = s > self.io_thres
                if pos.any():
                    m, s, c = m[pos], s[pos], c[pos]
                up = loaded[i][2]
                results[i] = (m * up, s, c * up)
        return results

    def __call__(self, im1_path: str, im2_path: str):
        return self.match_pairs([(im1_path, im2_path)])[0]
