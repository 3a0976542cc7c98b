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
        per_chip_batch: Optional[int] = None,
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
        # Serving-batch default from the measured sweep (BASELINE.md
        # round 4): upsample-16 is fastest at per-chip B=1 (56.2 vs
        # 49.9 pairs/s at B=2 — batching doesn't recover the
        # inter-stage pipeline-underfill penalty), change_stride at
        # B=4 (27.2 vs 25.8). Buckets are chunked to this size so the
        # default configuration serves at the measured optimum.
        if per_chip_batch is None:
            per_chip_batch = 4 if model.config.change_stride else 1
        self.per_chip_batch = max(int(per_chip_batch), 1)
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
        self._jitted = jitted
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

    def lower(self, im1_shape: Tuple[int, ...], im2_shape=None):
        """Lower the sharded predict for a batch shape (under the same
        SPMD-safe dispatch gate the runtime path uses). Lets callers —
        tests and the driver dryrun — inspect the compiled program's
        collective set (the pair-sharded matcher must move NONE)."""
        import jax.numpy as jnp

        from patch2pix_tpu.ops.dispatch import spmd_safe_dispatch

        b1 = jnp.zeros(im1_shape, jnp.float32)
        b2 = jnp.zeros(im2_shape or im1_shape, jnp.float32)
        with spmd_safe_dispatch():
            return self._jitted.lower(self.variables, b1, b2)

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
        chunk = self.per_chip_batch * self.n_dev
        for key, ids in buckets.items():
            # chunk the bucket to the measured-optimal per-chip batch;
            # every chunk is padded to the same device-divisible size so
            # one compiled shape serves the whole bucket
            for lo in range(0, len(ids), chunk):
                ids_c = ids[lo : lo + chunk]
                n = len(ids_c)
                ids_p = ids_c + ids_c[-1:] * (chunk - n)
                b1 = jnp.asarray(np.stack([loaded[i][0] for i in ids_p]))
                b2 = jnp.asarray(np.stack([loaded[i][1] for i in ids_p]))
                coords, scores, valid, coarse = self._predict(
                    self.variables, b1, b2
                )
                coords = np.asarray(coords)
                scores = np.asarray(scores)
                valid = np.asarray(valid)
                coarse = np.asarray(coarse)
                for row, i in enumerate(ids_c):
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
