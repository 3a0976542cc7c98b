from patch2pix_tpu.sfm.ba import (
    BAProblem,
    build_problem,
    cost,
    reprojection_rmse,
    run_ba,
)
from patch2pix_tpu.sfm.dist_ba import ShardedBA, run_dist_ba, shard_problem
from patch2pix_tpu.sfm.incremental import (
    IncrementalSfM,
    Reconstruction,
    export_colmap,
)
from patch2pix_tpu.sfm.metrics import ate_rmse, rotation_errors_deg, umeyama_alignment
from patch2pix_tpu.sfm.pnp import PnPResult, dlt_pnp, ransac_pnp
from patch2pix_tpu.sfm.tracks import build_tracks
from patch2pix_tpu.sfm.twoview import (
    TwoViewResult,
    decompose_essential,
    eight_point,
    estimate_relative_pose,
    normalize_points,
    ransac_essential,
    triangulate,
)

__all__ = [
    "BAProblem",
    "build_problem",
    "cost",
    "reprojection_rmse",
    "run_ba",
    "ShardedBA",
    "run_dist_ba",
    "shard_problem",
    "IncrementalSfM",
    "Reconstruction",
    "export_colmap",
    "ate_rmse",
    "rotation_errors_deg",
    "umeyama_alignment",
    "PnPResult",
    "dlt_pnp",
    "ransac_pnp",
    "build_tracks",
    "TwoViewResult",
    "decompose_essential",
    "eight_point",
    "estimate_relative_pose",
    "normalize_points",
    "ransac_essential",
    "triangulate",
]
