"""Pure-function kernel library.

Every op has a reference jnp implementation; the hot ones additionally
have Pallas/layout-specialised fast paths (``conv4d_pallas``,
``gather_local_patches_grid``) that are unit-tested against the
reference versions and auto-dispatched where exact.
"""

from patch2pix_tpu.ops.correlation import (
    l2_normalize,
    feat_correlation,
    mutual_matching,
    maxpool4d,
)
from patch2pix_tpu.ops.conv4d import conv4d, conv4d_xla_taps
from patch2pix_tpu.ops.conv4d_pallas import conv4d_pallas
from patch2pix_tpu.ops.match_extract import (
    corr_to_matches,
    mutual_consistency_mask,
    select_ptmax,
    Matches,
)
from patch2pix_tpu.ops.patch_gather import (
    gather_local_patches,
    gather_local_patches_grid,
    gather_local_patches_ref,
)
from patch2pix_tpu.ops.geometry import (
    sampson_dist,
    sym_epi_dist,
    pose2fund,
    pose2ess,
    ess2fund,
    fund2ess,
    skew,
)

__all__ = [
    "l2_normalize",
    "feat_correlation",
    "mutual_matching",
    "maxpool4d",
    "conv4d",
    "corr_to_matches",
    "mutual_consistency_mask",
    "select_ptmax",
    "Matches",
    "gather_local_patches",
    "sampson_dist",
    "sym_epi_dist",
    "pose2fund",
    "pose2ess",
    "ess2fund",
    "fund2ess",
    "skew",
]
