"""Pure-function kernel library.

Every op has a reference jnp implementation; the hot ones additionally
have a Pallas fast path under ``patch2pix_tpu.ops.pallas`` that is
unit-tested against the jnp version.
"""

from patch2pix_tpu.ops.correlation import (
    l2_normalize,
    feat_correlation,
    mutual_matching,
    maxpool4d,
)
from patch2pix_tpu.ops.conv4d import conv4d
from patch2pix_tpu.ops.match_extract import (
    corr_to_matches,
    mutual_consistency_mask,
    select_ptmax,
    Matches,
)
from patch2pix_tpu.ops.patch_gather import gather_local_patches
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
