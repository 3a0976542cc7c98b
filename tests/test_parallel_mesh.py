"""Mesh/sharding helpers on the 8-device fake mesh."""

import jax
import numpy as np

from patch2pix_tpu.parallel.mesh import (
    data_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
    shard_batch,
)


def test_make_mesh_and_shardings():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    sh = data_sharding(mesh)
    rep = replicated(mesh)
    batch = {"x": np.zeros((8, 4), np.float32), "y": np.zeros((8,), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding == sh
    # sharded batch splits the leading dim across devices
    shards = out["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)
    assert rep.is_fully_replicated


def test_initialize_multihost_noop_single_host():
    initialize_multihost(num_processes=1)  # must be a no-op
    initialize_multihost(num_processes=None)
