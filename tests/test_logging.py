"""Lazy MetricsWriter + device prefetcher."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from patch2pix_tpu.data.prefetch import prefetch_to_device
from patch2pix_tpu.utils.logging import MetricsWriter


def test_metrics_writer_lazy_device_scalars(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path, "train")
    # device scalars queue without conversion; one drain at flush
    w.append({"loss": jnp.float32(2.0), "acc": jnp.float32(0.5)})
    w.append({"loss": jnp.float32(4.0), "acc": jnp.float32(jnp.nan)})
    assert w._pending  # nothing drained yet
    means = w.flush(1)
    assert means["loss"] == 3.0
    assert means["acc"] == 0.5  # nan filtered
    rec = json.loads(open(path).read().splitlines()[0])
    assert rec["epoch"] == 1 and rec["loss"] == 3.0


def test_metrics_writer_stacked_scan_metrics():
    w = MetricsWriter(None)
    # a scan over 3 steps returns stacked (3,) metrics: each element
    # counts as one appended value
    w.append({"loss": jnp.asarray([1.0, 2.0, 3.0])})
    w.append({"loss": jnp.asarray([5.0])})
    assert w.means()["loss"] == 2.75


def test_prefetch_to_device_order_and_errors():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError as e:
        raised = "boom" in str(e)
    assert raised


def test_prefetch_early_abandon_releases_producer():
    """A consumer that stops early (the --steps_per_epoch break in
    train/cli.py) must release the producer thread instead of leaving
    it blocked on a full queue with staged device buffers."""
    import threading
    import time

    n_started = len([t for t in threading.enumerate()])
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2,), i, np.float32)}

    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()  # abandon: generator finalizer must stop the thread
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if len(threading.enumerate()) <= n_started:
            break
        time.sleep(0.05)
    assert len(threading.enumerate()) <= n_started
    # the producer stopped near the staging depth, not at 100
    assert len(produced) <= 8

    # tuple-shaped batches prefetch fine (error marker is a class,
    # not a tagged tuple that device arrays get compared against)
    tup = [(np.zeros((2,), np.float32), np.ones((2,), np.float32))]
    out = list(prefetch_to_device(iter(tup), size=2))
    assert len(out) == 1 and isinstance(out[0], tuple)


def test_prefetch_with_mesh_sharding():
    """Prefetching with a NamedSharding pytree stages batches sharded
    over the data axis (the sharded train-step path in train/cli.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    sh = {"im": NamedSharding(mesh, P("data")),
          "F": NamedSharding(mesh, P("data"))}
    batches = [
        {"im": np.full((4, 8, 8, 3), i, np.float32),
         "F": np.full((4, 3, 3), i, np.float32)}
        for i in range(3)
    ]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=sh))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert b["im"].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(b["im"]), batches[i]["im"])
