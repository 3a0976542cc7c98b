"""The jitted training step, single-chip and mesh-sharded.

Replaces the reference's hot loop body
(/root/reference/train_patch2pix.py:93-197): forward, coarse match
selection, anchor expansion, two regression stages, masked losses and
the optimizer update all fuse into ONE compiled function — none of the
reference's per-batch host syncs (``np.unique`` filtering, ``.item()``
telemetry, ``torch.cuda.empty_cache()``) exist on this path.

Multi-chip: pairs are data-parallel over the ``data`` mesh axis
(BASELINE "batched pair sharding"); parameters/optimizer state are
replicated and gradients are combined by jit's automatic ``psum``
under ``NamedSharding`` constraints — collectives ride ICI.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patch2pix_tpu.train.losses import patch2pix_losses
from patch2pix_tpu.train.state import TrainState


def make_train_step(
    model,
    tx,
    ksize: int = 2,
    ptmax: int = 400,
    cls_dthres=(50.0, 5.0),
    epi_dthres=(50.0, 5.0),
    weight_cls: float = 10.0,
    weight_epi=(1.0, 1.0),
    backbone_train_bn: bool = False,
    remat: str = "auto",
    n_data_shards: int = 1,
):
    """Build ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch`` is a dict with ``im1``/``im2`` ``(B, H, W, 3)`` and ``F``
    ``(B, 3, 3)``. The returned function is pure and jit-friendly.

    ``remat="auto"`` resolves per traced batch shape: "none" (fastest,
    372.9 vs 602.7 ms/step at the reference best-model scale) while the
    proposal volume B*ptmax*panc stays within the measured 16 GB
    envelope (12800 at 480x320 fits; batch 8 = 25600 OOMs), else
    "both". Under pjit the traced batch is the GLOBAL batch but the
    memory envelope is per chip — ``n_data_shards`` (the mesh's data
    axis size, wired by ``make_sharded_train_step``) divides the volume
    so an 8-chip global batch 32 still resolves "none".
    """

    def loss_fn(params, batch_stats, batch, rng):
        mode = remat
        if mode == "auto":
            b = batch["im1"].shape[0]
            panc = model.config.regressor.panc
            per_chip = (b * ptmax * panc) // max(n_data_shards, 1)
            mode = "none" if per_chip <= 12800 else "both"
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, updates = model.apply(
            variables,
            batch["im1"],
            batch["im2"],
            ksize=ksize,
            ptmax=ptmax,
            train=True,
            backbone_train_bn=backbone_train_bn,
            remat=mode,
            rngs={"proposal": rng},
            mutable=["batch_stats"],
        )
        loss, metrics = patch2pix_losses(
            outputs,
            batch["F"],
            cls_dthres=cls_dthres,
            epi_dthres=epi_dthres,
            weight_cls=weight_cls,
            weight_epi=weight_epi,
        )
        return loss, (metrics, updates["batch_stats"])

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def shard_batch_spec() -> Dict[str, P]:
    """PartitionSpecs for a training batch: pairs over the data axis."""
    return {
        "im1": P("data"),
        "im2": P("data"),
        "F": P("data"),
    }


def make_sharded_train_step(model, tx, mesh: Mesh, **kwargs):
    """Jit the train step over a mesh: batch sharded, state replicated.

    Gradients reduce over ICI automatically (XLA inserts the psum for
    the replicated-out params); no hand-written collectives needed for
    data parallelism — the scaling-book recipe.

    Traces under ``no_pallas()``: Pallas custom calls are opaque to the
    SPMD partitioner (their operands would be all-gathered onto every
    device), so the sharded step uses the pure-XLA op formulations.
    With those, the compiled step's ONLY collective is the gradient
    all-reduce (asserted in tests/test_train_step.py).
    """
    from patch2pix_tpu.ops.dispatch import spmd_safe_dispatch as no_pallas

    kwargs.setdefault("n_data_shards", mesh.shape.get("data", 1))
    step = make_train_step(model, tx, **kwargs)
    repl = NamedSharding(mesh, P())
    batch_sh = {
        k: NamedSharding(mesh, v) for k, v in shard_batch_spec().items()
    }
    jitted = jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    class _ShardedStep:
        """Callable + .lower, with dispatch gated during tracing."""

        def __call__(self, *args):
            with no_pallas():
                return jitted(*args)

        def lower(self, *args):
            with no_pallas():
                return jitted.lower(*args)

    return _ShardedStep()
