"""Data parallelism over a device mesh.

TPU-native replacement for the reference's DDP/NCCL layer
(``utils/distributed/``, SURVEY.md section 2.4): the train step runs under
``shard_map`` over a 1-D ``"dp"`` mesh axis; each device holds one
fixed-shape sub-batch, gradients/losses are ``psum``-reduced over ICI,
and parameters stay replicated. Semantics match the reference exactly:
deterministic rank-strided sampling (samplers already support
``num_replicas``/``rank``), global metric reduction, process-0 IO.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.collate import Batch
from ..engine.evaluate import evaluate_model
from ..ops.segment import average_by_num_atoms


DP_AXIS = "dp"


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def stack_batches(batches: Sequence[Batch]):
    """Stack per-device batches along a new leading device axis.

    All batches must share one bucket shape (use fixed collate sizes)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def _local_loss(model, loss_agg, target_infos, per_structure, params, batch: Batch):
    infos = {n: target_infos[n] for n in batch.targets}
    predictions = evaluate_model(
        model.forward, params, batch.systems, infos, is_training=True
    )
    predictions = average_by_num_atoms(predictions, batch.systems, per_structure)
    targets = average_by_num_atoms(batch.targets, batch.systems, per_structure)
    return loss_agg(predictions, targets, batch.extra_data)


def make_dp_train_step(
    compute_loss_and_errors: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """Data-parallel train step with metric reduction.

    ``compute_loss_and_errors(params, batch) -> (loss, errors)`` runs per
    device on its shard; gradients and losses are ``pmean``-reduced,
    error sums ``psum``-reduced (global metric union, reference
    ``utils/metrics.py:217-241``).
    """

    def device_step(params, opt_state, local_batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], local_batch)

        def loss_fn(p):
            return compute_loss_and_errors(p, batch)

        (loss, errors), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        grads = jax.lax.pmean(grads, DP_AXIS)
        loss = jax.lax.pmean(loss, DP_AXIS)
        errors = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DP_AXIS), errors
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, errors

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


class DataParallelLoader:
    """Groups consecutive batches from a loader into stacked per-device
    super-batches (requires fixed collate shapes).

    Multi-process (multi-host): every process iterates the same sampler
    order; super-batch position ``i`` belongs to global device ``i mod
    n_devices``. Each process COLLATES only the positions of its local
    devices (lazy iteration skips the others' host-side work -- collation
    includes neighbor-list construction) and assembles the global sharded
    array via ``jax.make_array_from_process_local_data``. This reproduces
    the reference's per-rank ``DistributedSampler`` semantics
    (``pet/trainer.py:227-250``) with deterministic, epoch-keyed order.
    """

    def __init__(
        self,
        loader,
        n_devices: int,
        mesh: Optional[Mesh] = None,
        num_processes: int = 1,
        process_id: int = 0,
    ):
        self.loader = loader
        self.n_devices = n_devices
        self.mesh = mesh
        self.num_processes = num_processes
        self.process_id = process_id
        if n_devices % num_processes:
            raise ValueError(
                f"{n_devices} devices not divisible by {num_processes} processes"
            )
        self.n_local = n_devices // num_processes

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    def _iter_thunks(self):
        if hasattr(self.loader, "iter_lazy"):
            yield from self.loader.iter_lazy()
        else:
            for batch in self.loader:
                yield (lambda b=batch: b)

    def __iter__(self):
        lo = self.process_id * self.n_local
        hi = lo + self.n_local
        buffer = []
        for i, thunk in enumerate(self._iter_thunks()):
            pos = i % self.n_devices
            if lo <= pos < hi:
                buffer.append(thunk())
            if pos == self.n_devices - 1:
                if len(buffer) == self.n_local:
                    stacked = stack_batches(buffer)
                    if self.mesh is not None:
                        stacked = shard_batch_to_mesh(
                            stacked, self.mesh, self.num_processes
                        )
                    yield stacked
                buffer = []
        # remainder dropped: every device must receive a shard

    def __len__(self):
        return len(self.loader) // self.n_devices


def make_sharded_train_step(
    model,
    loss_agg,
    target_infos: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    per_structure_targets: Sequence[str],
    mesh: Mesh,
    batches: Sequence[Batch],
) -> Tuple[Callable, Any]:
    """Build the data-parallel train step and the stacked example batch.

    Returns ``(step, stacked_batch)`` where ``step(params, opt_state,
    stacked_batch) -> (params, opt_state, loss)`` runs one SPMD update:
    per-device forward+backward, ``psum`` gradient reduction over ICI,
    replicated optimizer update (identical on every device).
    """
    stacked = stack_batches(batches)
    per_structure = list(per_structure_targets)

    def device_step(params, opt_state, local_batch):
        # local_batch leaves have leading axis 1 (this device's shard)
        batch = jax.tree_util.tree_map(lambda x: x[0], local_batch)

        def loss_fn(p):
            return _local_loss(
                model, loss_agg, target_infos, per_structure, p, batch
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, DP_AXIS)
        loss = jax.lax.pmean(loss, DP_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(DP_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded), stacked


def shard_batch_to_mesh(stacked, mesh: Mesh, num_processes: int = 1):
    """Place a stacked batch with its leading axis sharded over the mesh.

    Multi-process: ``stacked`` holds only this process's local shard
    (leading axis = local device count); the global array is assembled
    from per-process data without any cross-host transfer.
    """
    sharding = NamedSharding(mesh, P(DP_AXIS))

    if num_processes > 1:
        def place(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
    else:
        def place(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, stacked)
