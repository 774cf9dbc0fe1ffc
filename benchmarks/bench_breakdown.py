"""Stage-level timing of the PET force call at the bench shape.

Times nested subsets of the computation (preprocess -> backbone ->
readout -> vjp) with the two-length chained-dispatch method, so each
stage's marginal cost is visible. Run on the real TPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402

from metatrain_tpu.containers import (  # noqa: E402
    System,
    batch_from_systems,
    bucket_atoms,
    bucket_neighbors,
)
from metatrain_tpu.data.target_info import (  # noqa: E402
    DatasetInfo,
    get_energy_target_info,
)
from metatrain_tpu.engine.evaluate import evaluate_model  # noqa: E402
from metatrain_tpu.models.pet import PET  # noqa: E402
from metatrain_tpu.ops.neighbors import compute_neighbor_data  # noqa: E402


def build(dtype):
    n_cells = 14
    a = 3.6
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    rng = np.random.default_rng(0)
    frac = np.concatenate(
        [
            base + np.array([i, j, k])
            for i in range(n_cells)
            for j in range(n_cells)
            for k in range(n_cells)
        ]
    )
    cell = np.eye(3) * a * n_cells
    positions = frac / n_cells @ cell + rng.normal(0, 0.05, size=(len(frac), 3))
    system = System(
        positions=positions,
        types=np.full(len(frac), 29, dtype=np.int32),
        cell=cell,
        pbc=np.ones(3, dtype=bool),
    )
    dataset_info = DatasetInfo(
        length_unit="angstrom",
        atomic_types=[29],
        targets={"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    model = PET({}, dataset_info, compute_dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0))
    nbr = compute_neighbor_data(system, cutoff=model.cutoff, colored=True)
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=-(-len(system) // 256) * 256,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    return model, params, batch, dataset_info


def main():
    dtype = jnp.bfloat16 if os.environ.get("MTT_BENCH_DTYPE", "bf16") != "f32" else jnp.float32
    model, params, batch, dataset_info = build(dtype)
    target_infos = dict(dataset_info.targets)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"A={batch.n_atoms_padded} M={batch.nbr_indices.shape[1]}", flush=True)

    # 1. preprocess only
    def preprocess(positions, _):
        d = model.preprocess(batch.replace(positions=positions))
        return d["edge_vectors"], d["cutoff_factors"]

    secs = chain_time(jax.jit(preprocess), (batch.positions, 0))
    report("preprocess (edges+cutoffs)", secs)

    # 2. backbone forward only
    def backbone(positions, _):
        d = model.preprocess(batch.replace(positions=positions))
        node_f, edge_f = model.module.apply(
            {"params": params["module"]} if "module" in params else params,
            d,
            ["energy"],
            method=None,
        )["_node_features" if False else "_node_features"], None
        return node_f

    # model.forward full energy only
    def energy_only(positions, _):
        preds = model.forward(params, batch.replace(positions=positions), ["energy"])
        return preds["energy"].block().values

    secs = chain_time(jax.jit(energy_only), (batch.positions, 0))
    report("forward (energy only)", secs)

    # 3. full force call
    def force_call(positions, _):
        preds = evaluate_model(
            model.forward,
            params,
            batch.replace(positions=positions),
            target_infos,
            is_training=False,
        )
        block = preds["energy"].block()
        return block.values, block.gradient("positions").values

    secs = chain_time(jax.jit(force_call), (batch.positions, 0))
    report("force call (fwd+vjp)", secs)

    # 4. reverse_edges gather cost at model scale
    from metatrain_tpu.models.pet.modules import reverse_edges

    A, M = batch.nbr_indices.shape
    edge_arr = jnp.ones((A, M, 128), dtype)

    def rev(x, _):
        return reverse_edges(
            x,
            {
                "nbr_reverse": batch.nbr_reverse,
                "color_band": batch.color_band,
                "nbr_indices": batch.nbr_indices,
                "nbr_fixup_src": batch.nbr_fixup_src,
                "nbr_fixup_dst": batch.nbr_fixup_dst,
            },
        )

    secs = chain_time(jax.jit(rev), (edge_arr, 0))
    report("reverse_edges gather (A,M,128)", secs)


if __name__ == "__main__":
    main()
