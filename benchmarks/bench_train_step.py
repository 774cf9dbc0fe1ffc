"""Training-step throughput: full force-training step (fwd + loss with
force terms + param grads via double backward + optimizer update), the
hot loop of `mtt train`, at a realistic packed-batch scale (max-atom
samplers bound training batches to a few thousand atoms). Run on the
real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

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


def build(dtype, n_cells=10):
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
        targets={
            "energy": get_energy_target_info("eV", add_position_gradients=True)
        },
    )
    # remat measured r4 on v5e at this scale: OFF is 296.6 vs 324.4
    # ms/step ON, and remat does NOT lift the ~4-5k atom HBM ceiling
    # (the second-order sweep's replay storage dominates: 19.2 GB at
    # 5324 atoms either way) -- so the production default (remat off)
    # is also the measured-fastest; MTT_TRAIN_BENCH_REMAT=1 re-enables
    hypers = {
        "remat": os.environ.get("MTT_TRAIN_BENCH_REMAT", "0") == "1"
    }
    if os.environ.get("MTT_TRAIN_BENCH_XLA"):
        # pure-XLA layer path: native grad-of-grad, no kernel replay
        hypers.update({"fused_layers": False, "fused_attention": False})
    model = PET(hypers, dataset_info, compute_dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0))
    # colored grouped NEF layout: the reversed-edge permutes (and their
    # grad-of-grad replays) run on the MXU kernels in training too
    colored = os.environ.get("MTT_TRAIN_BENCH_COLORED", "1") != "0"
    nbr = compute_neighbor_data(system, cutoff=model.cutoff, colored=colored)
    A_pad = bucket_atoms(len(system), 1.05)
    if colored:
        A_pad = -(-len(system) // 256) * 256
    batch = batch_from_systems(
        [system],
        [nbr],
        n_atoms_padded=A_pad,
        n_systems_padded=2,
        max_neighbors=bucket_neighbors(nbr.max_neighbors, 1.0),
        dtype=jnp.float32,
    )
    return model, params, batch, dataset_info


def main():
    dtype = jnp.bfloat16
    n_cells = int(os.environ.get("MTT_TRAIN_BENCH_CELLS", "10"))
    model, params, batch, dataset_info = build(dtype, n_cells)
    target_infos = dict(dataset_info.targets)
    n_atoms = int(np.asarray(batch.atom_mask).sum())

    rng = np.random.default_rng(0)
    target_e = jnp.asarray(rng.normal(size=(batch.n_systems_padded, 1)))
    target_f = jnp.asarray(
        rng.normal(size=(batch.n_atoms_padded, 3, 1)), jnp.float32
    )

    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)

    def loss_fn(p, positions):
        preds = evaluate_model(
            model.forward,
            p,
            batch.replace(positions=positions),
            target_infos,
            is_training=True,
        )
        block = preds["energy"].block()
        e = block.values.astype(jnp.float32)
        f = block.gradient("positions").values.astype(jnp.float32)
        return jnp.mean((e - target_e) ** 2) + jnp.mean((f - target_f) ** 2)

    @jax.jit
    def train_step(p, opt_state, positions):
        loss, grads = jax.value_and_grad(loss_fn)(p, positions)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    if os.environ.get("MTT_TRAIN_BENCH_MEMSTATS", "0") == "1":
        # compile-time HBM breakdown: where does the double-backward
        # program's memory go (the ~5k-atom ceiling diagnosis)
        compiled = train_step.lower(params, opt_state, batch.positions).compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            for field in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "alias_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                val = getattr(ma, field, None)
                if val is not None:
                    print(f"# {field}: {val/2**30:.2f} GiB", flush=True)

    state = train_step(params, opt_state, batch.positions)
    jax.block_until_ready(state[2])

    def run(n):
        p, s, loss = state
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, loss = train_step(p, s, batch.positions)
        jax.block_until_ready(loss)
        return time.perf_counter() - t0

    run(2)
    n1, n2 = 3, 9
    t1, t2 = run(n1), run(n2)
    per_step = (t2 - t1) / (n2 - n1)
    print(
        f"train step ({n_atoms} atoms): {per_step*1e3:.1f} ms/step, "
        f"{n_atoms/per_step:.0f} atom-steps/s/chip "
        f"(A={batch.n_atoms_padded})"
    )
    if os.environ.get("MTT_TRAIN_BENCH_RECORD", "0") == "1":
        # BENCH-style artifact next to the force-call number (VERDICT r4
        # #3): recorded training throughput at this batch scale. No
        # torch/A100 comparison value is recorded: the reference
        # publishes no training benchmarks (BASELINE.md) and none was
        # measured here.
        import json

        rec = {
            "metric": "pet_force_train_step_throughput",
            "value": round(n_atoms / per_step, 1),
            "unit": "atom-steps/s/chip",
            "ms_per_step": round(per_step * 1e3, 1),
            "batch_atoms": n_atoms,
            "config": {
                "remat": os.environ.get("MTT_TRAIN_BENCH_REMAT", "0"),
                "fused_gnn": os.environ.get("MTT_FUSED_GNN", "0"),
                "colored": os.environ.get("MTT_TRAIN_BENCH_COLORED", "1"),
            },
            "torch_reference": "not published (BASELINE.md); not measured",
        }
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_TRAIN.json",
        )
        with open(out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"# recorded {out}")


if __name__ == "__main__":
    main()
