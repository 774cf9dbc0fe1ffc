"""Training-step throughput at the bench shape: full force-training
step (fwd + loss with force terms + param grads via double backward +
optimizer update), the hot loop of `mtt train`. Run on the real TPU."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/mtt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from micro_attention import chain_time, report  # noqa: E402
from bench_breakdown import build  # noqa: E402

from metatrain_tpu.engine.evaluate import evaluate_model  # noqa: E402


def main():
    dtype = jnp.bfloat16
    import bench_breakdown

    # training with forces (grad-of-grad) at 10k atoms needs remat:
    # without it the double-backward's stored activations OOM the 16 GB
    from metatrain_tpu.models.pet import PET as _PET

    orig_init = _PET.__init__

    def patched(self, hypers, dataset_info, compute_dtype=jnp.float32):
        hp = dict(hypers or {})
        hp.setdefault("remat", True)
        orig_init(self, hp, dataset_info, compute_dtype)

    _PET.__init__ = patched
    try:
        model, params, batch, dataset_info = build(dtype)
    finally:
        _PET.__init__ = orig_init
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

    # chained steps: each consumes the previous params
    def chained(p_and_state, positions):
        p, s = p_and_state
        p, s, loss = train_step(p, s, positions)
        return (p, s), loss

    state = (params, opt_state)
    state, _ = chained(state, batch.positions)  # compile
    jax.block_until_ready(state[0])

    import time

    def run(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, _ = chained(s, batch.positions)
        jax.block_until_ready(s[0])
        float(jnp.sum(s[0]["params"]["embedding"]["embedding"]) if False else 0.0)
        return time.perf_counter() - t0

    run(2)
    n1, n2 = 3, 9
    t1, t2 = run(n1), run(n2)
    per_step = (t2 - t1) / (n2 - n1)
    print(
        f"train step: {per_step*1e3:.1f} ms/step, "
        f"{n_atoms/per_step:.0f} atom-steps/s/chip "
        f"(A={batch.n_atoms_padded})"
    )


if __name__ == "__main__":
    main()
