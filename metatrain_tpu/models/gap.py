"""GAP: sparse-kernel (Subset-of-Regressors) Gaussian Approximation Potential.

Re-design of the reference ``src/metatrain/gap/`` (featomic SOAP + scipy
SOR solve, CPU/float64-only): here the SOAP power spectrum comes from our
own JAX spherical expansion (``models/soap_bpnn/modules.py``), the sparse
fit is a closed-form normal-equation solve on the host (f64), and --
unlike the reference, which hand-codes kernel derivatives -- forces and
stress fall out of the shared autograd engine because the whole predictor
(features -> polynomial kernel -> weights) is one differentiable JAX
function.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.dataset import Dataset
from ..data.target_info import DatasetInfo
from ..ops.neighbors import compute_neighbor_data
from ..ops.radial import radial_basis
from ..ops.segment import sum_over_atoms
from ..ops.spherical import real_spherical_harmonics
from ..utils.abc import ModelInterface, TrainerInterface
from ..utils.io import save_checkpoint_file
from .composition import CompositionModel, train_or_load_composition_model


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # reference defaults: gap/documentation.py
    "soap": {
        "cutoff": {"radius": 5.0, "width": 1.0},
        "max_radial": 7,
        "max_angular": 6,
    },
    "krr": {"degree": 2, "num_sparse_points": 500, "regularizer": 1e-3},
}


def _soap_features(
    vectors, distances, nbr_species_index, nbr_mask, num_species, hypers
):
    """Per-atom SOAP power spectrum in NEF layout (differentiable)."""
    soap = hypers["soap"]
    n_max = soap["max_radial"] + 1
    l_max = soap["max_angular"]
    rb = radial_basis(
        distances,
        soap["cutoff"]["radius"],
        n_max,
        "bessel",
        soap["cutoff"]["width"],
    )
    rb = jnp.where(nbr_mask[:, :, None], rb, 0.0)
    unit = vectors / jnp.maximum(distances, 1e-10)[:, :, None]
    sph = jnp.concatenate(real_spherical_harmonics(unit, l_max), axis=-1)
    sph = jnp.where(nbr_mask[:, :, None], sph, 0.0)
    one_hot = jax.nn.one_hot(nbr_species_index, num_species, dtype=rb.dtype)
    chan = (one_hot[:, :, :, None] * rb[:, :, None, :]).reshape(
        rb.shape[0], rb.shape[1], -1
    )
    coeffs = jnp.einsum(
        "amc,aml->acl",
        chan,
        sph,
        precision=jax.lax.Precision.HIGHEST,
    )
    A, C, _ = coeffs.shape
    blocks = []
    offset = 0
    for l in range(l_max + 1):
        c_l = coeffs[:, :, offset : offset + 2 * l + 1]
        offset += 2 * l + 1
        blocks.append(
            jnp.einsum(
                "acm,adm->acd", c_l, c_l, precision=jax.lax.Precision.HIGHEST
            ).reshape(A, C * C)
        )
    features = jnp.concatenate(blocks, axis=1)
    norm = jnp.linalg.norm(features, axis=1, keepdims=True)
    return features / jnp.maximum(norm, 1e-10)


class GAP(ModelInterface):
    """Sparse polynomial-kernel GAP on SOAP features."""

    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]
    ARCHITECTURE_NAME = "gap"

    def __init__(self, hypers: Dict[str, Any], dataset_info: DatasetInfo):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        for key, value in (hypers or {}).items():
            if isinstance(value, dict) and isinstance(full.get(key), dict):
                sub = copy.deepcopy(full[key])
                sub.update(value)
                full[key] = sub
            else:
                full[key] = value
        super().__init__(full, dataset_info)
        targets = dataset_info.targets
        if len(targets) != 1:
            raise ValueError("GAP supports exactly one (energy) target")
        self.target_name = next(iter(targets))
        if not targets[self.target_name].is_scalar:
            raise ValueError("GAP only supports scalar energy targets")

        self.atomic_types = list(dataset_info.atomic_types)
        self.cutoff = float(full["soap"]["cutoff"]["radius"])
        self._lookup = np.zeros(max(self.atomic_types) + 1, dtype=np.int32)
        for i, z in enumerate(self.atomic_types):
            self._lookup[z] = i

        self.sparse_points: np.ndarray = np.zeros((0, 0))  # (M, D)
        self.weights: np.ndarray = np.zeros((0,))  # (M,)
        self.composition = CompositionModel({}, dataset_info)

    # -- feature computation (shared by fit and predict) ---------------------

    def batch_features(self, batch: SystemBatch) -> jnp.ndarray:
        vectors, distances = batch.edge_vectors()
        lookup = jnp.asarray(self._lookup)
        species_index = lookup[jnp.clip(batch.types, 0, lookup.shape[0] - 1)]
        return _soap_features(
            vectors,
            distances,
            species_index[batch.nbr_indices],
            batch.nbr_mask,
            len(self.atomic_types),
            self.hypers,
        )

    # -- ModelInterface -----------------------------------------------------

    def init_params(self, rng=None):
        self.params = {
            "sparse_points": jnp.asarray(self.sparse_points),
            "weights": jnp.asarray(self.weights),
        }
        return self.params

    def forward(
        self,
        params,
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms=None,
    ) -> Dict[str, TensorMap]:
        if self.target_name not in outputs:
            # requested-outputs contract (reference output.py:156-177)
            return {}
        amask = batch.atom_mask
        if selected_atoms is not None:
            amask = amask & selected_atoms
        degree = self.hypers["krr"]["degree"]
        features = self.batch_features(batch)  # (A, D)
        kernel = (
            jnp.einsum(
                "ad,md->am",
                features,
                params["sparse_points"].astype(features.dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
            ** degree
        )
        atom_energies = kernel @ params["weights"].astype(features.dtype)
        info = self.dataset_info.targets[self.target_name]
        S = batch.n_systems_padded
        if info.per_atom:
            values = jnp.where(amask, atom_energies, 0.0)[:, None]
            samples = Labels(
                ["system", "atom"],
                jnp.stack(
                    [
                        batch.system_index,
                        jnp.arange(batch.n_atoms_padded, dtype=jnp.int32),
                    ],
                    axis=1,
                ),
            )
            mask = amask
        else:
            values = sum_over_atoms(
                atom_energies, batch.system_index, S, amask
            )[:, None]
            samples = Labels.range("system", S)
            mask = batch.system_mask
        block = TensorBlock(
            values=values,
            samples=samples,
            components=info.layout.block(0).components,
            properties=info.layout.block(0).properties,
            mask=mask,
        )
        return {self.target_name: TensorMap(info.layout.keys, [block])}

    def forward_eval(self, params, batch, outputs, selected_atoms=None):
        results = self.forward(params, batch, outputs, selected_atoms)
        if not results:
            return results
        comp_params = self.composition._device_params(dtype=jnp.float32)
        additive = self.composition.forward(
            comp_params, batch, list(results), selected_atoms
        )
        for name, contribution in additive.items():
            if name in results:
                block = results[name].block(0)
                new_block = TensorBlock(
                    block.values
                    + contribution.block(0).values.astype(block.values.dtype),
                    block.samples,
                    block.components,
                    block.properties,
                    block.mask,
                )
                results[name] = TensorMap(results[name].keys, [new_block])
        return results

    def supported_outputs(self):
        return dict(self.dataset_info.targets)

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff

    def get_checkpoint(self) -> Dict[str, Any]:
        return {
            "architecture_name": "gap",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": copy.deepcopy(dict(self.hypers)),
            "dataset_info": self.dataset_info.to_dict(),
            "sparse_points": self.sparse_points,
            "weights": self.weights,
            "composition": self.composition.get_checkpoint(),
        }

    @classmethod
    def load_checkpoint(cls, checkpoint, context="restart") -> "GAP":
        model = cls(
            checkpoint["hypers"],
            DatasetInfo.from_dict(checkpoint["dataset_info"]),
        )
        model.sparse_points = np.asarray(checkpoint["sparse_points"])
        model.weights = np.asarray(checkpoint["weights"])
        model.composition = CompositionModel.load_checkpoint(
            checkpoint["composition"]
        )
        model.init_params()
        return model


def farthest_point_sampling(features: np.ndarray, n_points: int, seed: int = 0):
    """Greedy FPS on feature vectors (reference uses skmatter's FPS,
    ``gap/model.py:527``)."""
    n = len(features)
    n_points = min(n_points, n)
    rng = np.random.default_rng(seed)
    selected = [int(rng.integers(n))]
    d2 = np.sum((features - features[selected[0]]) ** 2, axis=1)
    for _ in range(n_points - 1):
        idx = int(np.argmax(d2))
        selected.append(idx)
        d2 = np.minimum(d2, np.sum((features - features[idx]) ** 2, axis=1))
    return np.asarray(selected)


class GAPTrainer(TrainerInterface):
    """Closed-form Subset-of-Regressors fit (reference ``gap/trainer.py``)."""

    __checkpoint_version__ = 1
    DEFAULT_HYPERS: Dict[str, Any] = {
        "regularizer": 1e-3,
        # separate noise level for force rows (reference fits energies AND
        # gradients jointly, gap/model.py:324,648)
        "regularizer_forces": 1e-2,
        "seed": 0,
    }

    def __init__(self, hypers=None):
        full = dict(self.DEFAULT_HYPERS)
        full.update(hypers or {})
        super().__init__(full)
        self.epoch = 0

    def train(self, model: GAP, dtype, train_datasets, val_datasets, checkpoint_dir="."):
        from ..containers import batch_from_systems

        dataset = train_datasets[0]
        model.composition = train_or_load_composition_model(
            None, model.dataset_info, train_datasets
        )

        # per-atom features over the whole training set (f64 on host)
        feature_rows: List[np.ndarray] = []
        structure_slices = []
        offset = 0
        for i in range(len(dataset)):
            system = dataset[i].system
            nbr = compute_neighbor_data(system, model.cutoff)
            batch = batch_from_systems(
                [system],
                [nbr],
                n_atoms_padded=len(system),
                n_systems_padded=2,
                dtype=jnp.float64,
            )
            feats = np.asarray(model.batch_features(batch), dtype=np.float64)
            feature_rows.append(feats)
            structure_slices.append((offset, offset + len(system)))
            offset += len(system)
        all_features = np.concatenate(feature_rows)

        # sparse points by FPS
        n_sparse = model.hypers["krr"]["num_sparse_points"]
        sparse_idx = farthest_point_sampling(
            all_features, n_sparse, self.hypers["seed"]
        )
        sparse = all_features[sparse_idx]

        # structure kernel rows: K[s, m] = sum_{i in s} k(x_i, x_m)
        degree = model.hypers["krr"]["degree"]
        atom_kernel = (all_features @ sparse.T) ** degree
        n_structures = len(dataset)
        k_nm = np.zeros((n_structures, len(sparse)))
        for s, (a, b) in enumerate(structure_slices):
            k_nm[s] = atom_kernel[a:b].sum(axis=0)

        # force rows: the Jacobian d K[s, :] / d positions, from forward-mode
        # autodiff of the kernel row (reference fits energy AND gradient
        # rows, gap/model.py:324,648). Targets use the stored gradient
        # convention (dE/dr = -F), so rows and labels align sign-free.
        target_info = model.dataset_info.targets[model.target_name]
        use_forces = "positions" in target_info.gradients
        jac_rows: List[np.ndarray] = []
        grad_targets: List[np.ndarray] = []
        if use_forces:
            sparse_dev = jnp.asarray(sparse)

            @jax.jit
            def kernel_row(positions, batch):
                feats = model.batch_features(
                    batch.replace(positions=positions)
                )
                k = (feats @ sparse_dev.T) ** degree
                return jnp.sum(
                    jnp.where(batch.atom_mask[:, None], k, 0.0), axis=0
                )

            for i in range(len(dataset)):
                sample = dataset[i]
                system = sample.system
                grad_block = sample.targets[model.target_name].block(0)
                try:
                    grads = grad_block.gradient("positions")
                except (KeyError, ValueError):
                    continue
                nbr = compute_neighbor_data(system, model.cutoff)
                batch = batch_from_systems(
                    [system], [nbr], n_systems_padded=2, dtype=jnp.float64
                )
                # jacrev: the edge-vector gather has a custom VJP (no JVP
                # rule), and reverse mode also matches the fit's offline,
                # one-shot character
                jac = jax.jacrev(kernel_row)(batch.positions, batch)
                n = len(system)
                jac_rows.append(
                    np.asarray(jac, dtype=np.float64)[:, :n, :]
                    .reshape(len(sparse), n * 3)
                    .T
                )
                grad_targets.append(
                    np.asarray(grads.values, dtype=np.float64)[:n].reshape(-1)
                )

        # residual energies after composition removal
        baselines = [
            model.composition.predict_host(dataset[i].system)[
                model.target_name
            ][0, 0]
            for i in range(len(dataset))
        ]
        y = np.array(
            [
                float(
                    np.asarray(
                        dataset[i].targets[model.target_name].block(0).values
                    )[0, 0]
                )
                - baselines[i]
                for i in range(len(dataset))
            ]
        )

        # SOR solve over energy + gradient rows:
        # (K_mm + Phi^T Lambda^-1 Phi) alpha = Phi^T Lambda^-1 y
        k_mm = (sparse @ sparse.T) ** degree
        reg = float(
            self.hypers.get(
                "regularizer", model.hypers["krr"].get("regularizer", 1e-3)
            )
        )
        lhs = k_mm + k_nm.T @ k_nm / reg**2
        rhs = k_nm.T @ y / reg**2
        if jac_rows:
            reg_f = float(self.hypers["regularizer_forces"])
            phi_f = np.concatenate(jac_rows, axis=0)  # (sum 3n, M)
            y_f = np.concatenate(grad_targets)
            lhs += phi_f.T @ phi_f / reg_f**2
            rhs += phi_f.T @ y_f / reg_f**2
        lhs += 1e-8 * np.trace(lhs) / len(lhs) * np.eye(len(lhs))
        model.weights = np.linalg.solve(lhs, rhs)
        model.sparse_points = sparse
        model.init_params()
        self.epoch = 1

    def save_checkpoint(self, model, path):
        checkpoint = model.get_checkpoint()
        checkpoint["trainer_ckpt_version"] = self.__checkpoint_version__
        checkpoint["train_hypers"] = self.hypers
        save_checkpoint_file(checkpoint, path)

    @classmethod
    def load_checkpoint(cls, checkpoint, hypers):
        return cls(hypers)


__model__ = GAP
__trainer__ = GAPTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": dict(GAPTrainer.DEFAULT_HYPERS),
}
