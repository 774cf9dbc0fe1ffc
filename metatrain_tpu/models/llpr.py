"""LLPR: Last-Layer Prediction Rigidity uncertainty wrapper.

Re-design of the reference ``src/metatrain/llpr/``: wraps any trained
model exposing last-layer features, accumulates the feature covariance
over the training set, inverts it (regularized Cholesky), calibrates the
uncertainty scale on a validation set, and can sample ensemble weights
from the Laplace posterior. All the heavy lifting is dense linear algebra
-- a natural fit for the TPU, with the tiny (F x F) solves on the host in
float64.

Outputs added on top of the wrapped model's (reference naming):
- ``mtt::aux::{target}_uncertainty``: per-structure predictive variance.
- ``mtt::aux::{target}_ensemble``: per-structure ensemble predictions.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import Labels, SystemBatch, TensorBlock, TensorMap
from ..data.collate import CollateFn
from ..data.dataset import Dataset
from ..data.samplers import BatchSampler, DataLoader
from ..data.target_info import DatasetInfo
from ..ops.segment import sum_over_atoms
from ..utils.abc import ModelInterface, TrainerInterface
from ..utils.io import model_from_checkpoint, save_checkpoint_file


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # checkpoint of the trained model to wrap (CLI path; the API can
    # pass a live model as ``wrapped`` instead)
    "model_checkpoint": None,
    "regularizer": None,  # None -> auto-scaled from the covariance trace
    "ensemble_size": 0,
    "batch_size": 8,
}


class LLPRUncertaintyModel(ModelInterface):
    """Uncertainty wrapper around a trained model."""

    __checkpoint_version__ = 1
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(
        self,
        hypers: Dict[str, Any],
        dataset_info: Optional[DatasetInfo] = None,
        wrapped: Optional[ModelInterface] = None,
    ):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        full.update(hypers or {})
        if wrapped is None and full.get("model_checkpoint"):
            wrapped = model_from_checkpoint(
                full["model_checkpoint"], context="export"
            )
        if wrapped is None:
            raise ValueError(
                "LLPR needs a wrapped model (hypers['model_checkpoint'] "
                "or the `wrapped` argument)"
            )
        super().__init__(full, dataset_info or wrapped.dataset_info)
        self.model = wrapped
        self.target_names = list(self.model.supported_outputs().keys())
        self.covariances: Dict[str, np.ndarray] = {}
        self.inv_covariances: Dict[str, np.ndarray] = {}
        self.cholesky_factors: Dict[str, np.ndarray] = {}
        self.calibration: Dict[str, float] = {
            name: 1.0 for name in self.target_names
        }
        self.ensemble_weights: Dict[str, np.ndarray] = {}

    # -- covariance accumulation ----------------------------------------------

    def compute_covariance(self, datasets: Sequence[Dataset]) -> None:
        """Accumulate per-structure last-layer feature covariance
        (reference ``llpr/model.py:856``)."""
        collate = CollateFn(
            cutoff=self.model.requested_neighbor_cutoff() or 5.0,
            target_infos={},
        )
        # one pass over the data: collation (neighbor lists) dominates,
        # so all targets' covariances accumulate from the same batch
        covariances: Dict[str, Optional[np.ndarray]] = {
            name: None for name in self.target_names
        }
        for dataset in datasets:
            loader = DataLoader(
                dataset,
                BatchSampler(
                    len(dataset), self.hypers["batch_size"], shuffle=False
                ),
                collate,
            )
            for batch in loader:
                for name in self.target_names:
                    feats = self._structure_features(batch.systems, name)
                    feats = np.asarray(feats, dtype=np.float64)
                    if covariances[name] is None:
                        covariances[name] = np.zeros(
                            (feats.shape[1], feats.shape[1])
                        )
                    covariances[name] += feats.T @ feats
        for name, cov in covariances.items():
            if cov is not None:
                self.covariances[name] = cov

    def _structure_features(self, batch: SystemBatch, name: str) -> jnp.ndarray:
        atom_feats = self.model.last_layer_features(
            self.model.params, batch, name
        )
        info = self.model.supported_outputs()[name]
        if info.per_atom:
            return atom_feats[np.asarray(jax.device_get(batch.atom_mask))]
        per_structure = sum_over_atoms(
            atom_feats,
            batch.system_index,
            batch.n_systems_padded,
            batch.atom_mask,
        )
        return per_structure[np.asarray(jax.device_get(batch.system_mask))]

    def compute_inverse_covariance(self, regularizer: Optional[float] = None):
        """Regularized inverse (reference ``llpr/model.py:928``): smallest
        power-of-ten multiple of the mean diagonal that keeps the Cholesky
        factorization positive definite."""
        for name, cov in self.covariances.items():
            F = len(cov)
            if regularizer is not None:
                sym = 0.5 * (cov + cov.T) + regularizer * np.eye(F)
                self.inv_covariances[name] = np.linalg.inv(sym)
                self.cholesky_factors[name] = np.linalg.cholesky(sym)
                continue
            scale = np.trace(cov) / F
            for exponent in range(-16, 4):
                reg = 10.0**exponent * scale
                try:
                    sym = 0.5 * (cov + cov.T) + reg * np.eye(F)
                    L = np.linalg.cholesky(sym)
                    inv_L = np.linalg.inv(L)
                    self.inv_covariances[name] = inv_L.T @ inv_L
                    # the Cholesky factor is what the variance path uses:
                    # sum-of-squares of a triangular solve is non-negative
                    # by construction, while f^T (L^-T L^-1) f loses PSD
                    # to round-off for ill-conditioned covariances
                    # (reference llpr/model.py:460-466 does the same)
                    self.cholesky_factors[name] = L
                    break
                except np.linalg.LinAlgError:
                    continue
            else:
                raise RuntimeError(f"covariance for '{name}' cannot be inverted")

    def calibrate(self, val_dataset: Dataset, method: str = "ratio") -> None:
        """Uncertainty calibration on a validation set.

        :param method: ``"ratio"`` (reference ``llpr/calibration.py:10``,
            alpha^2 = mean(residual^2 / raw variance)) or ``"crps"``
            (minimize the Gaussian CRPS of N(pred, alpha^2 sigma^2),
            reference ``llpr/calibration.py:84``).
        """
        collate = CollateFn(
            cutoff=self.model.requested_neighbor_cutoff() or 5.0,
            target_infos={
                n: i
                for n, i in self.model.supported_outputs().items()
                if n in val_dataset.targets
            },
        )
        loader = DataLoader(
            val_dataset,
            BatchSampler(len(val_dataset), self.hypers["batch_size"], shuffle=False),
            collate,
        )
        residuals_sq: Dict[str, List[float]] = {n: [] for n in self.target_names}
        variances: Dict[str, List[float]] = {n: [] for n in self.target_names}
        for batch in loader:
            predictions = self.model.forward_eval(
                self.model.params, batch.systems, list(batch.targets)
            )
            for name in self.target_names:
                if name not in batch.targets:
                    continue
                variance = np.asarray(
                    jax.device_get(self._raw_variance(batch.systems, name))
                )
                pred = np.asarray(
                    jax.device_get(predictions[name].block(0).values)
                )
                tgt_block = batch.targets[name].block(0)
                tgt = np.asarray(jax.device_get(tgt_block.values))
                mask = np.asarray(jax.device_get(tgt_block.mask))
                residual_sq = ((pred - tgt) ** 2).reshape(len(mask), -1).sum(1)
                residuals_sq[name].extend(residual_sq[mask].tolist())
                variances[name].extend(
                    np.maximum(variance[mask], 1e-30).tolist()
                )
        for name in self.target_names:
            r2 = np.asarray(residuals_sq[name])
            var = np.asarray(variances[name])
            if not len(r2):
                continue
            # relative variance floor: a rank-deficient covariance (tiny
            # validation sets) must not blow the ratio up to inf
            floor = max(float(var.max(initial=0.0)) * 1e-12, 1e-30)
            var = np.maximum(var, floor)
            if method == "ratio":
                value = float(np.mean(r2 / var))
            elif method == "crps":
                value = _crps_calibrate(r2, var)
            else:
                raise ValueError(f"unknown calibration method {method!r}")
            self.calibration[name] = float(np.clip(value, 1e-12, 1e12))

    def _raw_variance(self, batch: SystemBatch, name: str) -> jnp.ndarray:
        feats = self.model.last_layer_features(self.model.params, batch, name)
        info = self.model.supported_outputs()[name]
        if not info.per_atom:
            feats = sum_over_atoms(
                feats, batch.system_index, batch.n_systems_padded, batch.atom_mask
            )
        if name in self.cholesky_factors:
            # v = L^-1 f^T; variance = sum_k v_k^2 >= 0 exactly
            L = jnp.asarray(self.cholesky_factors[name], dtype=feats.dtype)
            v = jax.scipy.linalg.solve_triangular(
                L, feats.T, lower=True
            )
            return jnp.sum(v * v, axis=0)
        inv_cov = jnp.asarray(
            self.inv_covariances[name], dtype=feats.dtype
        )
        return jnp.einsum(
            "sf,fg,sg->s", feats, inv_cov, feats,
            precision=jax.lax.Precision.HIGHEST,
        )

    def generate_ensemble(self, n_members: int, seed: int = 0) -> None:
        """Sample last-layer weight ensembles from the Laplace posterior
        (reference ``llpr/model.py:1079``)."""
        rng = np.random.default_rng(seed)
        for name, inv_cov in self.inv_covariances.items():
            F = len(inv_cov)
            # symmetric square root of the calibrated inverse covariance
            eigval, eigvec = np.linalg.eigh(inv_cov)
            sqrt_cov = (
                eigvec
                @ np.diag(np.sqrt(np.maximum(eigval, 0.0)))
                @ eigvec.T
            ) * np.sqrt(self.calibration[name])
            self.ensemble_weights[name] = sqrt_cov @ rng.normal(
                size=(F, n_members)
            )

    # -- ModelInterface ----------------------------------------------------------

    def init_params(self, rng=None):
        self.params = self.model.params
        return self.params

    def forward(
        self,
        params,
        batch: SystemBatch,
        outputs: Sequence[str],
        selected_atoms=None,
    ) -> Dict[str, TensorMap]:
        base_outputs = [o for o in outputs if o in self.target_names]
        # ensemble outputs need the base prediction as the ensemble mean
        for name in self.target_names:
            if (
                f"mtt::aux::{name}_ensemble" in outputs
                and name not in base_outputs
            ):
                base_outputs.append(name)
        results = self.model.forward_eval(
            params, batch, base_outputs, selected_atoms
        )
        S = batch.n_systems_padded
        for name in self.target_names:
            unc_name = f"mtt::aux::{name}_uncertainty"
            ens_name = f"mtt::aux::{name}_ensemble"
            if unc_name in outputs and name in self.inv_covariances:
                variance = (
                    self._raw_variance(batch, name) * self.calibration[name]
                )
                results[unc_name] = _scalar_map(
                    variance[:, None], batch, per_atom=False
                )
            if ens_name in outputs and name in self.ensemble_weights:
                feats = self.model.last_layer_features(params, batch, name)
                members = feats @ jnp.asarray(
                    self.ensemble_weights[name], dtype=feats.dtype
                )
                per_structure = sum_over_atoms(
                    members, batch.system_index, S, batch.atom_mask
                )
                mean = results[name].block(0).values
                results[ens_name] = _scalar_map(
                    per_structure + mean, batch, per_atom=False
                )
        return results

    forward_eval = forward

    def supported_outputs(self):
        out = dict(self.model.supported_outputs())
        for name in self.target_names:
            out[f"mtt::aux::{name}_uncertainty"] = out[name]
            if name in self.ensemble_weights:
                out[f"mtt::aux::{name}_ensemble"] = out[name]
        return out

    def requested_neighbor_cutoff(self):
        return self.model.requested_neighbor_cutoff()

    def get_checkpoint(self):
        return {
            "architecture_name": "llpr",
            "model_ckpt_version": self.__checkpoint_version__,
            "hypers": {
                k: v for k, v in self.hypers.items() if k != "model_checkpoint"
            },
            "dataset_info": self.dataset_info.to_dict(),
            "wrapped": self.model.get_checkpoint(),
            "covariances": self.covariances,
            "inv_covariances": self.inv_covariances,
            "cholesky_factors": self.cholesky_factors,
            "calibration": self.calibration,
            "ensemble_weights": self.ensemble_weights,
        }

    @classmethod
    def load_checkpoint(cls, checkpoint, context="restart"):
        wrapped = model_from_checkpoint(checkpoint["wrapped"], context=context)
        model = cls(checkpoint["hypers"], wrapped=wrapped)
        model.covariances = checkpoint["covariances"]
        model.inv_covariances = checkpoint["inv_covariances"]
        model.cholesky_factors = checkpoint.get("cholesky_factors", {})
        model.calibration = checkpoint["calibration"]
        model.ensemble_weights = checkpoint["ensemble_weights"]
        model.init_params()
        return model


def _crps_calibrate(residual_sq: np.ndarray, variance: np.ndarray) -> float:
    """alpha^2 minimizing the mean Gaussian CRPS of N(pred, a^2 var):
    CRPS(N(0, s^2), r) = s * [z(2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi)]
    with z = r / s. Golden-section search over log alpha^2."""
    from scipy.stats import norm

    abs_r = np.sqrt(residual_sq)
    sigma = np.sqrt(variance)

    def mean_crps(log_a2):
        s = sigma * np.exp(0.5 * log_a2)
        z = abs_r / s
        return float(
            np.mean(
                s
                * (
                    z * (2 * norm.cdf(z) - 1)
                    + 2 * norm.pdf(z)
                    - 1.0 / np.sqrt(np.pi)
                )
            )
        )

    lo, hi = -20.0, 20.0
    golden_ratio = (np.sqrt(5.0) - 1) / 2
    for _ in range(60):
        m1 = hi - golden_ratio * (hi - lo)
        m2 = lo + golden_ratio * (hi - lo)
        if mean_crps(m1) < mean_crps(m2):
            hi = m2
        else:
            lo = m1
    return float(np.exp(0.5 * (lo + hi)))


def _scalar_map(values, batch, per_atom: bool) -> TensorMap:
    n = values.shape[0]
    block = TensorBlock(
        values=values,
        samples=Labels.range("system", n),
        components=[],
        properties=Labels.range("property", values.shape[-1]),
        mask=batch.system_mask if not per_atom else batch.atom_mask,
    )
    return TensorMap(Labels.single(), [block])


class LLPRTrainer(TrainerInterface):
    """Covariance + calibration + optional gradient-based ensemble
    finetuning (reference ``llpr/trainer.py:96-200``: the Laplace-sampled
    last-layer ensembles are refined by SGD on a probabilistic loss of
    the ensemble predictions against validation targets)."""

    __checkpoint_version__ = 1
    DEFAULT_HYPERS = {
        "ensemble_size": 0,
        "seed": 0,
        "calibration_method": "ratio",  # or "crps"
        # gradient-based ensemble finetuning (0 epochs = off)
        "finetune_epochs": 0,
        "finetune_learning_rate": 1e-3,
        "finetune_loss": "crps",  # or "nll"
    }

    def __init__(self, hypers=None):
        full = dict(self.DEFAULT_HYPERS)
        full.update(hypers or {})
        super().__init__(full)
        self.epoch = 0

    def train(self, model, dtype, train_datasets, val_datasets, checkpoint_dir="."):
        model.compute_covariance(train_datasets)
        model.compute_inverse_covariance()
        if val_datasets and len(val_datasets[0]):
            model.calibrate(
                val_datasets[0], method=self.hypers["calibration_method"]
            )
        if self.hypers["ensemble_size"]:
            model.generate_ensemble(
                self.hypers["ensemble_size"], self.hypers["seed"]
            )
            if self.hypers["finetune_epochs"]:
                self._finetune_ensemble(
                    model,
                    (val_datasets or train_datasets)[0],
                )
        model.init_params()
        self.epoch = 1

    def _finetune_ensemble(self, model, dataset: Dataset) -> None:
        """SGD on the ensemble weight matrices: minimize a Gaussian
        NLL/CRPS of the ensemble spread against the dataset targets."""
        import optax

        from ..containers import batch_from_systems
        from ..ops.neighbors import compute_neighbor_data

        name = model.target_names[0]
        info = model.supported_outputs()[name]

        # precompute structure-level last-layer features + residual targets
        feats_rows, target_rows = [], []
        for i in range(len(dataset)):
            sample = dataset[i]
            nbr = compute_neighbor_data(
                sample.system, model.requested_neighbor_cutoff() or 5.0
            )
            batch = batch_from_systems(
                [sample.system], [nbr], n_systems_padded=2
            )
            feats = model._structure_features(batch, name)
            preds = model.model.forward_eval(model.model.params, batch, [name])
            mean = np.asarray(preds[name].block(0).values)[0, 0]
            y = float(np.asarray(sample.targets[name].block(0).values)[0, 0])
            feats_rows.append(np.asarray(feats)[0])
            target_rows.append(y - mean)
        features = jnp.asarray(np.stack(feats_rows))  # (N, F)
        residuals = jnp.asarray(np.asarray(target_rows))  # (N,)

        weights = jnp.asarray(model.ensemble_weights[name])  # (F, K)
        loss_kind = self.hypers["finetune_loss"]

        def loss_fn(w):
            members = features @ w  # (N, K): ensemble deviations
            mu = jnp.mean(members, axis=1)
            sigma = jnp.std(members, axis=1) + 1e-10
            z = (residuals - mu) / sigma
            if loss_kind == "nll":
                return jnp.mean(0.5 * z**2 + jnp.log(sigma))
            # Gaussian CRPS (closed form)
            phi = jnp.exp(-0.5 * z**2) / jnp.sqrt(2 * jnp.pi)
            cdf = 0.5 * (1 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
            crps = sigma * (
                z * (2 * cdf - 1) + 2 * phi - 1 / jnp.sqrt(jnp.pi)
            )
            return jnp.mean(crps)

        optimizer = optax.adam(self.hypers["finetune_learning_rate"])
        opt_state = optimizer.init(weights)

        @jax.jit
        def step(w, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(w)
            updates, opt_state = optimizer.update(grads, opt_state)
            return optax.apply_updates(w, updates), opt_state, loss

        for _ in range(int(self.hypers["finetune_epochs"])):
            weights, opt_state, _ = step(weights, opt_state)
        model.ensemble_weights[name] = np.asarray(weights)

    def save_checkpoint(self, model, path):
        checkpoint = model.get_checkpoint()
        checkpoint["trainer_ckpt_version"] = self.__checkpoint_version__
        checkpoint["train_hypers"] = self.hypers
        save_checkpoint_file(checkpoint, path)

    @classmethod
    def load_checkpoint(cls, checkpoint, hypers):
        return cls(hypers)


__model__ = LLPRUncertaintyModel
__trainer__ = LLPRTrainer

DEFAULT_HYPERS = {
    "model": copy.deepcopy(DEFAULT_MODEL_HYPERS),
    "training": dict(LLPRTrainer.DEFAULT_HYPERS),
}
