"""SOAP-BPNN: Behler-Parrinello networks on SOAP power-spectrum features.

TPU-native re-design of the reference ``src/metatrain/soap_bpnn/model.py``:
the spherical expansion, power spectrum and per-species MLPs all run as
dense batched contractions on the NEF layout (see ``modules.py``), with
the same shared preprocessing/assembly as every other architecture.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import jax.numpy as jnp

from ...containers import SystemBatch
from ...data.target_info import DatasetInfo
from ..nn_base import AtomisticNNModel
from .modules import SoapBpnnModule


DEFAULT_MODEL_HYPERS: Dict[str, Any] = {
    # reference defaults: soap_bpnn/documentation.py
    "soap": {
        "max_angular": 6,
        "max_radial": 7,
        "cutoff": {"radius": 5.0, "width": 0.5},
    },
    "legacy": True,
    "num_pseudo_species": 4,  # used when legacy=False (alchemical channels)
    "bpnn": {
        "num_hidden_layers": 2,
        "num_neurons_per_layer": 32,
        "layernorm": True,
    },
    "add_lambda_basis": True,
    "heads": {},
    "zbl": False,
    "long_range": {
        "enable": False,
        "smearing": 1.4,
        "n_kmax": 4,
        "method": "ewald",
        "mesh": 32,
    },
}


class SoapBpnn(AtomisticNNModel):
    ARCHITECTURE_NAME = "soap_bpnn"
    __checkpoint_version__ = 3

    @classmethod
    def upgrade_v2_v3(cls, checkpoint):
        """v3 realigns the modern/alchemical (``legacy=False``) network
        with the reference architecture (center-type encoding + shared
        LayerNorm + shared bias-free MLP, ``soap_bpnn/model.py:268-312``)
        -- the old per-species alchemical parameter layout cannot be
        mapped onto it. Legacy checkpoints are structurally unchanged."""
        if not checkpoint["hypers"].get("legacy", True):
            raise RuntimeError(
                "Unable to upgrade the checkpoint: v2 alchemical "
                "(legacy=False) soap_bpnn parameters use the pre-v3 "
                "per-species network; retrain or re-import the model"
            )
        return dict(checkpoint)

    @classmethod
    def upgrade_v1_v2(cls, checkpoint):
        """v2 records the ``long_range`` hyper block explicitly and
        carries the scaler's full decomposition (migrated by the scaler
        sub-checkpoint's own chain). Parameters are unchanged; fill the
        long_range defaults v1 models behaved as (disabled)."""
        hypers = dict(checkpoint["hypers"])
        hypers.setdefault(
            "long_range", copy.deepcopy(DEFAULT_MODEL_HYPERS["long_range"])
        )
        checkpoint = dict(checkpoint)
        checkpoint["hypers"] = hypers
        return checkpoint
    __supported_dtypes__ = [jnp.float64, jnp.float32]

    def __init__(
        self,
        hypers: Dict[str, Any],
        dataset_info: DatasetInfo,
        compute_dtype=jnp.float32,
    ):
        full = copy.deepcopy(DEFAULT_MODEL_HYPERS)
        for key, value in (hypers or {}).items():
            if isinstance(value, dict) and isinstance(full.get(key), dict):
                merged = copy.deepcopy(full[key])
                _deep_update(merged, value)
                full[key] = merged
            else:
                full[key] = value
        super().__init__(full, dataset_info, compute_dtype)
        hp = self.hypers

        # per-target block specs: scalar MLP heads vs CG tensor bases
        target_specs: Dict[str, Any] = {}
        for name, info in self.target_infos.items():
            specs = []
            if info.is_scalar:
                for _ in info.layout.blocks():
                    specs.append({"type": "scalar"})
            elif info.is_spherical:
                if "o3_lambda" not in info.layout.keys.names:
                    raise NotImplementedError(
                        f"SOAP-BPNN target '{name}': spherical "
                        "product='cartesian' (o3_lambda_1/2) targets "
                        "have no equivariant readout here; use a "
                        "generic-head architecture (pet, dpa3)"
                    )
                for key_tuple, block in info.layout.items():
                    names = info.layout.keys.names
                    specs.append(
                        {
                            "type": "spherical",
                            "o3_lambda": int(
                                key_tuple[names.index("o3_lambda")]
                            ),
                            "o3_sigma": int(key_tuple[names.index("o3_sigma")]),
                            "num_properties": len(block.properties),
                        }
                    )
            elif info.is_cartesian and info.rank == 1:
                for _, block in info.layout.items():
                    specs.append(
                        {
                            "type": "cartesian_rank1",
                            "o3_lambda": 1,
                            "o3_sigma": 1,
                            "num_properties": len(block.properties),
                        }
                    )
            elif info.is_cartesian and info.rank == 2:
                # predicted as (l=0, s=1), (l=1, s=-1), (l=2, s=1) spherical
                # parts, converted to 3x3 Cartesian with the CG intertwiner
                # (reference soap_bpnn/model.py:1085-1102,1320)
                for _, block in info.layout.items():
                    specs.append(
                        {
                            "type": "cartesian_rank2",
                            "num_properties": len(block.properties),
                        }
                    )
            else:
                raise NotImplementedError(
                    f"SOAP-BPNN target '{name}': Cartesian rank >= 3 targets "
                    "are not supported (use a spherical decomposition)"
                )
            target_specs[name] = specs
        self._target_specs = target_specs

        self.cutoff = float(hp["soap"]["cutoff"]["radius"])
        if hp["zbl"]:
            from ..zbl import ZBL

            self.zbl = ZBL(
                dataset_info, self.cutoff, hp["soap"]["cutoff"]["width"]
            )
        self.module = SoapBpnnModule(
            hypers=hp,
            num_species=len(self.atomic_types),
            output_shapes=self.output_shapes,
            head_types=dict(hp["heads"] or {}),
            target_specs=target_specs,
            dtype=compute_dtype,
        )

    def preprocess(self, batch: SystemBatch) -> Dict[str, Any]:
        vectors, distances = batch.edge_vectors()
        species_index = self.species_index(batch)
        return {
            "species_index": species_index,
            "neighbor_species_index": species_index[batch.nbr_indices],
            "edge_vectors": vectors,
            "edge_distances": distances,
            "nbr_mask": batch.nbr_mask,
            # long-range featurizer inputs
            "nbr_indices": batch.nbr_indices,
            "positions": batch.positions,
            "cells": batch.cells,
            "pbc": batch.pbc,
            "system_index": batch.system_index,
            "atom_mask": batch.atom_mask,
        }

    def requested_neighbor_cutoff(self) -> float:
        return self.cutoff


def _deep_update(base: dict, update: dict) -> None:
    for key, value in update.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            _deep_update(base[key], value)
        else:
            base[key] = value
