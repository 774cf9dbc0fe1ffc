"""Target metadata: layouts, TargetInfo and DatasetInfo.

Re-design of the reference's ``utils/data/target_info.py`` (935 LoC) and the
``DatasetInfo`` part of ``utils/data/dataset.py:184-233``. A target's
structure is encoded as a zero-sample *layout* TensorMap; from it we derive
whether the target is scalar / Cartesian / spherical, its sample kind
(system / atom / atom_pair) and which gradients it carries.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from ..containers import Labels, TensorBlock, TensorMap


_VALID_GRADIENTS = ("positions", "strain")


def _empty_block(
    sample_names: Sequence[str],
    components: Sequence[Labels],
    properties: Labels,
) -> TensorBlock:
    shape = (0,) + tuple(len(c) for c in components) + (len(properties),)
    return TensorBlock(
        values=np.zeros(shape, dtype=np.float64),
        samples=Labels.empty(sample_names),
        components=components,
        properties=properties,
    )


class TargetInfo:
    """Information about one training target.

    :param layout: zero-sample TensorMap encoding block keys, sample names,
        components, properties and gradients of the target
        (reference: ``utils/data/target_info.py:16-63``).
    :param quantity: physical quantity ("energy", ...); "" disables unit logic.
    :param unit: unit string ("eV", ...).
    """

    def __init__(self, layout: TensorMap, quantity: str = "", unit: str = ""):
        self.layout = layout
        self.quantity = quantity
        self.unit = unit or ""

        self.is_scalar = False
        self.is_cartesian = False
        self.is_spherical = False
        self.is_atomic_basis = "atom_type" in layout.keys.names
        self._classify()

    def _classify(self) -> None:
        block = self.layout.block(0) if len(self.layout) else None
        if block is None:
            raise ValueError("TargetInfo layout needs at least one block")
        comp_names = [c.names for c in block.components]
        if len(comp_names) == 0:
            self.is_scalar = True
        elif any(
            any(str(n).startswith("o3_mu") for n in names)
            for names in comp_names
        ):
            # "o3_mu" (plain spherical) or "o3_mu_1"/"o3_mu_2"
            # (product="cartesian" rank-2 spherical tensors)
            self.is_spherical = True
        elif all(names[0].startswith("xyz") for names in comp_names if names):
            self.is_cartesian = True
        else:
            raise ValueError(f"cannot classify target with components {comp_names}")

        for _, b in self.layout.items():
            for name in b.gradients_list():
                if name not in _VALID_GRADIENTS:
                    raise ValueError(
                        f"gradient '{name}' not supported; valid: {_VALID_GRADIENTS}"
                    )

    @property
    def gradients(self) -> List[str]:
        if self.is_scalar:
            return sorted(self.layout.block(0).gradients_list())
        return []

    @property
    def sample_kind(self) -> str:
        names = self.layout.block(0).samples.names
        if "atom" in names:
            return "atom"
        if "first_atom" in names:
            return "atom_pair"
        return "system"

    @property
    def per_atom(self) -> bool:
        return self.sample_kind == "atom"

    @property
    def rank(self) -> int:
        return len(self.layout.block(0).components)

    def __repr__(self) -> str:
        kind = (
            "scalar" if self.is_scalar
            else "cartesian" if self.is_cartesian
            else "spherical"
        )
        return (
            f"TargetInfo({kind}, sample_kind={self.sample_kind}, "
            f"quantity='{self.quantity}', unit='{self.unit}', "
            f"gradients={self.gradients})"
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, TargetInfo):
            return NotImplemented
        return (
            self.quantity == other.quantity
            and self.unit == other.unit
            and self.layout.keys == other.layout.keys
            and all(
                a.samples.names == b.samples.names
                and a.components == b.components
                and a.properties == b.properties
                and a.gradients_list() == b.gradients_list()
                for a, b in zip(self.layout.blocks(), other.layout.blocks())
            )
        )


def get_energy_target_info(
    unit: str = "",
    add_position_gradients: bool = False,
    add_strain_gradients: bool = False,
    per_atom: bool = False,
) -> TargetInfo:
    """TargetInfo for an energy(-like) scalar with optional force/stress grads.

    Mirrors the reference factory (``utils/data/target_info.py``): position
    gradients carry an (atom, xyz) structure; strain gradients carry
    (xyz_1, xyz_2) components.
    """
    sample_names = ["system", "atom"] if per_atom else ["system"]
    properties = Labels(["energy"], np.zeros((1, 1), dtype=np.int32))
    block = _empty_block(sample_names, [], properties)

    if add_position_gradients:
        grad = _empty_block(
            ["sample", "system", "atom"],
            [Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))],
            properties,
        )
        block.add_gradient("positions", grad)
    if add_strain_gradients:
        grad = _empty_block(
            ["sample"],
            [
                Labels(["xyz_1"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
                Labels(["xyz_2"], np.arange(3, dtype=np.int32).reshape(-1, 1)),
            ],
            properties,
        )
        block.add_gradient("strain", grad)

    layout = TensorMap(Labels.single(), [block])
    return TargetInfo(layout, quantity="energy", unit=unit)


def get_generic_target_info(
    target_type: str,
    num_properties: int = 1,
    unit: str = "",
    quantity: str = "",
    per_atom: bool = False,
    rank: int = 1,
    irreps: Optional[Sequence[Dict[str, int]]] = None,
    property_name: str = "properties",
    product: Optional[str] = None,
) -> TargetInfo:
    """TargetInfo for scalar / Cartesian / spherical targets.

    :param target_type: "scalar", "cartesian" or "spherical".
    :param rank: Cartesian tensor rank (1 -> xyz, 2 -> xyz_1 x xyz_2).
    :param irreps: for spherical targets, a list of ``{"o3_lambda": l,
        "o3_sigma": s}`` dicts, one block per irrep. An ATOMIC-BASIS
        spherical target passes a dict ``{atom_type: [{"num": n,
        "o3_lambda": l, "o3_sigma": s}, ...]}`` instead (reference
        ``utils/data/target_info.py:615-680``): per-atom samples, block
        keys gain ``atom_type``, and each irrep's ``num`` multiplicity
        multiplies the property count.
    """
    sample_names = ["system", "atom"] if per_atom else ["system"]
    properties = Labels(
        [property_name], np.arange(num_properties, dtype=np.int32).reshape(-1, 1)
    )

    if target_type == "scalar":
        layout = TensorMap(
            Labels.single(), [_empty_block(sample_names, [], properties)]
        )
    elif target_type == "cartesian":
        if rank == 1:
            components = [Labels(["xyz"], np.arange(3, dtype=np.int32).reshape(-1, 1))]
        else:
            components = [
                Labels([f"xyz_{i + 1}"], np.arange(3, dtype=np.int32).reshape(-1, 1))
                for i in range(rank)
            ]
        layout = TensorMap(
            Labels.single(), [_empty_block(sample_names, components, properties)]
        )
    elif target_type == "spherical" and product == "cartesian":
        # rank-2 spherical tensor in the uncoupled (Cartesian-product)
        # basis: one block per ORDERED irrep pair, keys
        # (o3_lambda_1, o3_lambda_2, o3_sigma_1, o3_sigma_2) [+
        # atom_type for the atomic-basis variant], components
        # o3_mu_1 x o3_mu_2, properties n_1 x n_2 (reference
        # ``utils/data/target_info.py:618-701,753-775``)
        if not irreps:
            raise ValueError("spherical product targets need `irreps`")

        def pair_blocks(irrep_list, extra_key=()):
            import itertools

            rows, blks = [], []
            for ir1, ir2 in itertools.product(irrep_list, irrep_list):
                l1, s1 = int(ir1["o3_lambda"]), int(ir1.get("o3_sigma", 1))
                l2, s2 = int(ir2["o3_lambda"]), int(ir2.get("o3_sigma", 1))
                n1 = int(ir1.get("num", 1)) * num_properties
                n2 = int(ir2.get("num", 1)) * num_properties
                rows.append([l1, l2, s1, s2, *extra_key])
                components = [
                    Labels(
                        ["o3_mu_1"],
                        np.arange(-l1, l1 + 1, dtype=np.int32).reshape(-1, 1),
                    ),
                    Labels(
                        ["o3_mu_2"],
                        np.arange(-l2, l2 + 1, dtype=np.int32).reshape(-1, 1),
                    ),
                ]
                props = Labels(
                    ["n_1", "n_2"],
                    np.array(
                        [[i, j] for i in range(n1) for j in range(n2)],
                        dtype=np.int32,
                    ).reshape(-1, 2),
                )
                blks.append(_empty_block(sample_names, components, props))
            return rows, blks

        if isinstance(irreps, dict):
            if not per_atom:
                raise ValueError(
                    "atomic-basis spherical targets are per-atom"
                )
            key_rows, blocks = [], []
            for atom_type in sorted(int(t) for t in irreps):
                r, b = pair_blocks(irreps[atom_type], (atom_type,))
                key_rows += r
                blocks += b
            keys = Labels(
                ["o3_lambda_1", "o3_lambda_2", "o3_sigma_1", "o3_sigma_2",
                 "atom_type"],
                np.array(key_rows, dtype=np.int32),
            )
        else:
            key_rows, blocks = pair_blocks(list(irreps))
            keys = Labels(
                ["o3_lambda_1", "o3_lambda_2", "o3_sigma_1", "o3_sigma_2"],
                np.array(key_rows, dtype=np.int32),
            )
        layout = TensorMap(keys, blocks)
    elif target_type == "spherical" and isinstance(irreps, dict):
        # atomic-basis layout: one block per (irrep, atom_type); blocks
        # carry only samples of atoms of their type. The multiplicity
        # ``num`` multiplies the property axis, like the reference's
        # per-(type, irrep) basis functions.
        if not per_atom:
            raise ValueError("atomic-basis spherical targets are per-atom")
        key_rows = []
        blocks = []
        for atom_type in sorted(int(t) for t in irreps):
            for ir in irreps[atom_type]:
                lam = int(ir["o3_lambda"])
                sig = int(ir.get("o3_sigma", 1))
                num = int(ir.get("num", 1))
                key_rows.append([lam, sig, atom_type])
                components = [
                    Labels(
                        ["o3_mu"],
                        np.arange(-lam, lam + 1, dtype=np.int32).reshape(-1, 1),
                    )
                ]
                props = Labels(
                    [property_name],
                    np.arange(
                        num * num_properties, dtype=np.int32
                    ).reshape(-1, 1),
                )
                blocks.append(_empty_block(sample_names, components, props))
        keys = Labels(
            ["o3_lambda", "o3_sigma", "atom_type"],
            np.array(key_rows, dtype=np.int32),
        )
        layout = TensorMap(keys, blocks)
    elif target_type == "spherical":
        if not irreps:
            raise ValueError("spherical targets need `irreps`")
        keys = Labels(
            ["o3_lambda", "o3_sigma"],
            np.array(
                [[ir["o3_lambda"], ir["o3_sigma"]] for ir in irreps], dtype=np.int32
            ),
        )
        blocks = []
        for ir in irreps:
            lam = ir["o3_lambda"]
            components = [
                Labels(
                    ["o3_mu"],
                    np.arange(-lam, lam + 1, dtype=np.int32).reshape(-1, 1),
                )
            ]
            blocks.append(_empty_block(sample_names, components, properties))
        layout = TensorMap(keys, blocks)
    else:
        raise ValueError(f"unknown target type {target_type!r}")

    return TargetInfo(layout, quantity=quantity, unit=unit)


class DatasetInfo:
    """Global information shared by every dataset in a run.

    Reference: ``utils/data/dataset.py:184-233`` (union/update semantics).

    :param length_unit: unit of positions/cell ("angstrom", ...).
    :param atomic_types: all atomic numbers the model must support.
    :param targets: name -> TargetInfo.
    :param extra_data: name -> TargetInfo for non-target conditioning data.
    """

    def __init__(
        self,
        length_unit: str,
        atomic_types: Sequence[int],
        targets: Dict[str, TargetInfo],
        extra_data: Optional[Dict[str, TargetInfo]] = None,
    ):
        self.length_unit = length_unit or ""
        self.atomic_types = sorted(set(int(t) for t in atomic_types))
        self.targets = dict(targets)
        self.extra_data = dict(extra_data or {})

    def __eq__(self, other) -> bool:
        if not isinstance(other, DatasetInfo):
            return NotImplemented
        return (
            self.length_unit == other.length_unit
            and self.atomic_types == other.atomic_types
            and self.targets == other.targets
        )

    def __repr__(self) -> str:
        return (
            f"DatasetInfo(length_unit='{self.length_unit}', "
            f"atomic_types={self.atomic_types}, targets={list(self.targets)})"
        )

    def copy(self) -> "DatasetInfo":
        return DatasetInfo(
            self.length_unit,
            list(self.atomic_types),
            dict(self.targets),
            dict(self.extra_data),
        )

    def update(self, other: "DatasetInfo") -> None:
        """Merge another DatasetInfo in (union of types and targets)."""
        if self.length_unit != other.length_unit:
            raise ValueError(
                f"length units differ: '{self.length_unit}' vs '{other.length_unit}'"
            )
        self.atomic_types = sorted(set(self.atomic_types) | set(other.atomic_types))
        for name, info in other.targets.items():
            if name in self.targets and self.targets[name] != info:
                raise ValueError(f"target '{name}' differs between datasets")
            self.targets[name] = info
        self.extra_data.update(other.extra_data)

    def union(self, other: "DatasetInfo") -> "DatasetInfo":
        new = self.copy()
        new.update(other)
        return new

    # -- (de)serialization for checkpoints ---------------------------------

    def to_dict(self) -> dict:
        return {
            "length_unit": self.length_unit,
            "atomic_types": self.atomic_types,
            "targets": {k: _target_info_to_dict(v) for k, v in self.targets.items()},
            "extra_data": {
                k: _target_info_to_dict(v) for k, v in self.extra_data.items()
            },
        }

    @staticmethod
    def from_dict(data: dict) -> "DatasetInfo":
        return DatasetInfo(
            length_unit=data["length_unit"],
            atomic_types=data["atomic_types"],
            targets={
                k: _target_info_from_dict(v) for k, v in data["targets"].items()
            },
            extra_data={
                k: _target_info_from_dict(v)
                for k, v in data.get("extra_data", {}).items()
            },
        )


def _labels_to_dict(labels: Labels) -> dict:
    return {"names": list(labels.names), "values": np.asarray(labels.values).tolist()}


def _labels_from_dict(d: dict) -> Labels:
    return Labels(d["names"], np.asarray(d["values"], dtype=np.int32).reshape(
        -1, len(d["names"])
    ))


def _target_info_to_dict(info: TargetInfo) -> dict:
    blocks = []
    for _, block in info.layout.items():
        blocks.append(
            {
                "samples": list(block.samples.names),
                "components": [_labels_to_dict(c) for c in block.components],
                "properties": _labels_to_dict(block.properties),
                "gradients": {
                    name: {
                        "samples": list(g.samples.names),
                        "components": [_labels_to_dict(c) for c in g.components],
                        "properties": _labels_to_dict(g.properties),
                    }
                    for name, g in block.gradients()
                },
            }
        )
    return {
        "quantity": info.quantity,
        "unit": info.unit,
        "keys": _labels_to_dict(info.layout.keys),
        "blocks": blocks,
    }


def _target_info_from_dict(data: dict) -> TargetInfo:
    keys = _labels_from_dict(data["keys"])
    blocks = []
    for bd in data["blocks"]:
        block = _empty_block(
            bd["samples"],
            [_labels_from_dict(c) for c in bd["components"]],
            _labels_from_dict(bd["properties"]),
        )
        for name, gd in bd["gradients"].items():
            block.add_gradient(
                name,
                _empty_block(
                    gd["samples"],
                    [_labels_from_dict(c) for c in gd["components"]],
                    _labels_from_dict(gd["properties"]),
                ),
            )
        blocks.append(block)
    return TargetInfo(
        TensorMap(keys, blocks), quantity=data["quantity"], unit=data["unit"]
    )


def collect_atomic_types(systems) -> Set[int]:
    types: Set[int] = set()
    for system in systems:
        types.update(int(t) for t in np.unique(system.types))
    return types
