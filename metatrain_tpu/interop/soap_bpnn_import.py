"""Torch metatrain SOAP-BPNN checkpoint importer (VERDICT r3 #6).

The reference SOAP-BPNN's descriptor comes from torch-spex, which is
not installed here -- but every reference checkpoint SHIPS the splined
radial basis itself (``soap_calculator.calculator.radial.spliner.*``),
so the descriptor is reproducible exactly:

- radial: the checkpoint's cubic Hermite spline, evaluated natively
  (``ops/radial.hermite_spline_basis``) x the shifted-cosine cutoff
  from the hypers;
- angular: real orthonormal spherical harmonics -- the per-l power
  spectrum ``sum_m c_m c'_m`` is invariant under ANY orthogonal per-l
  basis change, so the only convention that could differ (sphericart vs
  ours) is a per-l scale; both families are the orthonormal real
  harmonics, and a residual GLOBAL scale would be absorbed exactly by
  the (always-on in practice) per-species LayerNorm;
- feature layout: full (species x n) x (species x n') square per l,
  concatenated l-major -- identical contraction and flattening order
  to reference ``soap_bpnn/modules/power_spectrum.py:127-137``.

The NN weights map exactly: per-species LayerNorm, the per-species MLP
chain (reference ``MLPMap``: k x [Linear(bias=False) + SiLU] maps onto
our ``SpeciesMLP`` with ``num_hidden_layers = k - 1`` plus the module's
output layer + activation), and the per-species last layers. The
composition baselines ride the checkpoint as a serialized TensorMap and
are parsed with the native ``.mts`` reader.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .torch_ckpt import _dataset_info_from_stub, load_torch_checkpoint


def _derive_n_per_l(n_columns: int, n_l: int, pair_dim: int):
    """Per-l radial counts from the spline column count and the power-
    spectrum width: the unique nonincreasing composition of
    ``n_columns`` into ``n_l`` parts with ``sum n_i^2 == pair_dim``."""
    import itertools

    matches = []
    for comp in itertools.product(range(n_columns, 0, -1), repeat=n_l):
        if sum(comp) != n_columns:
            continue
        if any(comp[i] < comp[i + 1] for i in range(n_l - 1)):
            continue
        if sum(c * c for c in comp) == pair_dim:
            matches.append(comp)
    if len(matches) != 1:
        raise ValueError(
            f"cannot derive per-l radial counts: {n_columns} spline "
            f"columns over {n_l} l-channels with pair dim {pair_dim} "
            f"-> candidates {matches}"
        )
    return list(matches[0])


def convert_soap_bpnn_checkpoint(
    path_or_ckpt, use_best: bool = True
) -> Dict[str, Any]:
    """Convert a torch metatrain SOAP-BPNN checkpoint into this
    framework's native checkpoint dict."""
    import jax.numpy as jnp

    from ..models.composition import CompositionModel
    from ..models.scaler import Scaler
    from ..models.soap_bpnn import SoapBpnn

    ckpt = (
        path_or_ckpt
        if isinstance(path_or_ckpt, dict)
        else load_torch_checkpoint(path_or_ckpt)
    )
    if ckpt.get("architecture_name") != "soap_bpnn":
        raise ValueError(
            "not a soap_bpnn checkpoint: "
            f"{ckpt.get('architecture_name')!r}"
        )
    if "model_data" not in ckpt:
        raise ValueError(
            "soap_bpnn checkpoint has no model_data section (hypers + "
            "dataset_info); is this a real torch metatrain checkpoint?"
        )
    torch_hypers = dict(ckpt["model_data"]["model_hypers"])
    dataset_info = _dataset_info_from_stub(ckpt["model_data"]["dataset_info"])
    state = (
        ckpt.get("best_model_state_dict") or ckpt["model_state_dict"]
    ) if use_best else ckpt["model_state_dict"]
    state = {
        k: (np.asarray(v.detach().numpy()) if hasattr(v, "detach") else v)
        for k, v in state.items()
    }
    if not torch_hypers.get("legacy", True):
        return _convert_alchemical(
            ckpt, torch_hypers, dataset_info, state
        )

    species = sorted(dataset_info.atomic_types)
    n_species = len(species)
    max_angular = int(torch_hypers["soap"]["max_angular"])

    spline_v = state["soap_calculator.calculator.radial.spliner.spline_values"]
    spline_d = state[
        "soap_calculator.calculator.radial.spliner.spline_derivatives"
    ]
    spacing = float(
        state["soap_calculator.calculator.radial.spliner.spline_spacing"]
    )
    ln_dim = None
    for k, v in state.items():
        if k.startswith("layernorm.module_list.") and k.endswith(".weight"):
            ln_dim = int(np.asarray(v).shape[0])
            break
    if ln_dim is None:
        # no layernorm: take the first bpnn layer's input width
        for k, v in state.items():
            if k.startswith("bpnn.module_list.0.") and k.endswith(".weight"):
                ln_dim = int(np.asarray(v).shape[1])
                break
    n_per_l = _derive_n_per_l(
        spline_v.shape[1], max_angular + 1, ln_dim // n_species**2
    )

    bpnn_hp = dict(torch_hypers.get("bpnn", {}))
    num_hidden = int(bpnn_hp.get("num_hidden_layers", 2))
    neurons = int(bpnn_hp.get("num_neurons_per_layer", 32))

    hypers = {
        "soap": dict(torch_hypers["soap"]),
        "bpnn": {
            "layernorm": bool(bpnn_hp.get("layernorm", True)),
            # reference MLPMap: num_hidden x [Linear + SiLU]; our module
            # runs (num_hidden_layers hidden + output layer) followed by
            # a module-level SiLU -- the chains coincide with k-1
            "num_hidden_layers": max(num_hidden - 1, 0),
            "num_neurons_per_layer": neurons,
        },
        "legacy": True,
        "heads": {name: "linear" for name in dataset_info.targets},
        "zbl": False,
        "add_lambda_basis": bool(torch_hypers.get("add_lambda_basis", True)),
        "spex_compat": {
            "spline_values": np.asarray(spline_v, np.float64).tolist(),
            "spline_derivatives": np.asarray(spline_d, np.float64).tolist(),
            "spline_spacing": spacing,
            "n_per_l": n_per_l,
        },
    }

    model = SoapBpnn(hypers, dataset_info)
    import jax

    params = model.init_params(jax.random.PRNGKey(0))
    tree = params["params"]

    consumed = set()

    def take(key):
        consumed.add(key)
        return np.asarray(state[key], np.float32)

    # layernorm: per-species scale/offset
    if hypers["bpnn"]["layernorm"]:
        tree["layernorm"]["scale"] = jnp.asarray(
            np.stack(
                [take(f"layernorm.module_list.{s}.weight")
                 for s in range(n_species)]
            )
        )
        tree["layernorm"]["offset"] = jnp.asarray(
            np.stack(
                [take(f"layernorm.module_list.{s}.bias")
                 for s in range(n_species)]
            )
        )

    # bpnn MLP chain: reference Linear layers sit at whatever indices
    # the per-species nn.Sequential assigned (activations between them
    # carry no parameters) -- discover them instead of assuming;
    # weight (out, in) -> our W_{j} (species, in, out), last -> W_out
    layer_ids = sorted(
        {
            int(k.split(".")[3])
            for k in state
            if k.startswith("bpnn.module_list.0.") and k.endswith(".weight")
        }
    )
    if len(layer_ids) != num_hidden:
        num_hidden = len(layer_ids)

    def bpnn_weight(ordinal):
        return np.stack(
            [
                take(f"bpnn.module_list.{s}.{layer_ids[ordinal]}.weight").T
                for s in range(n_species)
            ]
        )

    for j in range(num_hidden - 1):
        tree["bpnn"][f"W_{j}"] = jnp.asarray(bpnn_weight(j))
        tree["bpnn"][f"b_{j}"] = jnp.zeros_like(tree["bpnn"][f"b_{j}"])
    tree["bpnn"]["W_out"] = jnp.asarray(bpnn_weight(num_hidden - 1))
    tree["bpnn"]["b_out"] = jnp.zeros_like(tree["bpnn"]["b_out"])

    # per-target last layers
    for name in dataset_info.targets:
        prefix = f"last_layers.{name}."
        blocks = sorted(
            {
                k[len(prefix):].split(".", 1)[0]
                for k in state
                if k.startswith(prefix)
            }
        )
        our_keys = [
            k for k in tree if k.startswith(f"last_layer_{name}".replace(":", "_"))
        ]
        for block_name, our_key in zip(blocks, sorted(our_keys)):
            W = np.stack(
                [
                    take(
                        f"{prefix}{block_name}.module_map."
                        f"module_list.{s}.weight"
                    ).T
                    for s in range(n_species)
                ]
            )
            tree[our_key]["W_out"] = jnp.asarray(W)
            tree[our_key]["b_out"] = jnp.zeros_like(tree[our_key]["b_out"])

    # composition + scaler baselines: serialized TensorMap buffers
    composition_ckpt, scaler_ckpt = _baselines_from_state(
        state, consumed, species, dataset_info
    )

    out = {
        "architecture_name": "soap_bpnn",
        "scaler": scaler_ckpt,
        "model_ckpt_version": SoapBpnn.__checkpoint_version__,
        "hypers": dict(model.hypers),
        "dataset_info": dataset_info.to_dict(),
        "params": params,
        "torch_source_version": ckpt.get("model_ckpt_version"),
        # tensors not mapped (descriptor internals already captured by
        # the spline; metatensor helper buffers carry no weights)
        "unmapped_tensors": sorted(
            k
            for k in state
            if k not in consumed
            and not k.startswith("soap_calculator.")
            and "_mts_helper" not in k
            and "_extra_state" not in k
            and "dummy_buffer" not in k
            and "type_to_index" not in k
        ),
    }
    out["composition"] = composition_ckpt
    return out


def _convert_alchemical(ckpt, torch_hypers, dataset_info, state):
    """Modern/alchemical (``legacy=False``) checkpoint conversion.

    The reference modern model (``soap_bpnn/model.py:229-312``) is: spex
    descriptor with an Alchemical pseudo-species contraction (a learned
    (species -> pseudo) linear map SHIPPED in the checkpoint, the same
    trick as the radial spline), a center-type encoding that multiplies
    the features, one SHARED LayerNorm, a SHARED bias-free Linear+SiLU
    chain, and one shared bias-free last linear per block. Every piece
    maps exactly onto the v3 modern module
    (``models/soap_bpnn/modules.py``); the alchemical matrix is
    discovered by SHAPE under ``soap_calculator.calculator.species.*``
    (spex's parameter naming is not part of the checkpoint contract).
    """
    import jax
    import jax.numpy as jnp

    from ..models.composition import CompositionModel
    from ..models.scaler import Scaler
    from ..models.soap_bpnn import SoapBpnn

    species = sorted(dataset_info.atomic_types)
    n_species = len(species)
    max_angular = int(torch_hypers["soap"]["max_angular"])
    consumed = set()

    def take(key):
        consumed.add(key)
        return np.asarray(state[key], np.float32)

    spline_v = state["soap_calculator.calculator.radial.spliner.spline_values"]
    spline_d = state[
        "soap_calculator.calculator.radial.spliner.spline_derivatives"
    ]
    spacing = float(
        state["soap_calculator.calculator.radial.spliner.spline_spacing"]
    )

    # -- alchemical contraction: the (species -> pseudo) linear map -----
    cand = [
        (k, np.asarray(v))
        for k, v in state.items()
        if k.startswith("soap_calculator.calculator.species.")
        and getattr(v, "ndim", 0) == 2
    ]
    if len(cand) != 1:
        raise ValueError(
            "alchemical soap_bpnn import: expected exactly one 2-D "
            "species-contraction tensor under soap_calculator.calculator"
            f".species.*, found {[k for k, _ in cand]}"
        )
    alch_key, alch = cand[0]
    if alch.shape[0] == alch.shape[1]:
        raise ValueError(
            "alchemical soap_bpnn import: square species-contraction "
            f"matrix {alch.shape} is orientation-ambiguous; cannot "
            "import safely"
        )
    if alch.shape[0] == n_species:
        pass  # (species, pseudo): embedding orientation
    elif alch.shape[1] == n_species:
        alch = alch.T  # torch Linear (pseudo, species) layout
    else:
        raise ValueError(
            f"species-contraction matrix {alch.shape} does not match "
            f"{n_species} atomic types"
        )
    n_pseudo = int(alch.shape[1])
    consumed.add(alch_key)

    # -- geometry from shipped tensors ----------------------------------
    if "layernorm_for_tensors.weight" in state:
        soap_size = int(state["layernorm_for_tensors.weight"].shape[0])
        use_ln = True
    else:
        first_lin = min(
            (
                k
                for k in state
                if k.startswith("bpnn_for_tensors.") and k.endswith(".weight")
            ),
            key=lambda k: int(k.split(".")[1]),
            default=None,
        )
        if first_lin is None:
            raise ValueError(
                "alchemical soap_bpnn import: no layernorm or bpnn "
                "weights to derive the descriptor width from"
            )
        soap_size = int(np.asarray(state[first_lin]).shape[1])
        use_ln = False
    n_per_l = _derive_n_per_l(
        np.asarray(spline_v).shape[1], max_angular + 1,
        soap_size // n_pseudo**2,
    )

    layer_ids = sorted(
        {
            int(k.split(".")[1])
            for k in state
            if k.startswith("bpnn_for_tensors.") and k.endswith(".weight")
        }
    )
    num_hidden = len(layer_ids)  # reference Linear count (k)
    neurons = (
        int(np.asarray(state[f"bpnn_for_tensors.{layer_ids[0]}.weight"]).shape[0])
        if layer_ids
        else int(torch_hypers.get("bpnn", {}).get("num_neurons_per_layer", 32))
    )
    if num_hidden == 0:
        raise NotImplementedError(
            "alchemical soap_bpnn import: num_hidden_layers=0 "
            "checkpoints (features feed the last layers directly) are "
            "not supported by the v3 modern module"
        )

    for name, head_type in dict(torch_hypers.get("heads", {})).items():
        if head_type not in (None, "linear"):
            raise NotImplementedError(
                f"alchemical soap_bpnn import: head type {head_type!r} "
                f"for target {name!r} is not linear"
            )

    hypers = {
        "soap": dict(torch_hypers["soap"]),
        "bpnn": {
            "layernorm": use_ln,
            "num_hidden_layers": num_hidden - 1,
            "num_neurons_per_layer": neurons,
        },
        "legacy": False,
        "num_pseudo_species": n_pseudo,
        "heads": {name: "linear" for name in dataset_info.targets},
        "zbl": False,
        "add_lambda_basis": bool(torch_hypers.get("add_lambda_basis", True)),
        "spex_compat": {
            "spline_values": np.asarray(spline_v, np.float64).tolist(),
            "spline_derivatives": np.asarray(spline_d, np.float64).tolist(),
            "spline_spacing": spacing,
            "n_per_l": n_per_l,
        },
    }

    model = SoapBpnn(hypers, dataset_info)
    params = model.init_params(jax.random.PRNGKey(0))
    tree = params["params"]

    emb = tree["spherical_expansion"]["alchemical_embedding"]["embedding"]
    if tuple(emb.shape) != tuple(alch.shape):
        raise ValueError(
            f"alchemical embedding shape mismatch: module {emb.shape} "
            f"vs checkpoint {alch.shape}"
        )
    tree["spherical_expansion"]["alchemical_embedding"]["embedding"] = (
        jnp.asarray(alch, jnp.float32)
    )
    tree["center_encoding"]["embedding"] = jnp.asarray(
        take("center_encoding.weight")
    )
    if use_ln:
        tree["layernorm_shared"]["scale"] = jnp.asarray(
            take("layernorm_for_tensors.weight")
        )
        tree["layernorm_shared"]["bias"] = jnp.asarray(
            take("layernorm_for_tensors.bias")
        )
    for ordinal, lid in enumerate(layer_ids):
        tree[f"bpnn_shared_{ordinal}"]["kernel"] = jnp.asarray(
            take(f"bpnn_for_tensors.{lid}.weight").T
        )

    for name in dataset_info.targets:
        prefix = f"last_layers.{name}."
        blocks = sorted(
            {
                k[len(prefix):].split(".", 1)[0]
                for k in state
                if k.startswith(prefix)
            }
        )
        our_keys = sorted(
            k
            for k in tree
            if k.startswith(f"last_layer_{name}".replace(":", "_"))
        )
        for block_name, our_key in zip(blocks, our_keys):
            tree[our_key]["kernel"] = jnp.asarray(
                take(
                    f"{prefix}{block_name}.module_map.module_list.0.weight"
                ).T
            )

    composition_ckpt, scaler_ckpt = _baselines_from_state(
        state, consumed, species, dataset_info
    )

    out = {
        "architecture_name": "soap_bpnn",
        "scaler": scaler_ckpt,
        "model_ckpt_version": SoapBpnn.__checkpoint_version__,
        "hypers": dict(model.hypers),
        "dataset_info": dataset_info.to_dict(),
        "params": params,
        "torch_source_version": ckpt.get("model_ckpt_version"),
        "composition": composition_ckpt,
        "unmapped_tensors": sorted(
            k
            for k in state
            if k not in consumed
            and not k.startswith("soap_calculator.")
            and "_mts_helper" not in k
            and "_extra_state" not in k
            and "dummy_buffer" not in k
            and "type_to_index" not in k
            and "species_to_species_index" not in k
        ),
    }
    return out


def _baselines_from_state(state, consumed, species, dataset_info):
    """Composition + scaler sub-checkpoints from serialized TensorMap
    buffers (shared by the legacy and alchemical converters)."""
    from ..models.composition import CompositionModel
    from ..models.scaler import Scaler

    n_species = len(species)
    composition_ckpt = None
    comp_key = next(
        (k for k in state if k.endswith("energy_composition_buffer")), None
    )
    if comp_key is not None:
        try:
            from ..data.readers.mts import load_mts_bytes

            buf = np.asarray(state[comp_key], np.uint8).tobytes()
            comp_map = load_mts_bytes(buf)
            weights = np.zeros((n_species, 1))
            block = comp_map.block(0)
            col = np.asarray(block.samples.column("center_type"))
            vals = np.asarray(block.values, np.float64).reshape(len(col), -1)
            for z, v in zip(col, vals):
                if int(z) in species:
                    weights[species.index(int(z))] = v[:1]
            consumed.add(comp_key)
            composition_ckpt = {
                "architecture_name": "composition",
                "model_ckpt_version": (
                    CompositionModel.__checkpoint_version__
                ),
                "hypers": {},
                "dataset_info": dataset_info.to_dict(),
                "weights": {"energy": weights},
            }
        except Exception:
            composition_ckpt = None

    scale = 1.0
    sc_key = next(
        (k for k in state if k.endswith("energy_per_target_scaler_buffer")),
        None,
    )
    if sc_key is not None:
        try:
            from ..data.readers.mts import load_mts_bytes

            buf = np.asarray(state[sc_key], np.uint8).tobytes()
            sc_map = load_mts_bytes(buf)
            scale = float(
                np.ravel(np.asarray(sc_map.block(0).values, np.float64))[0]
            )
            consumed.add(sc_key)
        except Exception:
            scale = 1.0
    scaler_template = Scaler({}, dataset_info)
    scaler_ckpt = {
        "architecture_name": "scaler",
        "model_ckpt_version": Scaler.__checkpoint_version__,
        "hypers": {},
        "dataset_info": dataset_info.to_dict(),
        "scales": {
            name: [np.full(b.shape, scale) for b in blocks]
            for name, blocks in scaler_template.scales.items()
        },
        "per_target": {
            name: np.full((v.shape[0],), scale)
            for name, v in scaler_template.per_target.items()
        },
    }

    if composition_ckpt is None:
        composition_ckpt = {
            "architecture_name": "composition",
            "model_ckpt_version": CompositionModel.__checkpoint_version__,
            "hypers": {},
            "dataset_info": dataset_info.to_dict(),
            "weights": {
                name: np.zeros((n_species, 1))
                for name in dataset_info.targets
            },
        }
    return composition_ckpt, scaler_ckpt
