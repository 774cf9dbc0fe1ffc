"""torch-metatrain -> JAX PET checkpoint converter.

A reference PET checkpoint (model version 16,
``/root/reference/src/metatrain/pet/checkpoints.py``) holds a flat torch
``state_dict`` plus hypers and a pickled ``DatasetInfo``. Both
frameworks implement the same documented math (our PET cites the
reference per stage), so conversion is a pure NAME MAPPING plus weight
transposes (torch ``nn.Linear`` stores ``(out, in)``; flax ``Dense``
stores ``(in, out)``).

Loading requires torch but NOT metatensor/metatomic: metatensor objects
inside the pickle (TargetInfo layouts, composition/scaler TensorMaps)
are serialized as ``.mts`` byte buffers, which
``data/readers/mts.py`` parses natively, and torchbind classes are
stubbed by a tolerant unpickler.

Reference state-dict naming: ``pet/model.py`` + ``pet/modules/{backend,
transformer}.py``; our param tree: ``models/pet/modules.py``.
"""

from __future__ import annotations

import gzip
import io
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..containers import TensorMap
from ..data.readers.mts import load_mts_bytes
from ..data.target_info import DatasetInfo, TargetInfo


class _Stub:
    """Placeholder for classes unavailable at unpickling time. Captures
    constructor args and ``__setstate__`` state for later inspection."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        self._state = state

    def __call__(self, *args, **kwargs):  # reduce-style factories
        return _Stub(*args, **kwargs)


def _tolerant_torch_load(data: bytes):
    import torch

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            # torchbind ScriptObjects (metatomic ModelMetadata,
            # metatensor TensorMap, ...) raise inside torch's custom
            # class runtime; their __setstate__ payload is an .mts
            # buffer we can parse ourselves
            if name == "ScriptObject":
                return _Stub
            # ALWAYS stub reference-framework classes, even when the
            # real modules happen to be importable (e.g. a parity test
            # imported the reference tree into sys.modules earlier in
            # the process): the converter reads stub ``_state`` dicts,
            # not live objects
            root = module.split(".")[0]
            if root in ("metatrain", "metatensor", "metatomic"):
                return type(name, (_Stub,), {"__module__": module})
            try:
                return super().find_class(module, name)
            except Exception:
                return type(name, (_Stub,), {"__module__": module})

    class _PickleModule:
        Unpickler = TolerantUnpickler

    return torch.load(
        io.BytesIO(data),
        pickle_module=_PickleModule,
        map_location="cpu",
        weights_only=False,
    )


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch metatrain checkpoint (``.ckpt`` or ``.ckpt.gz``)
    without metatensor/metatomic installed."""
    with open(path, "rb") as fd:
        data = fd.read()
    if data[:2] == b"\x1f\x8b":  # gzip magic
        data = gzip.decompress(data)
    return _tolerant_torch_load(data)


def _stub_state(obj) -> dict:
    state = getattr(obj, "_state", None)
    if not isinstance(state, dict):
        raise ValueError(
            f"cannot interpret pickled object of type {type(obj).__name__}"
        )
    return state


def _tensormap_from_stub(obj) -> TensorMap:
    """A stubbed torchbind metatensor TensorMap: its ``__setstate__``
    payload is ``(uint8 buffer tensor, qualified class name)`` where the
    buffer is the standard .mts serialization."""
    state = getattr(obj, "_state", None)
    if isinstance(state, tuple) and len(state) >= 1:
        buf = state[0]
        if hasattr(buf, "numpy"):
            buf = buf.numpy()
        return load_mts_bytes(np.asarray(buf, dtype=np.uint8).tobytes())
    raise ValueError("stubbed TensorMap has no .mts buffer payload")


def _dataset_info_from_stub(obj) -> DatasetInfo:
    if isinstance(obj, DatasetInfo):  # synthetic checkpoints (tests)
        return obj
    state = _stub_state(obj)
    targets = {}
    for name, ti in state.get("targets", {}).items():
        ti_state = _stub_state(ti)
        layout = _tensormap_from_stub(ti_state["layout"])
        targets[name] = TargetInfo(
            layout,
            quantity=ti_state.get("quantity", ""),
            unit=ti_state.get("unit", ""),
        )
    atomic_types = state.get("_atomic_types") or state.get("atomic_types")
    return DatasetInfo(
        length_unit=state.get("length_unit", "") or "angstrom",
        atomic_types=[int(z) for z in atomic_types],
        targets=targets,
    )


# ---- state-dict name mapping --------------------------------------------------


def _map_backend_key(key: str, fused_layers: bool) -> Optional[Tuple[List[str], str]]:
    """torch state-dict key -> (flax param path under "params", transform).

    transform: "T" = transpose 2D Linear weight, "" = copy.
    Returns None for keys handled elsewhere (buffers, additive models).
    """
    if not key.startswith("backend."):
        return None
    k = key[len("backend."):]

    if k == "species_to_species_index":
        return None
    m = re.fullmatch(r"node_embedders\.(\d+)\.weight", k)
    if m:
        return ["backbone", f"node_embedder_{m[1]}", "embedding"], ""
    if k == "edge_embedder.weight":  # species embedding (not the Linear)
        return ["backbone", "edge_species_embedder", "embedding"], ""
    m = re.fullmatch(r"gnn_layers\.(\d+)\.neighbor_embedder\.weight", k)
    if m:  # non-first layers re-embed neighbor species
        return (
            ["backbone", f"gnn_layer_{m[1]}", "neighbor_embedder", "embedding"],
            "",
        )
    m = re.fullmatch(r"gnn_layers\.(\d+)\.edge_embedder\.(weight|bias)", k)
    if m:
        leaf = "kernel" if m[2] == "weight" else "bias"
        return (
            ["backbone", f"gnn_layer_{m[1]}", "edge_embedder", leaf],
            "T" if leaf == "kernel" else "",
        )
    m = re.fullmatch(r"gnn_layers\.(\d+)\.compress\.([02])\.(weight|bias)", k)
    if m:
        idx = "0" if m[2] == "0" else "1"
        leaf = "kernel" if m[3] == "weight" else "bias"
        return (
            ["backbone", f"gnn_layer_{m[1]}", f"compress_{idx}", leaf],
            "T" if leaf == "kernel" else "",
        )
    m = re.fullmatch(r"combination_norms\.(\d+)\.(weight|bias)", k)
    if m:
        leaf = "scale" if m[2] == "weight" else "bias"
        return ["backbone", f"combination_norm_{m[1]}", leaf], ""
    m = re.fullmatch(r"combination_mlps\.(\d+)\.([02])\.(weight|bias)", k)
    if m:
        idx = "0" if m[2] == "0" else "1"
        leaf = "kernel" if m[3] == "weight" else "bias"
        return (
            ["backbone", f"combination_mlp_{m[1]}_{idx}", leaf],
            "T" if leaf == "kernel" else "",
        )

    # transformer layers
    m = re.fullmatch(r"gnn_layers\.(\d+)\.trans\.layers\.(\d+)\.(.+)", k)
    if m:
        L, i, rest = m[1], m[2], m[3]
        base = ["backbone", f"gnn_layer_{L}", f"layer_{i}"]
        if fused_layers:
            fused_map = {
                "attention.input_linear.weight": ("w_qkv", "T"),
                "attention.input_linear.bias": ("b_qkv", ""),
                "attention.output_linear.weight": ("w_out", "T"),
                "attention.output_linear.bias": ("b_out", ""),
                "norm_attention.weight": ("norm_attn", ""),
                "norm_mlp.weight": ("norm_mlp", ""),
                "mlp.w_in.weight": ("w_in", "T"),
                "mlp.w_in.bias": ("b_in", ""),
                "mlp.w_out.weight": ("w_ffn_out", "T"),
                "mlp.w_out.bias": ("b_ffn_out", ""),
            }
            if rest in fused_map:
                leaf, t = fused_map[rest]
                return base + [leaf], t
            # center (d_node != d_pet) path shares flax module names
        parts = rest.split(".")
        leaf = "kernel" if parts[-1] == "weight" else parts[-1]
        is_norm = "norm" in parts[0]
        if is_norm and parts[-1] == "weight":
            leaf = "scale"
        t = "T" if (leaf == "kernel" and not is_norm) else ""
        return base + parts[:-1] + [leaf], t

    # heads: node_heads.{target}.{h}.{0|2}.{weight,bias}
    m = re.fullmatch(r"(node|edge)_heads\.(.+?)\.(\d+)\.([02])\.(weight|bias)", k)
    if m:
        side, target, h, seq, wb = m.groups()
        idx = "0" if seq == "0" else "1"
        leaf = "kernel" if wb == "weight" else "bias"
        return (
            [f"{side}_head_{target}_{h}", f"linear_{idx}", leaf],
            "T" if leaf == "kernel" else "",
        )
    # last layers: node_last_layers.{target}.{h}.{block_key}.{weight,bias}
    m = re.fullmatch(
        r"(node|edge)_last_layers\.(.+?)\.(\d+)\.(.+?)\.(weight|bias)", k
    )
    if m:
        side, target, h, block_key, wb = m.groups()
        # block key "energy___0" -> block index 0
        b = block_key.rsplit("___", 1)[-1] if "___" in block_key else "0"
        leaf = "kernel" if wb == "weight" else "bias"
        return (
            [f"{side}_last_{target}_{h}_{b}", leaf],
            "T" if leaf == "kernel" else "",
        )
    raise ValueError(f"unmapped PET state-dict key: {key}")


_SKIPPED_PREFIXES = ("additive_models.", "scaler.")
_SKIPPED_KEYS = ("backend.species_to_species_index", "finetune_config")


def _convert_composition(state_dict, dataset_info: DatasetInfo) -> Dict[str, Any]:
    """Reference composition weights live in per-target ``.mts`` buffers
    (``additive_models.0.{target}_composition_buffer``); rows are keyed
    by ``center_type`` samples."""
    from ..models.composition import CompositionModel

    weights: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        m = re.fullmatch(r"additive_models\.0\.(.+)_composition_buffer", key)
        if not m:
            continue
        name = m[1]
        if name not in dataset_info.targets:
            continue
        tmap = load_mts_bytes(np.asarray(value.numpy(), np.uint8).tobytes())
        block = tmap.block(0)
        types = np.asarray(block.samples.column("center_type"))
        values = np.asarray(block.values, np.float64).reshape(len(types), -1)
        w = np.zeros((len(dataset_info.atomic_types), values.shape[1]))
        order = {int(z): i for i, z in enumerate(dataset_info.atomic_types)}
        for row, z in enumerate(types):
            w[order[int(z)]] = values[row]
        weights[name] = w
    return {
        "architecture_name": "composition",
        "model_ckpt_version": CompositionModel.__checkpoint_version__,
        "hypers": {},
        "dataset_info": dataset_info.to_dict(),
        "weights": weights,
    }


def _convert_scaler(state_dict, dataset_info: DatasetInfo) -> Dict[str, Any]:
    """Reference full scales live in ``scaler.{target}_scaler_buffer``
    (per-block values keyed by ``atomic_type`` samples); the per-target
    decomposition in ``{target}_per_target_scaler_buffer``."""
    from ..models.scaler import Scaler

    template = Scaler({}, dataset_info)
    scales: Dict[str, List[np.ndarray]] = {}
    per_target: Dict[str, np.ndarray] = {}
    order = {int(z): i for i, z in enumerate(dataset_info.atomic_types)}

    def rows_of(block, R):
        types = np.asarray(block.samples.column("atomic_type"))
        values = np.asarray(block.values, np.float64).reshape(len(types), -1)
        if R == 1:
            return values[:1]
        out = np.ones((R, values.shape[1]))
        for row, z in enumerate(types):
            if int(z) in order:
                out[order[int(z)]] = values[row]
        return out

    for name, tpl_blocks in template.scales.items():
        key = f"scaler.{name}_scaler_buffer"
        if key not in state_dict:
            continue
        tmap = load_mts_bytes(
            np.asarray(state_dict[key].numpy(), np.uint8).tobytes()
        )
        R = template.per_target[name].shape[0]
        blocks = []
        for b, tpl in enumerate(tpl_blocks):
            block = tmap.block(b) if b < len(tmap) else tmap.block(0)
            vals = rows_of(block, tpl.shape[0])
            blocks.append(np.broadcast_to(vals, tpl.shape).copy())
        scales[name] = blocks
        pt_key = f"scaler.{name}_per_target_scaler_buffer"
        if pt_key in state_dict:
            pt = load_mts_bytes(
                np.asarray(state_dict[pt_key].numpy(), np.uint8).tobytes()
            )
            per_target[name] = rows_of(pt.block(0), R).reshape(-1)[:R].copy()
        else:
            per_target[name] = np.full(
                (R,),
                float(np.sqrt(np.mean(np.square(blocks[0])))) or 1.0,
            )
    return {
        "architecture_name": "scaler",
        "model_ckpt_version": Scaler.__checkpoint_version__,
        "hypers": {},
        "dataset_info": dataset_info.to_dict(),
        "scales": scales,
        "per_target": per_target,
    }


def convert_torch_checkpoint(
    path_or_ckpt, use_best: bool = True
) -> Dict[str, Any]:
    """Convert a torch metatrain PET checkpoint into this framework's
    native checkpoint dict (loadable via ``model_from_checkpoint``).

    :param path_or_ckpt: path to a ``.ckpt``/``.ckpt.gz`` file, or an
        already-loaded checkpoint dict.
    :param use_best: take ``best_model_state_dict`` when present
        (reference export context behavior).
    """
    import jax
    import jax.numpy as jnp

    from ..models.pet import PET
    from ..models.pet.model import DEFAULT_MODEL_HYPERS

    ckpt = (
        path_or_ckpt
        if isinstance(path_or_ckpt, dict)
        else load_torch_checkpoint(path_or_ckpt)
    )
    arch = ckpt.get("architecture_name")
    if arch == "soap_bpnn":
        from .soap_bpnn_import import convert_soap_bpnn_checkpoint

        return convert_soap_bpnn_checkpoint(ckpt, use_best=use_best)
    if arch == "experimental.mace":
        from .mace_foundation import convert_mace_metatrain_checkpoint

        return convert_mace_metatrain_checkpoint(ckpt, use_best=use_best)
    if arch != "pet":
        raise ValueError(
            f"torch checkpoint conversion supports the PET, SOAP-BPNN "
            f"and experimental.mace architectures (got {arch!r})"
        )
    version = ckpt.get("model_ckpt_version")
    if version != 16:
        raise ValueError(
            f"unsupported torch PET checkpoint version {version}; upgrade "
            "it with the torch metatrain first (mtt export handles "
            "stepwise migration to v16), then convert"
        )

    torch_hypers = dict(ckpt["model_data"]["model_hypers"])
    dataset_info = _dataset_info_from_stub(ckpt["model_data"]["dataset_info"])

    # keep only hypers our PET knows; ours defaults the TPU-only knobs
    ours = dict(DEFAULT_MODEL_HYPERS)
    hypers = {k: v for k, v in torch_hypers.items() if k in ours}

    model = PET(hypers, dataset_info)
    params = model.init_params(jax.random.PRNGKey(0))

    state_dict = (
        ckpt.get("best_model_state_dict") or ckpt["model_state_dict"]
    ) if use_best else ckpt["model_state_dict"]

    # species index order must agree (both: position in sorted atomic_types)
    lookup = state_dict.get("backend.species_to_species_index")
    if lookup is not None:
        lk = np.asarray(lookup.numpy())
        for i, z in enumerate(sorted(dataset_info.atomic_types)):
            if lk[z] != i:
                raise ValueError(
                    "torch checkpoint species order differs from sorted "
                    "atomic_types; cannot map embeddings"
                )

    fused = bool(
        model.hypers.get("fused_layers", True)
        and model.hypers.get("normalization", "RMSNorm") == "RMSNorm"
        and model.hypers.get("activation", "SwiGLU") == "SwiGLU"
        and model.hypers.get("transformer_type", "PreLN") == "PreLN"
    )

    flat_with_path, treedef = jax.tree_util.tree_flatten_with_path(params)
    order = []  # flax path tuples in tree order
    shapes = {}
    for path, leaf in flat_with_path:
        key = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        order.append(key)
        shapes[key] = tuple(leaf.shape)

    new_leaves: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, value in state_dict.items():
        if key in _SKIPPED_KEYS or key.startswith(_SKIPPED_PREFIXES):
            continue
        if not hasattr(value, "numpy"):
            continue
        mapped = _map_backend_key(key, fused)
        if mapped is None:
            continue
        parts, transform = mapped
        full = ("params",) + tuple(parts)
        if full not in shapes:
            raise ValueError(
                f"torch key {key!r} maps to {'/'.join(full)} which does "
                "not exist in the flax param tree"
            )
        arr = np.asarray(value.detach().numpy(), dtype=np.float32)
        if transform == "T":
            arr = arr.T
        if arr.shape != shapes[full]:
            raise ValueError(
                f"shape mismatch for {key!r} -> {'/'.join(full)}: "
                f"{arr.shape} vs {shapes[full]}"
            )
        new_leaves[full] = arr

    missing = set(shapes) - set(new_leaves)
    if missing:
        raise ValueError(
            "flax params not covered by the torch checkpoint: "
            + ", ".join("/".join(m) for m in sorted(missing))
        )

    converted = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(new_leaves[key]) for key in order]
    )

    return {
        "architecture_name": "pet",
        "model_ckpt_version": PET.__checkpoint_version__,
        "hypers": dict(model.hypers),
        "dataset_info": dataset_info.to_dict(),
        "params": converted,
        "composition": _convert_composition(state_dict, dataset_info),
        "scaler": _convert_scaler(state_dict, dataset_info),
    }
