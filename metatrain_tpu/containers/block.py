"""Block-sparse labeled tensors as JAX pytrees.

TPU-native counterpart of metatensor's ``TensorMap``/``TensorBlock``
(reference: the Rust metatensor core used throughout
``/root/reference/src/metatrain``). Blocks hold dense device arrays; all
label metadata except the per-sample indices is static pytree aux data, so
a TensorMap with the same *structure* but different values hits the same
XLA compilation.

Differences from metatensor, by design:

- blocks may carry a boolean ``mask`` marking which (padded) sample rows are
  real. Every consumer (losses, metrics, reductions) honors it, which is what
  makes fixed-shape bucketed batches possible on TPU.
- gradient blocks are plain ``TensorBlock`` values in a dict keyed by
  parameter name (``"positions"``, ``"strain"``), with their own samples
  and masks.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .labels import Array, Labels


class TensorBlock:
    """One dense block: values + sample/component/property labels.

    ``values`` has shape ``(n_samples, *component_sizes, n_properties)``.

    :param values: dense data array.
    :param samples: labels for the first axis (may be traced inside jit).
    :param components: labels for each intermediate axis (static metadata).
    :param properties: labels for the last axis (static metadata).
    :param mask: optional boolean validity mask over samples (padding rows
        are False). ``None`` means all rows are real.
    """

    __slots__ = ("values", "samples", "components", "properties", "mask", "_gradients")

    def __init__(
        self,
        values: Array,
        samples: Labels,
        components: Sequence[Labels],
        properties: Labels,
        mask: Optional[Array] = None,
    ):
        self.values = values
        self.samples = samples
        self.components = tuple(c.to_numpy() if isinstance(c.values, np.ndarray) else c for c in components)
        self.properties = properties
        self.mask = mask
        self._gradients: Dict[str, TensorBlock] = {}

    # -- gradients ---------------------------------------------------------

    def add_gradient(self, parameter: str, gradient: "TensorBlock") -> None:
        self._gradients[parameter] = gradient

    def gradient(self, parameter: str) -> "TensorBlock":
        return self._gradients[parameter]

    def has_gradient(self, parameter: str) -> bool:
        return parameter in self._gradients

    def gradients(self) -> Iterator[Tuple[str, "TensorBlock"]]:
        return iter(sorted(self._gradients.items()))

    def gradients_list(self) -> List[str]:
        return sorted(self._gradients.keys())

    # -- info ----------------------------------------------------------------

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.values.shape)

    @property
    def dtype(self):
        return self.values.dtype

    def __repr__(self) -> str:
        grads = f", gradients={self.gradients_list()}" if self._gradients else ""
        return (
            f"TensorBlock(shape={self.shape}, samples={self.samples.names}, "
            f"properties={len(self.properties)}{grads})"
        )

    def copy(self) -> "TensorBlock":
        new = TensorBlock(
            self.values, self.samples, self.components, self.properties, self.mask
        )
        for name, grad in self._gradients.items():
            new.add_gradient(name, grad.copy())
        return new

    def map_values(self, fn: Callable[[Array], Array]) -> "TensorBlock":
        """New block with ``fn`` applied to values (and gradient values)."""
        new = TensorBlock(
            fn(self.values), self.samples, self.components, self.properties, self.mask
        )
        for name, grad in self._gradients.items():
            new.add_gradient(name, grad.map_values(fn))
        return new


def _block_flatten(block: TensorBlock):
    grad_names = tuple(sorted(block._gradients.keys()))
    children = (
        block.values,
        block.samples,
        block.mask,
        tuple(block._gradients[name] for name in grad_names),
    )
    aux = (block.components, block.properties, grad_names)
    return children, aux


def _block_unflatten(aux, children):
    components, properties, grad_names = aux
    values, samples, mask, grads = children
    obj = object.__new__(TensorBlock)
    obj.values = values
    obj.samples = samples
    obj.components = components
    obj.properties = properties
    obj.mask = mask
    obj._gradients = dict(zip(grad_names, grads))
    return obj


jax.tree_util.register_pytree_node(TensorBlock, _block_flatten, _block_unflatten)


class TensorMap:
    """A set of blocks keyed by symmetry/typing labels.

    :param keys: labels with one entry per block (static host metadata).
    :param blocks: one block per key entry.
    """

    __slots__ = ("keys", "_blocks")

    def __init__(self, keys: Labels, blocks: Sequence[TensorBlock]):
        keys = keys.to_numpy()
        if len(keys) != len(blocks):
            raise ValueError(
                f"TensorMap got {len(keys)} keys but {len(blocks)} blocks"
            )
        self.keys = keys
        self._blocks = list(blocks)

    # -- access ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self._blocks)

    def __iter__(self) -> Iterator[TensorBlock]:
        return iter(self._blocks)

    def items(self) -> Iterator[Tuple[Tuple[int, ...], TensorBlock]]:
        return iter(zip(self.keys.as_tuples(), self._blocks))

    def blocks(self) -> List[TensorBlock]:
        return list(self._blocks)

    def block(
        self, key: Union[int, Sequence[int], None] = None, **selection: int
    ) -> TensorBlock:
        if key is None and not selection:
            if len(self._blocks) != 1:
                raise ValueError("TensorMap has multiple blocks, pass a key")
            return self._blocks[0]
        if selection:
            idx = self._key_position_by_names(selection)
        elif isinstance(key, int) and len(self.keys.names) != 1:
            idx = key
        else:
            key_seq = [key] if isinstance(key, int) else list(key)  # type: ignore[arg-type]
            idx = self.keys.position(key_seq)
        if idx < 0 or idx >= len(self._blocks):
            raise KeyError(f"no block for key {key}{selection or ''}")
        return self._blocks[idx]

    def _key_position_by_names(self, selection: Dict[str, int]) -> int:
        values = np.asarray(self.keys.values)
        match = np.ones(len(values), dtype=bool)
        for name, value in selection.items():
            match &= values[:, self.keys.names.index(name)] == value
        positions = np.nonzero(match)[0]
        if len(positions) != 1:
            raise KeyError(f"selection {selection} matched {len(positions)} blocks")
        return int(positions[0])

    def has_key(self, key: Sequence[int]) -> bool:
        return self.keys.position(list(key)) >= 0

    def __repr__(self) -> str:
        return f"TensorMap(keys={self.keys.names}, n_blocks={len(self._blocks)})"

    # -- transforms ---------------------------------------------------------

    def map_blocks(self, fn: Callable[[TensorBlock], TensorBlock]) -> "TensorMap":
        return TensorMap(self.keys, [fn(b) for b in self._blocks])

    def map_values(self, fn: Callable[[Array], Array]) -> "TensorMap":
        return TensorMap(self.keys, [b.map_values(fn) for b in self._blocks])

    def astype(self, dtype) -> "TensorMap":
        return self.map_values(lambda v: jnp.asarray(v, dtype=dtype))

    def to_host(self) -> "TensorMap":
        """Materialize every array on host as numpy."""
        def to_np(x):
            return np.asarray(jax.device_get(x)) if x is not None else None

        def convert(block: TensorBlock) -> TensorBlock:
            new = TensorBlock(
                to_np(block.values),
                block.samples.to_numpy(),
                block.components,
                block.properties,
                to_np(block.mask),
            )
            for name, grad in block._gradients.items():
                new.add_gradient(name, convert(grad))
            return new

        return self.map_blocks(convert)


def _map_flatten(tmap: TensorMap):
    return (tuple(tmap._blocks),), tmap.keys


def _map_unflatten(keys, children):
    obj = object.__new__(TensorMap)
    obj.keys = keys
    obj._blocks = list(children[0])
    return obj


jax.tree_util.register_pytree_node(TensorMap, _map_flatten, _map_unflatten)
