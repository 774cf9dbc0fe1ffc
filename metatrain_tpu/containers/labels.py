"""Labeled integer metadata axes (the ``Labels`` of metatensor, re-imagined).

The reference framework uses the Rust ``metatensor`` Labels everywhere
(see reference ``src/metatrain/utils/data/dataset.py`` and friends). Here a
``Labels`` object is a thin, JAX-friendly container: a static tuple of axis
names plus an integer value array. The value array may be a host ``numpy``
array (metadata known at trace time: keys, components, properties) or a
traced ``jax.Array`` (per-batch sample indices inside ``jit``).

``Labels`` is registered as a JAX pytree so that sample labels flow through
``jit`` without recompilation when only their *values* change.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import numpy as np


Array = Union[np.ndarray, jax.Array]


class Labels:
    """Named integer label axes.

    :param names: one name per column of ``values``.
    :param values: integer array of shape ``(n_entries, len(names))``.
    """

    __slots__ = ("names", "values")

    def __init__(self, names: Sequence[str], values: Array):
        names = tuple(str(n) for n in names)
        if isinstance(values, np.ndarray):
            values = np.ascontiguousarray(values, dtype=np.int32)
        if values.ndim != 2:
            raise ValueError(
                f"Labels values must be 2D, got shape {tuple(values.shape)}"
            )
        if values.shape[1] != len(names):
            raise ValueError(
                f"Labels values have {values.shape[1]} columns "
                f"but {len(names)} names were given"
            )
        self.names = names
        self.values = values

    # -- constructors ----------------------------------------------------

    @staticmethod
    def range(name: str, n: int) -> "Labels":
        return Labels([name], np.arange(n, dtype=np.int32).reshape(-1, 1))

    @staticmethod
    def single() -> "Labels":
        """The 1-entry placeholder label (metatensor's ``Labels.single()``)."""
        return Labels(["_"], np.zeros((1, 1), dtype=np.int32))

    @staticmethod
    def empty(names: Sequence[str]) -> "Labels":
        return Labels(names, np.zeros((0, len(tuple(names))), dtype=np.int32))

    # -- basic protocol ---------------------------------------------------

    def __len__(self) -> int:
        return int(self.values.shape[0])

    def __repr__(self) -> str:
        return f"Labels(names={self.names}, n={self.values.shape[0]})"

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Labels):
            return NotImplemented
        if self.names != other.names:
            return False
        a, b = self.values, other.values
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            return a.shape == b.shape and bool(np.array_equal(a, b))
        # traced/device values: only structural comparison is meaningful
        return a is b or (a.shape == b.shape)

    def __hash__(self) -> int:
        # Hashable only for host (numpy) values -- which is the case whenever
        # Labels are used as static metadata (keys / components / properties).
        if isinstance(self.values, np.ndarray):
            return hash((self.names, self.values.shape, self.values.tobytes()))
        return hash((self.names, tuple(self.values.shape)))

    # -- queries -----------------------------------------------------------

    def column(self, name: str) -> Array:
        return self.values[:, self.names.index(name)]

    def position(self, entry: Sequence[int]) -> int:
        """Index of ``entry`` in these labels, or -1 (host values only)."""
        values = np.asarray(self.values)
        matches = np.nonzero((values == np.asarray(entry, dtype=values.dtype)).all(1))[0]
        return int(matches[0]) if matches.size else -1

    def to_numpy(self) -> "Labels":
        if isinstance(self.values, np.ndarray):
            return self
        return Labels(self.names, np.asarray(jax.device_get(self.values)))

    def as_tuples(self) -> Tuple[Tuple[int, ...], ...]:
        values = np.asarray(self.to_numpy().values)
        return tuple(tuple(int(x) for x in row) for row in values)


def _labels_flatten(labels: Labels):
    return (labels.values,), labels.names


def _labels_unflatten(names, children):
    obj = object.__new__(Labels)
    obj.names = names
    obj.values = children[0]
    return obj


jax.tree_util.register_pytree_node(Labels, _labels_flatten, _labels_unflatten)
