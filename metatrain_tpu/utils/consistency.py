"""Runtime consistency checks (the ``--check-consistency`` analogue).

Counterpart of metatomic's exported-model consistency checks enabled via
``mtt eval --check-consistency`` (reference ``cli/eval.py:114-119``,
``utils/evaluate_model.py:280``): validates a device batch's structural
invariants before evaluation.
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from ..containers import SystemBatch


class ConsistencyError(RuntimeError):
    pass


def check_batch_consistency(batch: SystemBatch, cutoff: float) -> None:
    """Raise :class:`ConsistencyError` on malformed batches.

    Checks: finite positions/cells; padded atoms point at a padded system
    slot; neighbor indices in range; real neighbor distances within the
    cutoff (+10% slack for skin reuse); reversed-edge involution.
    """
    get = lambda x: np.asarray(jax.device_get(x))  # noqa: E731
    problems: List[str] = []

    positions = get(batch.positions)
    atom_mask = get(batch.atom_mask)
    system_mask = get(batch.system_mask)
    system_index = get(batch.system_index)
    nbr_idx = get(batch.nbr_indices)
    nbr_mask = get(batch.nbr_mask)
    reverse = get(batch.nbr_reverse)

    if not np.isfinite(positions[atom_mask]).all():
        problems.append("non-finite positions on real atoms")
    if not np.isfinite(get(batch.cells)[system_mask]).all():
        problems.append("non-finite cells on real systems")

    padded_atoms = ~atom_mask
    if padded_atoms.any() and system_mask[system_index[padded_atoms]].any():
        problems.append("padded atoms assigned to a real system slot")
    if atom_mask.any() and not system_mask[system_index[atom_mask]].all():
        problems.append("real atoms assigned to a padded system slot")

    A = batch.n_atoms_padded
    if nbr_idx.min(initial=0) < 0 or nbr_idx.max(initial=0) >= A:
        problems.append("neighbor indices out of range")

    _, distances = batch.edge_vectors()
    distances = get(distances)
    real = nbr_mask & atom_mask[:, None]
    if real.any() and distances[real].max() > 1.1 * cutoff:
        problems.append(
            f"neighbor distance {distances[real].max():.3f} exceeds "
            f"cutoff {cutoff} (+10% skin slack)"
        )

    M = batch.max_neighbors
    flat_rev = reverse.reshape(-1)
    if (flat_rev < 0).any() or (flat_rev >= A * M).any():
        problems.append("reversed-edge indices out of range")
    else:
        double = flat_rev[flat_rev].reshape(A, M)
        own = np.arange(A * M).reshape(A, M)
        if not (double[nbr_mask] == own[nbr_mask]).all():
            problems.append("reversed-edge map is not an involution")

    if problems:
        raise ConsistencyError(
            "batch consistency check failed: " + "; ".join(problems)
        )
