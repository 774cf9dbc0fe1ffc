"""metatrain-tpu: a TPU-native training and evaluation hub for atomistic ML models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
metatensor/metatrain (reference: /root/reference/src/metatrain): training,
evaluation and export of interatomic potentials and generic atomistic
property models, driven by a YAML options file through the ``mtt-tpu`` CLI.

Design pillars (TPU-first, not a port):

- All device data lives in fixed-shape, padded, bucketed arrays so that one
  XLA compilation serves many batches (geometric size bucketing).
- Neighbor data uses the NEF layout ``(n_atoms_pad, max_neighbors, ...)``
  throughout: attention, spherical expansions and segment reductions all map
  onto dense batched MXU work.
- Forces and stresses come from one ``jax.value_and_grad`` with the strain
  trick, not a separate kernel.
- Distribution is a sharded batch axis over a ``jax.sharding.Mesh`` with
  ``psum`` reductions -- no process-group plumbing in model code.
"""

__version__ = "0.1.0"

PACKAGE_NAME = "metatrain_tpu"
