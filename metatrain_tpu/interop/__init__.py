"""Interop with the torch metatrain: checkpoint conversion.

``convert_torch_checkpoint`` turns a torch metatrain PET checkpoint
(``.ckpt`` / ``.ckpt.gz``) into this framework's native checkpoint dict,
loadable with ``model_from_checkpoint`` and servable on TPU.
"""

from .torch_ckpt import convert_torch_checkpoint, load_torch_checkpoint

__all__ = ["convert_torch_checkpoint", "load_torch_checkpoint"]
