"""Optional Weights & Biases logging (reference ``utils/logging.py:90-140``).

wandb is an optional dependency; everything degrades to a no-op when it
is not installed. Enabled through the top-level ``wandb:`` section of the
options file (project/name/config are forwarded, the expanded options are
uploaded as the run config, mirroring ``cli/train.py:164-211``).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional


logger = logging.getLogger("metatrain_tpu.wandb")


class WandbLogger:
    """Thin wrapper: ``log(metrics, step)`` + ``finish()``."""

    def __init__(self, settings: Optional[Dict[str, Any]], options: Optional[dict] = None):
        self._run = None
        if not settings:
            return
        try:
            import wandb
        except ImportError:
            logger.warning(
                "wandb section present in options but wandb is not "
                "installed; continuing without it"
            )
            return
        init_kwargs = dict(settings)
        self._run = wandb.init(config=options, **init_kwargs)

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
            self._run = None
