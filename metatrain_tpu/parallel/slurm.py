"""SLURM multi-host bootstrap for jax.distributed.

Counterpart of the reference ``utils/distributed/slurm.py``: detect a
multi-task SLURM allocation, derive coordinator address / process count /
process id from the SLURM environment, and initialize ``jax.distributed``
(which rides ICI/DCN directly -- no NCCL layer to manage).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Optional


logger = logging.getLogger("metatrain_tpu.parallel")


def is_slurm_job() -> bool:
    return "SLURM_JOB_ID" in os.environ


def slurm_world() -> Optional[dict]:
    """Process-group description from the environment, or None.

    Mirrors reference ``slurm.py:10-79``: world size from
    ``SLURM_NTASKS``, rank from ``SLURM_PROCID``, coordinator from the
    first host of ``SLURM_JOB_NODELIST``. For non-SLURM launchers the
    ``MTT_NUM_PROCESSES`` / ``MTT_PROCESS_ID`` /
    ``MTT_COORDINATOR_ADDRESS`` variables override (and suffice on
    their own).
    """
    ntasks = int(
        os.environ.get(
            "MTT_NUM_PROCESSES", os.environ.get("SLURM_NTASKS", "1")
        )
    )
    if ntasks <= 1:
        return None
    coordinator = os.environ.get("MTT_COORDINATOR_ADDRESS")
    if coordinator is None:
        coordinator = expand_first_host(
            os.environ.get("SLURM_JOB_NODELIST", "localhost")
        )
    return {
        "num_processes": ntasks,
        "process_id": int(
            os.environ.get(
                "MTT_PROCESS_ID", os.environ.get("SLURM_PROCID", "0")
            )
        ),
        "local_rank": int(os.environ.get("SLURM_LOCALID", "0")),
        "coordinator": coordinator,
    }


def expand_first_host(nodelist: str) -> str:
    """First hostname from a SLURM nodelist expression.

    Handles plain lists (``node1,node2``) and bracketed ranges
    (``node[001-004,007]``, ``prefix[1,3-5]suffix``) without the
    python-hostlist dependency the reference uses.
    """
    nodelist = nodelist.strip()
    match = re.match(r"^([^,\[]*)\[([^\]]+)\](.*)$", nodelist)
    if match:
        prefix, body, suffix = match.groups()
        first = body.split(",")[0]
        if "-" in first:
            first = first.split("-")[0]
        suffix = suffix.split(",")[0]
        return f"{prefix}{first}{suffix}"
    return nodelist.split(",")[0]


def initialize_distributed(port: int = 39591) -> dict:
    """Initialize jax.distributed from the SLURM environment.

    Returns a dict with process_id / num_processes (single-process
    defaults when not under a multi-task SLURM job).
    """
    import jax

    world = slurm_world()
    if world is None:
        return {"num_processes": 1, "process_id": 0, "local_rank": 0}
    coordinator = world["coordinator"]
    if ":" not in coordinator:
        coordinator = f"{coordinator}:{port}"
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=world["num_processes"],
        process_id=world["process_id"],
    )
    logger.info(
        "initialized jax.distributed: process %d / %d (coordinator %s)",
        world["process_id"],
        world["num_processes"],
        world["coordinator"],
    )
    return world


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
