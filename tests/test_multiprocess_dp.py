"""True multi-process data parallelism on CPU (Gloo collectives).

The reference validates distributed training with a 2-process gloo test
asserting parity with the serial path
(``composition/tests/test_distributed.py:84-111``). Here: the SAME short
training run executed as (a) one process with 8 virtual devices and (b)
two `jax.distributed` processes with 4 virtual devices each — global
mesh of 8 either way — must produce matching final parameters. This
exercises the full multi-host path: `jax.distributed.initialize`,
cross-process psum/pmean, per-process batch sharding
(`parallel/mesh.py:DataParallelLoader`), and process-0-only IO.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

rank = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
if n_procs > 1:
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=n_procs, process_id=rank
    )
import jax.numpy as jnp

from metatrain_tpu.containers import System
from metatrain_tpu.data.dataset import Dataset
from metatrain_tpu.data.readers import read_targets
from metatrain_tpu.data.target_info import DatasetInfo
from metatrain_tpu.models.soap_bpnn import SoapBpnn, SoapBpnnTrainer

assert jax.device_count() == 8, jax.device_count()

systems = []
rng = np.random.default_rng(0)
for i in range(48):
    r = np.random.default_rng(100 + i)
    s = System(
        positions=r.uniform(-2.5, 2.5, size=(5, 3)),
        types=r.choice([1, 6, 8], size=5),
        cell=np.zeros((3, 3)),
        pbc=np.zeros(3, dtype=bool),
    )
    s.extra["energy"] = np.asarray(rng.normal())
    systems.append(s)
targets, infos = read_targets(
    systems, {"energy": {"quantity": "energy", "key": "energy", "unit": "eV"}}
)
types = sorted({int(t) for s in systems for t in s.types})
dataset = Dataset(systems, targets)
ds_info = DatasetInfo("angstrom", types, infos)

model = SoapBpnn(
    {
        "soap": {"max_angular": 1, "max_radial": 1, "cutoff": {"radius": 4.0}},
        "bpnn": {"num_hidden_layers": 1, "num_neurons_per_layer": 8},
    },
    ds_info,
)
trainer = SoapBpnnTrainer(
    {
        "num_epochs": 2,
        "batch_size": 3,
        "learning_rate": 5e-3,
        "data_parallel": True,
        "o3_augmentation": False,
    }
)
import tempfile
with tempfile.TemporaryDirectory() as ckpt_dir:
    trainer.train(model, jnp.float32, [dataset], [dataset], ckpt_dir)

if jax.process_index() == 0:
    leaves = jax.tree_util.tree_leaves(model.params)
    np.savez(out_path, *[np.asarray(x) for x in leaves])
    print("WORKER_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(worker, args, n_local_devices, extra_env=None):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local_devices}"
    )
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, worker] + [str(a) for a in args],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_dp_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    # (a) single process, 8 devices
    out_a = tmp_path / "params_1proc.npz"
    proc = _run(worker, [0, 1, 0, out_a], 8)
    out, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0 and "WORKER_OK" in out, out[-3000:]

    # (b) two processes x 4 devices, gloo collectives
    port = _free_port()
    out_b = tmp_path / "params_2proc.npz"
    p0 = _run(worker, [0, 2, port, out_b], 4)
    p1 = _run(worker, [1, 2, port, tmp_path / "unused.npz"], 4)
    out0, _ = p0.communicate(timeout=1200)
    out1, _ = p1.communicate(timeout=1200)
    assert p0.returncode == 0 and "WORKER_OK" in out0, out0[-3000:]
    assert p1.returncode == 0, out1[-3000:]

    a = np.load(out_a)
    b = np.load(out_b)
    assert len(a.files) == len(b.files) and len(a.files) > 0
    for key in a.files:
        np.testing.assert_allclose(
            a[key], b[key], rtol=1e-5, atol=1e-6, err_msg=key
        )
