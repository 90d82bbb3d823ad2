"""True multi-process 'multi-host' validation.

Spawns TWO separate Python processes, each owning 4 virtual CPU devices,
joined by jax.distributed into one 8-device ('data',) mesh — the same
program shape as a 2-host TPU slice (parallel/distributed.py). Each
process feeds only its local half of the global batch
(global_batch_from_local); the jitted train step's gradient all-reduce
crosses the process boundary (gloo). Both ranks must observe identical
global losses.

The reference has no analogue (single-process DataParallel,
train.py:121); this is the framework's >=2-host story exercised for real
rather than on a single-process mesh.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
sys.path.insert(0, sys.argv[4])
import jax
from convtasnet_tpu.parallel import distributed

distributed.initialize(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.data.synthetic import synthetic_batch
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.training.optim import Optimizer
from convtasnet_tpu.training.solver import make_train_step

devices = np.array(jax.devices())
mesh = Mesh(devices, ("data",))
cfg = ConvTasNetConfig(N=16, L=8, B=16, H=32, P=3, X=2, R=2, C=2,
                       compute_dtype="float32")
model = ConvTasNet(cfg)
opt = Optimizer("adam", lr=1e-3)
params, state = model.init(jax.random.key(0))
opt_state = opt.init(params)
params, state, opt_state = jax.device_put(
    (params, state, opt_state), NamedSharding(mesh, P()))

gmix, glens, gsrc = synthetic_batch(np.random.default_rng(0), 8, 2, 1024)
per = 8 // nproc
lo, hi = pid * per, (pid + 1) * per
mix = distributed.global_batch_from_local(mesh, gmix[lo:hi])
lens = distributed.global_batch_from_local(mesh, glens[lo:hi])
src = distributed.global_batch_from_local(mesh, gsrc[lo:hi])

step = make_train_step(model, opt, max_norm=5.0)
losses = []
for _ in range(3):
    params, opt_state, state, loss, _ = step(params, opt_state, state,
                                             mix, src, lens)
    losses.append(round(float(loss), 6))
print("RESULT " + json.dumps({
    "pid": pid, "nproc": jax.process_count(),
    "global_devices": len(devices),
    "local_devices": jax.local_device_count(),
    "coordinator": distributed.is_coordinator(),
    "losses": losses,
}), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_allreduce(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:  # never leak a hung rank (it holds the port)
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    results.sort(key=lambda r: r["pid"])
    for r in results:
        assert r["nproc"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
    assert results[0]["coordinator"] and not results[1]["coordinator"]
    # The gradient all-reduce crossed processes: identical global losses,
    # and the loss falls.
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["losses"][-1] < results[0]["losses"][0]
