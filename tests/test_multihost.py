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


_WORKER_TP_CP = r'''
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
mode = sys.argv[5]
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

devices = np.array(jax.devices())  # proc0's 4 devices then proc1's 4
cfg = ConvTasNetConfig(N=16, L=8, B=16, H=32, P=3, X=2, R=2, C=2,
                       compute_dtype="float32")
model = ConvTasNet(cfg)
opt = Optimizer("adam", lr=1e-3)
params, state = model.init(jax.random.key(0))
opt_state = opt.init(params)
T = 1024
rng = np.random.default_rng(0)
src = (rng.standard_normal((4, 2, T)) * 0.3).astype(np.float32)
mix, lens = src.sum(1), np.full((4,), T, np.int32)

if mode == "tp":
    # dp=1 x tp=8: the 'model' axis spans BOTH processes, so every
    # temporal block's in_w/out_w Megatron psum (and the sharded gLN
    # stat reduction) crosses the process boundary (gloo standing in
    # for DCN). Params take the TP NamedShardings; device_put shards
    # the identical host copy across non-addressable devices.
    from convtasnet_tpu.parallel.mesh import shard_params_fn
    from convtasnet_tpu.training.solver import make_train_step

    mesh = Mesh(devices.reshape(1, 8), ("data", "model"))
    params, state, opt_state = shard_params_fn(mesh, tp=8)(
        params, state, opt_state)
    rep = NamedSharding(mesh, P())
    mix, src, lens = jax.device_put((mix, src, lens), rep)
    step = make_train_step(model, opt, max_norm=5.0)
elif mode == "cp":
    # cp: 8-way ('context',) ring — the frame-axis halo ppermute and
    # OLA tail ppermute between context ranks 3 and 4 cross the
    # process boundary, as do their backward transposes.
    from convtasnet_tpu.parallel.context import make_cp_train_step

    mesh = Mesh(devices, ("context",))
    rep = NamedSharding(mesh, P())
    params, state, opt_state, mix, src, lens = jax.device_put(
        (params, state, opt_state, mix, src, lens), rep)
    step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0)
elif mode == "dpcp":
    # dp=2 x cp=4 with the CONTEXT axis laid out to span both
    # processes (grid[d, c] = devices[2c + d]): the halo/OLA-tail
    # ppermutes cross the process boundary WHILE the batch is
    # data-sharded — the composition a single-axis test can't witness
    # (VERDICT round-3 item 4). The batch enters sharded over 'data'.
    from convtasnet_tpu.parallel.context import make_cp_train_step

    mesh = Mesh(devices.reshape(4, 2).T, ("data", "context"))
    rep = NamedSharding(mesh, P())
    params, state, opt_state = jax.device_put((params, state, opt_state),
                                              rep)
    row = NamedSharding(mesh, P("data"))
    mix, src, lens = (jax.device_put(mix, row), jax.device_put(src, row),
                      jax.device_put(lens, row))
    step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0,
                              batch_axis="data")
else:
    # dptpcp: the full 3-axis ('data','model','context') mesh at
    # 2 x 2 x 2 with the context axis crossing the process boundary
    # (grid[d, m, c] = devices[4c + 2m + d]); TP rides GSPMD auto axes
    # inside the CP shard_map body, so every block's Megatron psum AND
    # the manual halo ppermutes run against the composed layout, the
    # latter across processes.
    from convtasnet_tpu.parallel.context import make_cp_train_step
    from convtasnet_tpu.parallel.mesh import shard_params_fn

    grid = np.transpose(devices.reshape(2, 2, 2), (2, 1, 0))
    mesh = Mesh(grid, ("data", "model", "context"))
    params, state, opt_state = shard_params_fn(mesh, tp=2)(
        params, state, opt_state)
    row = NamedSharding(mesh, P("data"))
    mix, src, lens = (jax.device_put(mix, row), jax.device_put(src, row),
                      jax.device_put(lens, row))
    step = make_cp_train_step(cfg, opt, mesh, max_norm=5.0,
                              batch_axis="data")

losses = []
for _ in range(3):
    params, opt_state, state, loss, _ = step(params, opt_state, state,
                                             mix, src, lens)
    losses.append(round(float(loss), 6))
print("RESULT " + json.dumps({
    "pid": pid, "mode": mode, "nproc": jax.process_count(),
    "global_devices": len(devices), "losses": losses,
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


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["tp", "cp", "dpcp", "dptpcp"])
def test_two_process_tp_cp(tmp_path, mode):
    """Multi-process validation beyond DP (VERDICT round-2 item 4 and
    round-3 item 4). 'tp' runs dp=1 x tp=8 (every block's Megatron psum
    crosses the process boundary); 'cp' runs an 8-way context ring
    (halo/tail ppermutes cross it); 'dpcp' composes dp=2 x cp=4 with the
    context axis spanning both processes while the batch is data-sharded;
    'dptpcp' runs the full 3-axis 2x2x2 mesh with the context axis
    crossing processes and TP riding GSPMD auto axes inside the CP
    shard_map body. Both ranks must observe identical falling losses."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker_tp_cp.py"
    worker.write_text(_WORKER_TP_CP)
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), repo,
             mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
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
        assert r["nproc"] == 2 and r["global_devices"] == 8
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["losses"][-1] < results[0]["losses"][0]


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """VERDICT #6: multi-host wiring must work FROM THE CLI. Two train-CLI
    processes (4 virtual CPU devices each) join via --coordinator_address
    into one 8-device DP mesh, train 2 epochs on the same synthetic corpus,
    and must report identical falling losses; only rank 0 writes ckpts."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from convtasnet_tpu.data.synthetic import make_wav_dataset

    json_root = make_wav_dataset(str(tmp_path / "data"), n_utts=6, C=2,
                                 sample_rate=8000, min_sec=1.0, max_sec=2.0,
                                 seed=3)
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": repo,
    })
    save = [str(tmp_path / f"exp{i}") for i in range(2)]
    argv = lambda pid: [
        sys.executable, "-m", "convtasnet_tpu.cli.train",
        "--train_dir", os.path.join(json_root, "tr"),
        "--valid_dir", os.path.join(json_root, "cv"),
        "--N", "16", "--L", "8", "--B", "16", "--H", "32", "--P", "3",
        "--X", "2", "--R", "2", "--C", "2",
        "--epochs", "2", "--batch_size", "8", "--segment", "1.0",
        "--compute_dtype", "float32", "--print_freq", "1",
        "--save_folder", save[pid],
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", "2", "--process_id", str(pid),
    ]
    procs = [subprocess.Popen(argv(pid), stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)

    def train_losses(out):
        return [float(l.split("Train Loss")[1].split("|")[0])
                for l in out.splitlines() if "Train Summary" in l]

    l0, l1 = train_losses(outs[0]), train_losses(outs[1])
    assert len(l0) == 2 and l0 == l1, (l0, l1)  # identical global losses
    assert l0[-1] < l0[0]  # and they fall
    # Only the coordinator writes the best-model checkpoint.
    assert os.path.exists(os.path.join(save[0], "final.ckpt"))
    assert not os.path.exists(os.path.join(save[1], "final.ckpt"))


@pytest.mark.slow
def test_two_process_evaluate_separate_cli(tmp_path):
    """Round-4 VERDICT item 6: stages 3/4 must span hosts, not just
    training. Two evaluate-CLI processes join one 8-device DP mesh with
    device-reduced metrics and must report identical averages matching
    the single-process run; two separate-CLI processes stripe the
    utterances over per-rank local meshes and together write every output
    wav exactly once, sample-equal to the single-process outputs."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.data.synthetic import make_wav_dataset
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.checkpoint import save_checkpoint

    json_root = make_wav_dataset(str(tmp_path / "data"), n_utts=4, C=2,
                                 sample_rate=8000, min_sec=0.6, max_sec=0.9,
                                 seed=7)
    cfg = ConvTasNetConfig(N=16, L=8, B=16, H=32, P=3, X=2, R=2, C=2,
                           compute_dtype="float32")
    params, state = ConvTasNet(cfg).init(jax.random.key(0))
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, cfg, jax.device_get(params), jax.device_get(state))

    # Single-process references (in-process; conftest's 8-device CPU env).
    from convtasnet_tpu.cli import evaluate as eval_cli
    from convtasnet_tpu.cli import separate as sep_cli

    # pad_to_multiple collapses every utterance to one compiled shape —
    # without it this test compiles the device BSS-Eval pipeline once per
    # distinct length, which on this 2-core host blows the subprocess
    # timeout.
    ref = eval_cli.evaluate(eval_cli.build_parser().parse_args([
        "--model_path", ckpt, "--data_dir", os.path.join(json_root, "tt"),
        "--cal_sdr", "1", "--sdr_backend", "device", "--batch_size", "2",
        "--pad_to_multiple", "8000",
    ]), log=lambda s: None)
    out_ref = str(tmp_path / "sep_ref")
    n_ref = sep_cli.separate(sep_cli.build_parser().parse_args([
        "--model_path", ckpt,
        "--mix_json", os.path.join(json_root, "tt", "mix.json"),
        "--out_dir", out_ref, "--batch_size", "2",
        "--pad_to_multiple", "8000",
    ]))
    assert n_ref == 4

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": repo,
    })

    def run_pair(module, extra, _retry=True):
        port = _free_port()
        argv = lambda pid: [
            sys.executable, "-m", module,
            "--model_path", ckpt,
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ] + extra
        procs = [subprocess.Popen(argv(pid), stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True,
                                  env=env)
                 for pid in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
            # Gloo's rendezvous has a fixed 30 s key-exchange deadline; on
            # this 2-core host a rank starved by concurrent load can miss
            # it (observed once under soak + full-suite contention). That
            # is infrastructure, not product logic — retry exactly once.
            if (_retry and any(p.returncode != 0 for p in procs)
                    and any("Gloo context initialization failed" in o
                            for o in outs)):
                return run_pair(module, extra, _retry=False)
            for p, out in zip(procs, outs):
                assert p.returncode == 0, out[-3000:]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait(timeout=30)
        return outs

    # --- evaluate: global mesh, device-reduced metrics ---
    outs = run_pair("convtasnet_tpu.cli.evaluate", [
        "--data_dir", os.path.join(json_root, "tt"),
        "--cal_sdr", "1", "--sdr_backend", "device", "--batch_size", "2",
        "--pad_to_multiple", "8000",
    ])

    def avg(out, key):
        lines = [l for l in out.splitlines() if l.startswith(key)]
        assert lines, out[-2000:]
        return float(lines[-1].split(":")[1])

    si = [avg(o, "Average SISNR improvement") for o in outs]
    sd = [avg(o, "Average SDR improvement") for o in outs]
    assert si[0] == si[1] and sd[0] == sd[1]  # replicated device totals
    # Device f32 reduction vs the single-process (device-SDRi) reference.
    np.testing.assert_allclose(si[0], ref["si_snri"], atol=5e-3)
    np.testing.assert_allclose(sd[0], ref["sdri"], atol=5e-2)

    # --- separate: rank-striped batches over per-rank local meshes ---
    out_mh = str(tmp_path / "sep_mh")
    outs = run_pair("convtasnet_tpu.cli.separate", [
        "--mix_json", os.path.join(json_root, "tt", "mix.json"),
        "--out_dir", out_mh, "--batch_size", "2", "--dp", "2",
        "--pad_to_multiple", "8000",
    ])
    ref_files = sorted(os.listdir(out_ref))
    assert sorted(os.listdir(out_mh)) == ref_files  # union covers all, once
    from convtasnet_tpu.data.wavio import read_wav

    for f in ref_files:
        a, _ = read_wav(os.path.join(out_ref, f))
        b, _ = read_wav(os.path.join(out_mh, f))
        np.testing.assert_allclose(a, b, atol=2e-4)  # PCM_16 quantization
