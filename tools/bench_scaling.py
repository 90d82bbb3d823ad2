#!/usr/bin/env python
"""Data-parallel weak-scaling benchmark over a device mesh.

BASELINE.md asks for audio-s/s/chip at 1 chip, 1 host, and >=2 hosts with
>=85% scaling efficiency. On real multi-chip hardware this script measures
it directly (run once per topology). Without a pod it still runs on a
virtual CPU mesh (--force_cpu_devices N) where it validates the sharded
program end-to-end and reports the partitioner/collective overhead trend —
a proxy, since virtual devices share one host's FLOPs, so the per-device
absolute rate is meaningless but a collapse in efficiency still flags a
sharding bug (e.g. accidental all-gathers of activations).

Weak scaling: per-device batch is fixed (default 8); the global batch
grows with the mesh. Prints one JSON line per mesh size plus a summary:

    {"devices": 4, "global_batch": 32, "ms": ..., "audio_sps": ...,
     "audio_sps_per_device": ..., "efficiency_vs_1": ...}

Usage:
    python tools/bench_scaling.py                  # all real devices
    python tools/bench_scaling.py --force_cpu_devices 8
    python tools/bench_scaling.py --tiny           # small config (CI)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO_ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per_device_batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--tiny", action="store_true",
                   help="small model + short segments (CI / CPU mesh)")
    p.add_argument("--max_devices", type=int, default=0,
                   help="cap the largest mesh size benchmarked (0 = all)")
    p.add_argument("--force_cpu_devices", type=int, default=0,
                   help="simulate N CPU devices (must be set before jax "
                        "import; re-execs with XLA_FLAGS when needed)")
    args = p.parse_args(argv)

    if args.force_cpu_devices and "JAX_PLATFORMS" not in os.environ.get(
            "_SCALING_REEXEC", ""):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{args.force_cpu_devices}").strip()
        env["_SCALING_REEXEC"] = "JAX_PLATFORMS"
        os.execve(sys.executable, [sys.executable, __file__] +
                  (argv if argv is not None else sys.argv[1:]), env)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.parallel.mesh import make_sharders
    from convtasnet_tpu.training.optim import Optimizer
    from convtasnet_tpu.training.solver import make_train_step

    on_cpu = jax.default_backend() == "cpu"
    if args.tiny or on_cpu:
        cfg = ConvTasNetConfig(N=64, L=16, B=64, H=128, P=3, X=4, R=2,
                               compute_dtype="float32", use_pallas=False)
        seconds = min(args.seconds, 1.0)
    else:
        cfg = ConvTasNetConfig(remat="block", use_pallas=True)
        seconds = args.seconds
    T = int(seconds * args.sample_rate)

    n_dev = len(jax.devices())
    if args.max_devices:
        n_dev = min(n_dev, args.max_devices)
    # Powers of two up to n_dev, plus n_dev itself (a 64-chip slice must
    # include the full-mesh row the BASELINE metric asks for).
    sizes = [1]
    while sizes[-1] * 2 <= n_dev:
        sizes.append(sizes[-1] * 2)
    if sizes[-1] != n_dev:
        sizes.append(n_dev)
    results = []
    for dp in sizes:
        devices = jax.devices()[:dp]
        model = ConvTasNet(cfg)
        opt = Optimizer("adam", lr=1e-3)
        params, state = model.init(jax.random.key(0))
        opt_state = opt.init(params)
        shard_batch, shard_params = make_sharders(dp=dp, tp=1, devices=devices)
        params, state, opt_state = shard_params(params, state, opt_state)
        step = make_train_step(model, opt, max_norm=5.0)

        gb = args.per_device_batch * dp
        mix, lens, src = synthetic_batch(np.random.default_rng(0), gb, cfg.C,
                                         T, args.sample_rate)
        mix, lens, src = shard_batch(mix, lens, src)
        for _ in range(2):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lens)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lens)
        # A value fetch (not block_until_ready, which can return early on
        # remote backends) guarantees the timed chain actually finished.
        float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        sps = gb * seconds / dt
        row = {
            "devices": dp,
            "global_batch": gb,
            "ms": round(dt * 1e3, 2),
            "audio_sps": round(sps, 1),
            "audio_sps_per_device": round(sps / dp, 1),
        }
        if results:
            row["efficiency_vs_1"] = round(
                (sps / dp) / results[0]["audio_sps_per_device"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "metric": "dp_weak_scaling",
        "backend": jax.default_backend(),
        # Virtual when devices are host-platform CPU devices sharing one
        # machine's cores (forced or ambient) — per-device rates are then
        # not hardware numbers.
        "virtual_mesh": bool(on_cpu),
        "sizes": sizes,
        "efficiency": [r.get("efficiency_vs_1", 1.0) for r in results],
    }
    print(json.dumps(summary), flush=True)
    return results


if __name__ == "__main__":
    main()
