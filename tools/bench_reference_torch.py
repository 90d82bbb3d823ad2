"""Measure the reference PyTorch Conv-TasNet train step on THIS host's CPU.

Round-2 verdict: bench.py's `vs_baseline` divided by an unmeasured
22 audio-s/s folklore estimate of the reference on era-typical GPU
hardware. This tool replaces the folklore with a measurement: it RUNS the
actual reference implementation (/root/reference/src — executed, not
copied) at the paper config on the local CPU — the only hardware both
stacks can run on here — and, for a like-for-like framework comparison,
our JAX train step on the SAME CPU.

Writes BASELINE_TORCH.json at the repo root; bench.py folds it into its
output so the headline JSON carries only measured denominators (the
GPU-era estimate stays available as `vs_gpu_era_estimate`, clearly
labeled). Rerun this script to regenerate the numbers on a new host.

Usage: python tools/bench_reference_torch.py [--batch 5] [--steps 3]
"""

import argparse
import json
import os
import platform
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAPER = dict(N=256, L=20, B=256, H=512, P=3, X=8, R=4, C=2)
SEG_SEC, SR = 4.0, 8000


def bench_reference_torch(batch: int, steps: int) -> dict:
    """One reference train step (fwd + uPIT loss + bwd + clip + Adam),
    solver.py:172-186 semantics, on CPU."""
    sys.path.insert(0, "/root/reference/src")
    import torch

    if not torch.cuda.is_available():
        # The reference's overlap_and_add hard-codes .cuda()
        # (utils.py:40); make it a no-op so the CPU-only build can run.
        torch.Tensor.cuda = lambda self, *a, **k: self
    from conv_tasnet import ConvTasNet as RefConvTasNet  # noqa: E402
    from pit_criterion import cal_loss as ref_cal_loss  # noqa: E402

    torch.manual_seed(0)
    T = int(SEG_SEC * SR)
    model = RefConvTasNet(PAPER["N"], PAPER["L"], PAPER["B"], PAPER["H"],
                          PAPER["P"], PAPER["X"], PAPER["R"], PAPER["C"],
                          norm_type="gLN", causal=False,
                          mask_nonlinear="relu")
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    src = torch.randn(batch, PAPER["C"], T)
    mix = src.sum(1)
    lens = torch.full((batch,), T, dtype=torch.int32)

    def step():
        est = model(mix)
        loss, *_ = ref_cal_loss(src, est, lens)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()
        return float(loss)

    step()  # warm caches / lazy allocs
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return {"step_s": round(dt, 3),
            "audio_sps": round(batch * SEG_SEC / dt, 2)}


def bench_ours_jax_cpu(batch: int, steps: int) -> dict:
    """Our jitted train step, same config/semantics, same CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.optim import Optimizer
    from convtasnet_tpu.training.solver import make_train_step

    T = int(SEG_SEC * SR)
    cfg = ConvTasNetConfig(compute_dtype="float32")  # torch CPU is f32
    model = ConvTasNet(cfg)
    opt = Optimizer("adam", lr=1e-3)
    params, state = model.init(jax.random.key(0))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, max_norm=5.0)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((batch, 2, T)).astype(np.float32))
    mix = src.sum(1)
    lens = jnp.full((batch,), T, jnp.int32)

    p, o, s = params, opt_state, state
    p, o, s, loss, _ = step(p, o, s, mix, src, lens)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, s, loss, _ = step(p, o, s, mix, src, lens)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return {"step_s": round(dt, 3),
            "audio_sps": round(batch * SEG_SEC / dt, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    out = {
        "what": "reference PyTorch vs this framework, same host CPU, "
                "paper config, 4 s @ 8 kHz segments, full train step",
        "host": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "batch": args.batch,
        "reference_torch_cpu": bench_reference_torch(args.batch, args.steps),
        "ours_jax_cpu": bench_ours_jax_cpu(args.batch, args.steps),
    }
    out["ours_vs_reference_same_cpu"] = round(
        out["ours_jax_cpu"]["audio_sps"]
        / out["reference_torch_cpu"]["audio_sps"], 3)
    path = os.path.join(REPO, "BASELINE_TORCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
