"""Scaled-up BASELINE config (BASELINE.json configs[4]) measured for real.

Round-5 VERDICT item 1: the fifth BASELINE config — long-receptive-field
TCN X=10, R=6, H=1024 (N=256, L=32, P=3, gLN non-causal) on 16 kHz
long-form audio — had tiny-shape parity coverage only. This tool runs it
on the attached chip:

  train  — one train step per memory/kernel tier (XLA no-remat, XLA
           remat="dots", Pallas "whole" recompute VJP, Pallas "hybrid"
           saved-residual pair), documenting which tiers fit HBM at all
           and their step ms / audio-s/s. The no-remat backward keeps
           ~10 wide [M, K, H] slabs per block x 60 blocks — expected to
           OOM here; the memory tiers are the enabler (docs/results.md
           rounds 2-3 accounting).
  infer  — forward latency at batch 1/2 and the kernel tier the VMEM-fit
           dispatch (models/conv_tasnet._use_fused_whole + tcn_vmem_need)
           actually selects at this H (the round-4 VERDICT's "untested
           branch").

Usage: python tools/bench_scaled_config.py {train|infer} [--batch N]
       [--seg_sec S] [--tiers t1,t2,...]
Prints one JSON line per measurement. Wrap in `timeout` (first compiles
through the axon tunnel run minutes).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import _cache  # noqa: E402

_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SR = 16000


def scaled_cfg(**kw):
    from convtasnet_tpu.config import ConvTasNetConfig

    base = dict(N=256, L=32, B=256, H=1024, P=3, X=10, R=6, C=2,
                norm_type="gLN", causal=False, compute_dtype="bfloat16")
    base.update(kw)
    return ConvTasNetConfig(**base)


TIERS = {
    # The fastest paper-config trainer: no remat, scan unrolled.
    "xla_noremat": dict(remat=False, scan_unroll=6, use_pallas=False),
    # XLA's own memory tier: keep matmul outputs, recompute elementwise.
    "xla_dots": dict(remat="dots", scan_unroll=6, use_pallas=False),
    # Pallas memory tiers (whole-block recompute VJP / saved-residual
    # hybrid) — ~8x / ~6x less activation HBM than no-remat.
    "pallas_whole": dict(remat=False, scan_unroll=1, use_pallas="whole"),
    "pallas_hybrid": dict(remat=False, scan_unroll=1, use_pallas="hybrid"),
}


def bench_train(tier: str, batch: int, seg_sec: float) -> dict:
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.optim import Optimizer
    from convtasnet_tpu.training.solver import make_train_step

    cfg = scaled_cfg(**TIERS[tier])
    T = int(seg_sec * SR)
    out = {"metric": "scaled_config_train", "tier": tier, "batch": batch,
           "seg_sec": seg_sec, "sr": SR,
           "config": "N=256,L=32,B=256,H=1024,P=3,X=10,R=6,gLN,bf16"}
    try:
        model = ConvTasNet(cfg)
        opt = Optimizer("adam", lr=1e-3)
        params, state = model.init(jax.random.key(0))
        opt_state = opt.init(params)
        step = make_train_step(model, opt, max_norm=5.0)
        mix, lens, src = synthetic_batch(
            np.random.default_rng(0), batch, cfg.C, T, SR)
        mix, lens, src = jnp.asarray(mix), jnp.asarray(lens), jnp.asarray(src)
        for _ in range(2):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lens)
        float(loss)
        n_steps = 10
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, state, loss, _ = step(
                params, opt_state, state, mix, src, lens)
        float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        out.update(step_ms=round(dt * 1e3, 2),
                   audio_sps=round(batch * seg_sec / dt, 1),
                   loss=float(loss), ok=True)
    except Exception as e:
        msg = str(e)
        out.update(ok=False,
                   oom="RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                       or "exceeds the limit" in msg,
                   error=msg[:300])
    return out


def bench_infer(batch: int, seg_sec: float) -> dict:
    from bench import _matmul_flops_forward, _report_kernel_tier

    from convtasnet_tpu.models.conv_tasnet import forward as ctn_forward

    cfg = scaled_cfg(use_pallas=jax.default_backend() == "tpu")
    T = int(seg_sec * SR)
    out = {"metric": "scaled_config_infer", "batch": batch,
           "seg_sec": seg_sec, "sr": SR,
           "kernel_tier": _report_kernel_tier(cfg, T)}
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet

    params, state = ConvTasNet(cfg).init(jax.random.key(0))
    infer = jax.jit(
        lambda m: ctn_forward(params, state, cfg, m, train=False)[0])
    m = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((batch, T)).astype(np.float32))
    np.asarray(infer(m)[0, 0, :8])
    n_it = 20
    t0 = time.perf_counter()
    y = None
    for _ in range(n_it):
        y = infer(m)
    np.asarray(y[0, 0, :8])
    dt = (time.perf_counter() - t0) / n_it
    from bench import V5E_PEAK_BF16_FLOPS

    floor_s = _matmul_flops_forward(cfg, batch, T) / V5E_PEAK_BF16_FLOPS
    out.update(latency_ms=round(dt * 1e3, 3),
               audio_sps=round(batch * seg_sec / dt, 1),
               mxu_floor_ms=round(floor_s * 1e3, 3),
               mxu_floor_frac=round(floor_s / dt, 3))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "infer"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seg_sec", type=float, default=8.0)
    ap.add_argument("--tiers", type=str,
                    default="xla_noremat,xla_dots,pallas_whole,pallas_hybrid")
    args = ap.parse_args()
    if args.mode == "train":
        for tier in args.tiers.split(","):
            print(json.dumps(bench_train(tier, args.batch, args.seg_sec)),
                  flush=True)
    else:
        print(json.dumps(bench_infer(args.batch, args.seg_sec)), flush=True)


if __name__ == "__main__":
    main()
