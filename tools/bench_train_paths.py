"""Compare training-step paths at the paper config on the real chip.

Usage: python tools/bench_train_paths.py [path ...] [--batch N]
  path in {xla, dots, whole, hybrid}; default: xla hybrid

Prints one JSON line per path with step/fwd ms. Timing ends every chain
with a real device->host fetch (axon tunnel: block_until_ready can return
early), and amortizes the fetch RTT over the chain length.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*", default=["xla", "hybrid"])
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()
    paths = args.paths or ["xla", "hybrid"]

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, forward
    from convtasnet_tpu.ops.loss import cal_loss
    from convtasnet_tpu.training.optim import Optimizer
    from convtasnet_tpu.training.solver import make_train_step

    seg_sec, sr = 4.0, 8000
    T = int(seg_sec * sr)
    mix, lens, src = synthetic_batch(
        np.random.default_rng(0), args.batch, 2, T, sr)
    mix, lens, src = jnp.asarray(mix), jnp.asarray(lens), jnp.asarray(src)

    for path in paths:
        kw = dict(remat=False, scan_unroll=4)
        if path == "dots":
            kw = dict(remat="dots", scan_unroll=4)
        elif path == "whole":
            kw["use_pallas"] = "whole"
        elif path == "hybrid":
            kw["use_pallas"] = "hybrid"
        cfg = ConvTasNetConfig(**kw)
        model = ConvTasNet(cfg)
        opt = Optimizer("adam", lr=1e-3)
        params, state = model.init(jax.random.key(0))
        opt_state = opt.init(params)
        if path == "micro":
            # Two INDEPENDENT half-batch chains in one program: probes
            # whether XLA's scheduler overlaps one chain's serial gLN
            # reduction syncs with the other's matmuls (the J=2
            # phase-interleave idea applied at the XLA level). Loss is
            # the row-weighted mean, exactly cal_loss's full-batch value.
            from functools import partial as _partial

            from convtasnet_tpu.training.optim import clip_by_global_norm

            def micro_loss(p, s, m, y, n):
                Bm = m.shape[0]
                bounds = [0, (Bm + 1) // 2, Bm]
                tot = 0.0
                for i in range(2):
                    lo, hi = bounds[i], bounds[i + 1]
                    est, _ = forward(p, s, cfg, m[lo:hi], train=True)
                    l, *_ = cal_loss(y[lo:hi], est, n[lo:hi])
                    tot = tot + l * (hi - lo)
                return tot / Bm

            @_partial(jax.jit, donate_argnums=(0, 1, 2))
            def step(params, opt_state, state, m, y, n):
                loss, grads = jax.value_and_grad(
                    lambda p: micro_loss(p, state, m, y, n))(params)
                grads, gn = clip_by_global_norm(grads, 5.0)
                params, opt_state = opt.update(grads, opt_state, params)
                return params, opt_state, state, loss, gn
        else:
            step = make_train_step(model, opt, max_norm=5.0)

        @jax.jit
        def fwd_loss(p, s, m, y, n):
            est, _ = forward(p, s, cfg, m, train=True)
            loss, *_ = cal_loss(y, est, n)
            return loss

        def time_chain(fn, read, n, *a):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*a)
            read(out)
            return time.perf_counter() - t0

        # --- forward(train=True) alone, FIRST: the step loop below donates
        # params/opt_state/state buffers (fresh loss each call; calls are
        # independent but queue back-to-back on device; final float()
        # drains the queue) ---
        losses = [fwd_loss(params, state, mix, src, lens) for _ in range(2)]
        float(losses[-1])
        t0 = time.perf_counter()
        losses = [fwd_loss(params, state, mix, src, lens)
                  for _ in range(args.steps)]
        float(losses[-1])
        fwd_ms = (time.perf_counter() - t0) / args.steps * 1e3

        # --- full step (donates its inputs; params/state not reused after) ---
        p, o, s = params, opt_state, state
        for _ in range(2):
            p, o, s, loss, _ = step(p, o, s, mix, src, lens)
        float(loss)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            p, o, s, loss, _ = step(p, o, s, mix, src, lens)
        float(loss)
        step_ms = (time.perf_counter() - t0) / args.steps * 1e3

        print(json.dumps({
            "path": path, "batch": args.batch,
            "step_ms": round(step_ms, 3),
            "fwd_ms": round(fwd_ms, 3),
            "audio_sps": round(args.batch * seg_sec / (step_ms / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
