"""Compare inference forward paths at the paper config on the real chip.

Usage: python tools/bench_infer_paths.py [path ...] [--batch N]
  path in {xla, mid, whole, blockwise}; default: xla whole blockwise

whole     = whole-TCN mega-kernel (all R*X blocks in one pallas_call,
            residual stream VMEM-resident — ops/pallas/whole_tcn.py)
blockwise = the per-block whole-block kernel (round-2 path, forced by
            disabling the mega-kernel dispatch)

Prints one JSON line per path. Axon-tunnel discipline: every timed chain
ends with a real device->host fetch, and the rate is the slope between a
short and a long chain so constant RTT cancels.
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
    ap.add_argument("paths", nargs="*", default=["xla", "whole", "blockwise"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    paths = args.paths or ["xla", "whole", "blockwise"]

    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, forward

    seg_sec, sr = 4.0, 8000
    T = int(seg_sec * sr)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((args.batch, T)).astype(np.float32))

    for path in paths:
        up = {"xla": False, "mid": True, "whole": "whole",
              "blockwise": "whole"}[path]
        if path == "blockwise":
            import convtasnet_tpu.ops.pallas.whole_tcn as wt
            wt_orig = wt.tcn_vmem_need
            wt.tcn_vmem_need = lambda *a: 1 << 40  # force per-block fallback
        cfg = ConvTasNetConfig(use_pallas=up)
        model = ConvTasNet(cfg)
        params, state = model.init(jax.random.key(0))

        @jax.jit
        def f(m):
            est, _ = forward(params, state, cfg, m, train=False)
            return est

        out = f(mix)
        np.asarray(out[0, 0, :8])  # real fetch: compile + first run done

        def chain(iters):
            t0 = time.perf_counter()
            o = mix
            last = None
            for _ in range(iters):
                last = f(o)
            np.asarray(last[0, 0, :8])
            return time.perf_counter() - t0

        n1, n2 = 10, 10 + args.steps
        best = None
        for _ in range(3):
            dt = (chain(n2) - chain(n1)) / (n2 - n1)
            if dt > 0 and (best is None or dt < best):
                best = dt
        print(json.dumps({
            "path": path, "batch": args.batch,
            "fwd_ms": round(best * 1e3, 3),
            "audio_sps": round(args.batch * seg_sec / best, 1),
        }), flush=True)
        if path == "blockwise":
            wt.tcn_vmem_need = wt_orig


if __name__ == "__main__":
    main()
