"""Measure BSS-Eval SDRi throughput: host numpy vs device (TPU) batched.

Usage: python tools/bench_sdr.py [--utts 40] [--batch 8] [--sec 4.0]

The host path is ops/metrics.py (f64 numpy, one utterance at a time, as
the evaluate CLI used through round 3 — ~1.1 s/utt measured). The device
path is ops/metrics_device.py (one jitted batched program). Prints one
JSON line with utt/s for both and the speedup — the VERDICT round-3
item-3 acceptance measurement.
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
    ap.add_argument("--utts", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sec", type=float, default=4.0)
    ap.add_argument("--sr", type=int, default=8000)
    ap.add_argument("--host_utts", type=int, default=8,
                    help="host utterances to time (slow; extrapolated)")
    args = ap.parse_args()

    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.ops.metrics import sdr_improvement
    from convtasnet_tpu.ops.metrics_device import sdr_improvement_batch

    T = int(args.sec * args.sr)
    rng = np.random.default_rng(0)
    mix, lens, src = synthetic_batch(rng, args.utts, 2, T, args.sr)
    est = (src + 0.1 * rng.standard_normal(src.shape)).astype(np.float32)

    # Host: per-utterance f64 numpy (the round-3 evaluate path).
    t0 = time.perf_counter()
    host_vals = [sdr_improvement(src[i], est[i], mix[i], filt_len=512)
                 for i in range(args.host_utts)]
    host_s_per_utt = (time.perf_counter() - t0) / args.host_utts

    # Device: batched jitted program. Warm up (compile), then time steady
    # state; end every chain with a value fetch (axon tunnel rule).
    mix_d, src_d, est_d = map(jnp.asarray, (mix, src, est))
    lens_d = jnp.asarray(lens)

    def run():
        out = []
        for lo in range(0, args.utts, args.batch):
            hi = min(lo + args.batch, args.utts)
            out.append(sdr_improvement_batch(
                src_d[lo:hi], est_d[lo:hi], mix_d[lo:hi], lens_d[lo:hi],
                filt_len=512))
        return np.concatenate([np.asarray(o) for o in out])

    dev_vals = run()  # compile + warm
    t0 = time.perf_counter()
    dev_vals = run()
    dev_s_per_utt = (time.perf_counter() - t0) / args.utts

    err = float(np.max(np.abs(dev_vals[: args.host_utts]
                              - np.array(host_vals))))
    print(json.dumps({
        "metric": "bss_eval_sdri_throughput",
        "backend": jax.default_backend(),
        "utt_sec": args.sec,
        "host_s_per_utt": round(host_s_per_utt, 4),
        "device_s_per_utt": round(dev_s_per_utt, 4),
        "speedup": round(host_s_per_utt / dev_s_per_utt, 2),
        "max_abs_sdri_diff_db": round(err, 5),
        "utts": args.utts, "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
