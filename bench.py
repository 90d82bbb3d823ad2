"""Benchmark: training throughput at the paper config on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N}

Metric: audio-seconds of training data consumed per wall-second for the
full jitted train step (forward + uPIT loss + backward + clip + Adam) at
the paper config (N=256, L=20, B=256, H=512, P=3, X=8, R=4, gLN,
non-causal) on 4-second 8 kHz segments — the BASELINE.md throughput metric.

The reference repo publishes no throughput numbers (SURVEY.md §6). The
baseline constant below is an estimate of the reference PyTorch stack on
its era-typical single GPU (batch_size=3 at ~0.55 s/step measured class of
hardware => ~22 audio-s/s); vs_baseline > 1 means faster than that
estimate.
"""

import json
import sys
import time

import jax

def _cache():
    try:
        import sys as _s, os as _o
        _s.path.insert(0, _o.path.dirname(_o.path.abspath(__file__)))
        from convtasnet_tpu.utils.observability import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass


_cache()
import jax.numpy as jnp
import numpy as np

REFERENCE_AUDIO_SPS_ESTIMATE = 22.0


def main():
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.data.synthetic import synthetic_batch
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet
    from convtasnet_tpu.training.optim import Optimizer
    from convtasnet_tpu.training.solver import make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seg_sec, sr = 4.0, 8000
    T = int(seg_sec * sr)

    # Fastest measured policy on v5e (see docs/results.md sweep): NO remat
    # with the R-repeat scan fully unrolled — unrolling lets XLA schedule
    # across repeats and stop spilling, so the whole backward fits at
    # batch 5 (17.9 ms, ~1118 audio-s/s vs 898 for block-remat batch 8).
    cfg = ConvTasNetConfig(remat=False, scan_unroll=4,
                           use_pallas=jax.default_backend() != "cpu")
    model = ConvTasNet(cfg)
    opt = Optimizer("adam", lr=1e-3)
    params, state = model.init(jax.random.key(0))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, max_norm=5.0)

    mix, lens, src = synthetic_batch(np.random.default_rng(0), batch, cfg.C, T, sr)
    mix, lens, src = jnp.asarray(mix), jnp.asarray(lens), jnp.asarray(src)

    # Warmup / compile.
    for _ in range(2):
        params, opt_state, state, loss, _ = step(params, opt_state, state, mix, src, lens)
    jax.block_until_ready(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, state, loss, _ = step(params, opt_state, state, mix, src, lens)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    audio_sps = n_steps * batch * seg_sec / dt
    print(json.dumps({
        "metric": "train_throughput_paper_config",
        "value": round(audio_sps, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(audio_sps / REFERENCE_AUDIO_SPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
