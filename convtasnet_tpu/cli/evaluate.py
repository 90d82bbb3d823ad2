"""Evaluate CLI: SI-SNRi (and optional SDRi) over a manifest directory.

Mirrors the reference evaluation loop exactly (evaluate.py:35-87):
full-utterance batches, forward, uPIT loss to obtain the PIT-reordered
estimates, per-utterance SI-SNRi with the mixture baseline and SDRi with
the duplicated-mixture anchor, then dataset averages."""

from __future__ import annotations

import argparse
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..data.dataset import AudioDataset, DataLoader
from ..ops.loss import cal_loss
from ..ops.metrics import sdr_improvement, si_snr_improvement
from ..training.checkpoint import load_model


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Evaluate separation performance")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory including mix.json, s1.json, s2.json")
    p.add_argument("--cal_sdr", type=int, default=0,
                   help="also compute SDRi (BSS-Eval v3)")
    p.add_argument("--sdr_backend", default="auto",
                   choices=["auto", "host", "device"],
                   help="where BSS-Eval runs: 'device' = batched jitted "
                        "JAX (one Gram factorization per utterance shared "
                        "by estimates and anchor; f32), 'host' = the f64 "
                        "numpy implementation (ops/metrics.py), 'auto' = "
                        "device on TPU, host elsewhere")
    p.add_argument("--sample_rate", default=8000, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--cv_maxlen", default=1e9, type=float)
    from .common import add_use_pallas_flag
    add_use_pallas_flag(p)
    p.add_argument("--pad_to_multiple", default=1, type=int,
                   help="pad utterances to a sample multiple so XLA compiles "
                        "a bounded set of shapes instead of one per length "
                        "(lengths stay exact; only gLN statistics see the "
                        "padding, matching batch-max padding semantics)")
    p.add_argument("--dp", default=1, type=int,
                   help="data-parallel size: shard eval batches over a "
                        "device mesh (0 = all devices; batches that don't "
                        "divide are zero-row-padded, metrics unchanged)")
    p.add_argument("--tp", default=1, type=int,
                   help="tensor-parallel size for the forward pass")
    p.add_argument("--cp", default=1, type=int,
                   help="context-parallel size: shard the frame axis of "
                        "each (long) utterance over devices — halo-"
                        "exchanged dilated convs, psum'd gLN stats, exact "
                        "OLA seams; composable with --dp (gLN/cLN only)")
    # Multi-host (TPU pods): same surface as the train CLI. Every process
    # runs this program; the mesh spans all hosts' chips, batches shard
    # globally, and metrics reduce ON DEVICE to replicated scalars (the
    # per-utterance estimates are not host-addressable across processes).
    p.add_argument("--multihost", default=0, type=int,
                   help="initialize jax.distributed before building the "
                        "mesh; metrics are device-reduced (SI-SNRi and "
                        "SDRi both run on device; --sdr_backend host is "
                        "unavailable)")
    p.add_argument("--coordinator_address", default=None, type=str)
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    return p


def evaluate(args, log: Callable[[str], None] = print) -> dict:
    import jax

    # Multi-host: join the process group BEFORE any device query (the
    # train CLI pattern, cli/train.py) so the mesh spans every host.
    multihost = (bool(getattr(args, "multihost", 0))
                 or getattr(args, "coordinator_address", None) is not None)
    if multihost:
        from ..parallel import distributed

        distributed.initialize(getattr(args, "coordinator_address", None),
                               getattr(args, "num_processes", None),
                               getattr(args, "process_id", None))
        if args.cal_sdr and args.sdr_backend == "host":
            raise SystemExit("--multihost needs --sdr_backend device/auto: "
                             "global estimates are not host-addressable")

    from ..utils.observability import enable_compilation_cache
    enable_compilation_cache()

    from .common import apply_use_pallas

    cfg, params, state = load_model(args.model_path)
    cfg = apply_use_pallas(cfg, args.use_pallas)

    # DP/TP/CP evaluation (the reference evals single-device; on a
    # multi-chip host that leaves (n-1)/n of the machine idle, and bounds
    # utterance length by memory — /root/reference/src/evaluate.py:44-51).
    # Batches shard over 'data' with zero-row padding (exact metrics);
    # params take the TP NamedShardings when tp > 1; cp > 1 shards the
    # frame axis of every utterance (parallel/context.py). With dp alone
    # the forward runs under shard_map so the Pallas kernels see local
    # batch slices instead of being replicated by GSPMD (make_dp_forward).
    shard_batch = None
    fwd = None
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    cp = getattr(args, "cp", 1)
    if multihost and dp == 1 and tp == 1 and cp == 1:
        dp = 0  # all devices across all hosts — the point of a pod eval
    if dp != 1 or tp != 1 or cp != 1 or multihost:
        from ..parallel.mesh import (make_dp_forward, make_mesh,
                                     shard_batch_fn, shard_params_fn)
        from .common import resolve_mesh_pallas

        cfg = resolve_mesh_pallas(cfg, tp, cp)
        mesh = make_mesh(dp=dp, tp=tp, cp=cp)
        params, state, _ = shard_params_fn(mesh, tp)(params, state, None)
        if multihost:
            from ..parallel.distributed import shard_batch_fn_multihost

            shard_batch = shard_batch_fn_multihost(mesh)
        else:
            shard_batch = shard_batch_fn(mesh)
        if cp > 1:
            from ..parallel.context import cp_forward

            batch_axis = "data" if mesh.shape["data"] > 1 else None
            fwd = (lambda p, s, m: cp_forward(
                p, s, cfg, m, mesh, train=False, batch_axis=batch_axis))
        elif tp == 1:
            fwd = make_dp_forward(cfg, mesh)

    dataset = AudioDataset(
        args.data_dir, args.batch_size, sample_rate=args.sample_rate,
        segment=-1, cv_maxlen=args.cv_maxlen, num_speakers=cfg.C,
        pad_to_multiple=args.pad_to_multiple,
    )
    loader = DataLoader(dataset, num_workers=2)

    from ..models.conv_tasnet import forward

    # Device-side BSS-Eval (round 4): the host implementation costs
    # ~1.1 s/utt of single-thread numpy while separation takes ~0.5 ms —
    # with cal_sdr=1 the chip idled >99.9% of eval wall time. The batched
    # jitted pipeline (ops/metrics_device.py) fuses SDRi into the same
    # program as the forward, so stage 3 stays device-bound.
    use_device_sdr = bool(args.cal_sdr) and (
        multihost  # global estimates never reach the host (see above)
        or args.sdr_backend == "device"
        or (args.sdr_backend == "auto" and jax.default_backend() == "tpu"))
    if use_device_sdr:
        from ..ops.metrics_device import sdr_improvement_batch

        sdri_fn = sdr_improvement_batch
        if shard_batch is not None:
            # Shard the metric over 'data' with shard_map like the
            # forward: rows are independent, so this is collective-free,
            # and it sidesteps XLA:CPU's layout-restricted FFT thunk on
            # GSPMD-sharded inputs.
            from jax import shard_map
            from jax.sharding import PartitionSpec as SpecP

            sdri_fn = shard_map(
                lambda s, r, m, l: sdr_improvement_batch(s, r, m, l),
                mesh=mesh, in_specs=(SpecP("data"),) * 4,
                out_specs=SpecP("data"), check_vma=False,
                axis_names={"data"})

    @jax.jit
    def infer(mixture, source, lengths):
        if fwd is not None:
            est = fwd(params, state, mixture)
        else:
            est, _ = forward(params, state, cfg, mixture, train=False)
        _, _, _, reordered = cal_loss(source, est, lengths)
        if use_device_sdr:
            sdri = sdri_fn(source, reordered, mixture, lengths)
        else:
            sdri = jnp.zeros((mixture.shape[0],), jnp.float32)
        return reordered, sdri

    if multihost:
        # Per-utterance estimates live sharded across hosts and are not
        # host-addressable, so the metrics reduce ON DEVICE to replicated
        # scalars: SI-SNRi via the batched device metric, SDRi via the
        # device BSS-Eval, masked over the zero-padded rows — every rank
        # fetches identical totals (cli/train.py loss pattern).
        from ..ops.metrics_device import si_snr_improvement_batch

        si_fn = si_snr_improvement_batch
        if shard_batch is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as SpecP

            si_fn = shard_map(
                lambda s, r, m, l: si_snr_improvement_batch(s, r, m, l),
                mesh=mesh, in_specs=(SpecP("data"),) * 4,
                out_specs=SpecP("data"), check_vma=False,
                axis_names={"data"})

        @jax.jit
        def infer_totals(mixture, source, lengths):
            if fwd is not None:
                est = fwd(params, state, mixture)
            else:
                est, _ = forward(params, state, cfg, mixture, train=False)
            _, _, _, reordered = cal_loss(source, est, lengths)
            valid = lengths > 0
            si = jnp.where(valid, si_fn(source, reordered, mixture, lengths),
                           0.0)
            if use_device_sdr:
                sd = jnp.where(
                    valid, sdri_fn(source, reordered, mixture, lengths), 0.0)
            else:
                sd = jnp.zeros_like(si)
            return (jnp.sum(si), jnp.sum(sd),
                    jnp.sum(valid.astype(jnp.float32)))

        totals = np.zeros(3)
        pending = None
        for batch in loader:  # one-deep pipeline like the single-host path
            mix_d, len_d, src_d = shard_batch(
                batch.mixture, batch.lengths, batch.source)
            fut = infer_totals(mix_d, src_d, len_d)
            if pending is not None:
                totals += [float(v) for v in pending]
            pending = fut
        if pending is not None:
            totals += [float(v) for v in pending]
        count = int(round(totals[2]))
        result = {"si_snri": totals[0] / max(count, 1), "count": count}
        if args.cal_sdr:
            result["sdri"] = totals[1] / max(count, 1)
            log(f"Average SDR improvement: {result['sdri']:.2f}")
        log(f"Average SISNR improvement: {result['si_snri']:.2f}")
        return result

    total_sisnri = 0.0
    total_sdri = 0.0
    count = 0

    def batches_with_async_infer():
        """One-deep pipeline: dispatch batch i+1's inference (async) before
        the host computes batch i's metrics, hiding device time and the
        device->host transfer behind the numpy metric work."""
        pending = None
        for batch in loader:
            if shard_batch is not None:
                mix_d, len_d, src_d = shard_batch(
                    batch.mixture, batch.lengths, batch.source)
            else:
                mix_d, len_d, src_d = (jnp.asarray(batch.mixture),
                                       jnp.asarray(batch.lengths),
                                       jnp.asarray(batch.source))
            fut = infer(mix_d, src_d, len_d)
            if pending is not None:
                yield (pending[0], np.asarray(pending[1][0]),
                       np.asarray(pending[1][1]))
            pending = (batch, fut)
        if pending is not None:
            yield (pending[0], np.asarray(pending[1][0]),
                   np.asarray(pending[1][1]))

    for batch, reordered, sdri_dev in batches_with_async_infer():
        for b in range(batch.mixture.shape[0]):
            n = int(batch.lengths[b])
            mix = batch.mixture[b, :n]
            src = batch.source[b, :, :n]
            est = reordered[b, :, :n]
            count += 1
            log(f"Utt {count}")
            if args.cal_sdr:
                if use_device_sdr:
                    sdri = float(sdri_dev[b])
                else:
                    sdri = sdr_improvement(src, est, mix)
                total_sdri += sdri
                log(f"\tSDRi={sdri:.2f}")
            sisnri = si_snr_improvement(src, est, mix)
            log(f"\tSI-SNRi={sisnri:.2f}")
            total_sisnri += sisnri

    result = {"si_snri": total_sisnri / max(count, 1), "count": count}
    if args.cal_sdr:
        result["sdri"] = total_sdri / max(count, 1)
        log(f"Average SDR improvement: {result['sdri']:.2f}")
    log(f"Average SISNR improvement: {result['si_snri']:.2f}")
    return result


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(args)
    return evaluate(args)


if __name__ == "__main__":
    main()
