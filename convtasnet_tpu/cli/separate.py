"""Separate CLI: run inference on mixture wavs and write per-speaker wavs.

Mirrors the reference inference tool (separate.py:35-79): loads a
checkpoint, builds an EvalDataset from --mix_dir or --mix_json, forwards
each padded batch, trims padding, and writes `<base>.wav` (the mixture)
plus `<base>_s{c}.wav` per separated speaker as PCM_16."""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..data.dataset import DataLoader, EvalDataset
from ..data.wavio import write_wav
from ..training.checkpoint import load_model


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Separate speech with a trained model")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--mix_dir", type=str, default=None)
    p.add_argument("--mix_json", type=str, default=None)
    p.add_argument("--out_dir", type=str, default="exp/result")
    p.add_argument("--sample_rate", default=8000, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    from .common import add_use_pallas_flag
    add_use_pallas_flag(p)
    p.add_argument("--pad_to_multiple", default=1, type=int,
                   help="pad mixtures to a sample multiple to bound the "
                        "number of compiled shapes")
    p.add_argument("--dp", default=1, type=int,
                   help="data-parallel size: shard batches over a device "
                        "mesh (0 = all devices; zero-row padding, outputs "
                        "unchanged)")
    p.add_argument("--tp", default=1, type=int,
                   help="tensor-parallel size for the forward pass")
    p.add_argument("--cp", default=1, type=int,
                   help="context-parallel size: shard the frame axis of "
                        "each (long) mixture over devices; composable "
                        "with --dp (gLN/cLN only)")
    # Multi-host: separation is embarrassingly parallel over utterances,
    # so each process takes a stride-slice of the batch list and runs it
    # on ITS OWN chips (dp/tp/cp meshes build over jax.local_devices());
    # no cross-host collectives, and every rank writes only its slice's
    # wavs. This is the serving-style layout — contrast cli/evaluate.py,
    # whose global mesh + device-reduced metrics need the whole pod.
    p.add_argument("--multihost", default=0, type=int,
                   help="initialize jax.distributed, stripe utterance "
                        "batches across processes, run per-process local "
                        "meshes")
    p.add_argument("--coordinator_address", default=None, type=str)
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    return p


def separate(args) -> int:
    import jax

    multihost = (bool(getattr(args, "multihost", 0))
                 or getattr(args, "coordinator_address", None) is not None)
    if multihost:
        from ..parallel import distributed

        distributed.initialize(getattr(args, "coordinator_address", None),
                               getattr(args, "num_processes", None),
                               getattr(args, "process_id", None))

    from ..utils.observability import enable_compilation_cache
    enable_compilation_cache()

    if args.mix_dir is None and args.mix_json is None:
        raise SystemExit("Must provide mix_dir or mix_json! When providing "
                         "mix_dir, mix_json is ignored.")

    from .common import apply_use_pallas

    cfg, params, state = load_model(args.model_path)
    cfg = apply_use_pallas(cfg, args.use_pallas)

    # DP/TP/CP inference over a device mesh (zero-row batch padding; the
    # padded rows are never written). See cli/evaluate.py.
    shard_batch = None
    fwd = None
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    cp = getattr(args, "cp", 1)
    if dp != 1 or tp != 1 or cp != 1:
        from ..parallel.mesh import (make_dp_forward, make_mesh,
                                     shard_batch_fn, shard_params_fn)
        from .common import resolve_mesh_pallas

        cfg = resolve_mesh_pallas(cfg, tp, cp)
        # Multi-host: each rank's mesh spans only ITS devices (the batch
        # stripe below makes the work disjoint; no cross-host collectives).
        mesh = make_mesh(dp=dp, tp=tp, cp=cp,
                         devices=jax.local_devices() if multihost else None)
        params, state, _ = shard_params_fn(mesh, tp)(params, state, None)
        shard_batch = shard_batch_fn(mesh)
        if cp > 1:
            from ..parallel.context import cp_forward

            batch_axis = "data" if mesh.shape["data"] > 1 else None
            fwd = (lambda p, s, m: cp_forward(
                p, s, cfg, m, mesh, train=False, batch_axis=batch_axis))
        elif tp == 1:
            fwd = make_dp_forward(cfg, mesh)

    mix_dir, mix_json = args.mix_dir, args.mix_json
    if multihost and mix_dir is not None:
        # The auto-manifest write must happen once, not once per rank
        # (concurrent writes of the same file can interleave): rank 0
        # materializes it, everyone else waits on the barrier.
        from jax.experimental.multihost_utils import sync_global_devices

        from ..data.manifest import preprocess_one_dir

        if jax.process_index() == 0:
            mix_json = preprocess_one_dir(mix_dir, mix_dir, "mix",
                                          args.sample_rate)
        sync_global_devices("separate_manifest")
        if jax.process_index() != 0:
            mix_json = os.path.join(mix_dir, "mix.json")
        mix_dir = None
    dataset = EvalDataset(mix_dir, mix_json,
                          batch_size=args.batch_size,
                          sample_rate=args.sample_rate,
                          pad_to_multiple=args.pad_to_multiple)
    if multihost:
        # Stride-slice the batch list: ranks process disjoint utterances
        # and each writes only its own outputs (manifest order is shared,
        # so the union covers every utterance exactly once).
        dataset.batches = dataset.batches[
            jax.process_index()::jax.process_count()]
    loader = DataLoader(dataset, num_workers=2)
    os.makedirs(args.out_dir, exist_ok=True)

    from ..models.conv_tasnet import forward

    @jax.jit
    def infer(mixture):
        if fwd is not None:
            return fwd(params, state, mixture)
        est, _ = forward(params, state, cfg, mixture, train=False)
        return est

    written = 0

    def batches_with_async_infer():
        # One-deep pipeline: next batch's forward overlaps this batch's
        # wav encoding + disk writes (see evaluate.py).
        pending = None
        for batch in loader:
            if shard_batch is not None:
                mix_d, _, _ = shard_batch(batch.mixture, batch.lengths, None)
            else:
                mix_d = jnp.asarray(batch.mixture)
            fut = infer(mix_d)
            if pending is not None:
                yield pending[0], np.asarray(pending[1])
            pending = (batch, fut)
        if pending is not None:
            yield pending[0], np.asarray(pending[1])

    for batch, est in batches_with_async_infer():  # est: [B, C, T]
        for b, filename in enumerate(batch.filenames):
            n = int(batch.lengths[b])
            base = os.path.basename(filename)
            if base.endswith(".wav"):
                base = base[:-4]
            out_base = os.path.join(args.out_dir, base)
            write_wav(out_base + ".wav", batch.mixture[b, :n], args.sample_rate)
            for c in range(cfg.C):
                write_wav(f"{out_base}_s{c + 1}.wav", est[b, c, :n], args.sample_rate)
            written += 1
    return written


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(args)
    return separate(args)


if __name__ == "__main__":
    main()
