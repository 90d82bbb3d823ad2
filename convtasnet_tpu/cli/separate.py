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
    return p


def separate(args) -> int:
    import jax

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
        mesh = make_mesh(dp=dp, tp=tp, cp=cp)
        params, state, _ = shard_params_fn(mesh, tp)(params, state, None)
        shard_batch = shard_batch_fn(mesh)
        if cp > 1:
            from ..parallel.context import cp_forward

            batch_axis = "data" if mesh.shape["data"] > 1 else None
            fwd = (lambda p, s, m: cp_forward(
                p, s, cfg, m, mesh, train=False, batch_axis=batch_axis))
        elif tp == 1:
            fwd = make_dp_forward(cfg, mesh)

    dataset = EvalDataset(args.mix_dir, args.mix_json,
                          batch_size=args.batch_size,
                          sample_rate=args.sample_rate,
                          pad_to_multiple=args.pad_to_multiple)
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
