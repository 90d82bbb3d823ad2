"""Import a reference PyTorch checkpoint (.pth.tar) into this framework.

The reference serializes models as a pickle package of hyperparameters +
state_dict + optimizer state + epoch + loss history
(/root/reference/src/conv_tasnet.py:78-94). This CLI converts such a
package into a convtasnet_tpu .ckpt that evaluate/separate (and
--continue_from for fine-tuning the weights) consume directly:

    convtasnet-import-torch --torch_path final.pth.tar --out final.ckpt

Optimizer state is NOT converted (torch Adam moments are layout-coupled to
torch tensors; a fine-tune restarts the optimizer), but epoch and the
tr/cv loss history are carried over.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Convert a reference .pth.tar to a .ckpt")
    p.add_argument("--torch_path", type=str, required=True,
                   help="reference package (ConvTasNet.serialize output)")
    p.add_argument("--out", type=str, required=True,
                   help="output .ckpt path")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   help="compute dtype recorded in the imported config "
                        "(params are stored f32 either way)")
    return p


def import_torch(args, log=print) -> str:
    from ..compat.torch_convert import import_package, load_torch_package
    from ..training.checkpoint import save_checkpoint

    package = load_torch_package(args.torch_path)
    cfg, params, state = import_package(package,
                                        compute_dtype=args.compute_dtype)
    tr = package.get("tr_loss")
    cv = package.get("cv_loss")

    def _hist(x, epoch):
        if x is None:
            return None
        x = list(map(float, getattr(x, "tolist", lambda: x)()))
        return x[:epoch] if epoch else x

    epoch = int(package.get("epoch", 0))
    save_checkpoint(args.out, cfg, params, state, epoch=epoch,
                    tr_loss=_hist(tr, epoch), cv_loss=_hist(cv, epoch),
                    extra={"imported_from": args.torch_path})
    n = sum(int(p.size) for p in _leaves(params))
    log(f"Imported {args.torch_path} -> {args.out} "
        f"({n/1e6:.2f}M params, epoch {epoch}, "
        f"N={cfg.N} L={cfg.L} B={cfg.B} H={cfg.H} P={cfg.P} X={cfg.X} "
        f"R={cfg.R} C={cfg.C} {cfg.norm_type}"
        f"{' causal' if cfg.causal else ''} {cfg.mask_nonlinear})")
    return args.out


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main(argv=None):
    args = build_parser().parse_args(argv)
    return import_torch(args)


if __name__ == "__main__":
    main()
