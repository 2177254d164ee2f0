"""Convert reference PyTorch checkpoints (.pth) to bdm_tpu orbax params.

Usage:
    python tools/convert_checkpoint.py --kind pc2 --src train_chair.pth \
        --dst ./ckpts/pc2_chair
    python tools/convert_checkpoint.py --kind pvd --src chair_1799.pth \
        --dst ./ckpts/pvd_chair
    python tools/convert_checkpoint.py --kind fusion --src fusion.pth \
        --dst ./ckpts/fusion_chair
    python tools/convert_checkpoint.py --kind vit --src vits16_800ep.pth.tar \
        --dst ./ckpts/vit_msn  # MSN/MAE image backbones

The resulting directory loads via `bdm_tpu.train.checkpoint.load_params`
and plugs into `aux_run.prior_ckpt` / `aux_run.recon_ckpt` /
`aux_run.fusion_ckpt` / `checkpoint.resume`.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        # the axon TPU plugin ignores the env var; conversion is pure
        # array shuffling and must never block on a TPU backend
        jax.config.update("jax_platforms", plat)
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", required=True,
                        choices=("pc2", "pvd", "fusion", "vit"))
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--in_channels", type=int, default=390,
                        help="PC2 conditioned input channels")
    parser.add_argument("--vit_depth", type=int, default=12)
    parser.add_argument("--vit_heads", type=int, default=6)
    args = parser.parse_args()

    from bdm_tpu.train.checkpoint import save_params
    from bdm_tpu.utils import convert_torch as ct

    sd = ct.load_torch_file(args.src)
    if args.kind == "pc2":
        params = ct.convert_pc2_checkpoint(sd, in_channels=args.in_channels,
                                           vit_depth=args.vit_depth,
                                           vit_heads=args.vit_heads)
    elif args.kind == "pvd":
        params = ct.convert_pvd_checkpoint(sd)
    elif args.kind == "fusion":
        params = ct.convert_fusion_checkpoint(sd,
                                              in_channels=args.in_channels)
    else:  # vit: MSN ('target_encoder', 'module.' prefixes) or MAE ('model')
        sd = {k.removeprefix("module."): v for k, v in sd.items()
              if not k.startswith("fc.")}
        params = {"params": {"vit": ct.convert_vit(
            sd, prefix="", depth=args.vit_depth, num_heads=args.vit_heads)}}

    path = save_params(args.dst, params)
    print(f"Wrote {args.kind} params to {path}")


if __name__ == "__main__":
    main()
