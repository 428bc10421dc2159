"""Convert torch weight files into this package's safetensors layouts.

The eval metric stack (LPIPS / DISTS / InceptionV3) and the OneDC model
porter consume converted safetensors (zero-egress environment: weights
must arrive on disk). This CLI wraps the converters:

  # pytorch-fid / torch-fidelity pt_inception-2015-12-05 state dict
  python -m onedc_tpu.utils.convert_weights inception \
      --src pt_inception.pth --out inception.safetensors

  # torchvision VGG16 features + DISTS package alpha/beta buffers
  python -m onedc_tpu.utils.convert_weights dists \
      --vgg vgg16.pth --dists weights.pt --out dists.safetensors

  # torchvision VGG16 features + LPIPS linear heads
  python -m onedc_tpu.utils.convert_weights lpips \
      --vgg vgg16.pth --lins lpips_lins.pth --out lpips.safetensors

  # reference OneDC checkpoint pair -> full OneDC param tree
  python -m onedc_tpu.utils.convert_weights onedc \
      --unet model.safetensors --codec model_1.safetensors \
      --out onedc.safetensors [model.key=value ...]

  # reference SDGuidance checkpoint (stage-2 model_2.safetensors /
  # guidance_ckpt) -> our SDGuidance param tree
  python -m onedc_tpu.utils.convert_weights guidance \
      --src model_2.safetensors --out guidance.safetensors \
      [guidance.key=value ...]
"""

from __future__ import annotations

import argparse

import numpy as np


def _torch_load(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v) for k, v in obj.items()}


def convert_inception(src, out):
    from ..nn.inception import convert_torch_inception
    from .checkpoint import save_safetensors
    save_safetensors(convert_torch_inception(_torch_load(src)), out)


def convert_dists(vgg, dists, out):
    from ..nn.dists import convert_torch_dists
    from .checkpoint import save_safetensors
    vgg_state = _torch_load(vgg)
    d = _torch_load(dists)
    alpha = d.get("alpha")
    beta = d.get("beta")
    assert alpha is not None and beta is not None, sorted(d)
    save_safetensors(convert_torch_dists(vgg_state, alpha, beta), out)


def convert_lpips(vgg, lins, out):
    from ..nn.lpips import convert_torch_vgg16
    from .checkpoint import save_safetensors
    vgg_state = _torch_load(vgg)
    lin_state = _torch_load(lins)
    # lpips package layout: lin{k}.model.1.weight
    lin_weights = []
    for k in range(5):
        for name in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if name in lin_state:
                lin_weights.append(lin_state[name])
                break
        else:
            raise KeyError(f"no linear head {k} in {sorted(lin_state)[:5]}")
    save_safetensors(convert_torch_vgg16(vgg_state, lin_weights), out)


def convert_onedc(unet, codec, vae, codeformer, out, overrides):
    import jax
    import jax.numpy as jnp

    from ..config import parse_cli_overrides
    from ..models.onedc import OneDC
    from .checkpoint import save_safetensors
    from .port_torch import port_onedc_checkpoint

    # YAML-typed key.path=value overrides (same semantics as every CLI)
    cfg = parse_cli_overrides(overrides)
    model = OneDC(**dict(cfg.get("model", {})))
    key = jax.random.PRNGKey(0)
    ref_params = jax.jit(lambda: model.init(
        {"params": key}, jnp.zeros((1, 64, 64, 3), jnp.float32)))()
    params = port_onedc_checkpoint(
        unet_path=unet, codec_path=codec, vae_path=vae,
        codeformer_path=codeformer, reference_params=ref_params)
    save_safetensors(params, out)


def convert_guidance(src, out, overrides):
    import jax
    import jax.numpy as jnp

    from ..config import parse_cli_overrides
    from ..models.dmd import SDGuidance
    from .checkpoint import save_safetensors
    from .port_torch import port_guidance_checkpoint

    cfg = parse_cli_overrides(overrides)
    guidance = SDGuidance(**dict(cfg.get("guidance", {})))
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((1, 77, guidance.context_dim), jnp.float32)
    ref_params = jax.jit(lambda: guidance.init(
        {"params": key}, lat, ctx, ctx, jax.random.PRNGKey(1),
        method=guidance.generator_forward))()
    params = port_guidance_checkpoint(src, ref_params)
    save_safetensors(params, out)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("inception")
    s.add_argument("--src", required=True)
    s.add_argument("--out", required=True)

    s = sub.add_parser("dists")
    s.add_argument("--vgg", required=True)
    s.add_argument("--dists", required=True)
    s.add_argument("--out", required=True)

    s = sub.add_parser("lpips")
    s.add_argument("--vgg", required=True)
    s.add_argument("--lins", required=True)
    s.add_argument("--out", required=True)

    s = sub.add_parser("onedc")
    s.add_argument("--unet", default=None)
    s.add_argument("--codec", default=None)
    s.add_argument("--vae", default=None)
    s.add_argument("--codeformer", default=None)
    s.add_argument("--out", required=True)

    s = sub.add_parser("guidance")
    s.add_argument("--src", required=True)
    s.add_argument("--out", required=True)

    args, extra = p.parse_known_args(argv)
    if args.cmd not in ("onedc", "guidance") and extra:
        p.error(f"unrecognized arguments: {extra}")
    if args.cmd == "inception":
        convert_inception(args.src, args.out)
    elif args.cmd == "dists":
        convert_dists(args.vgg, args.dists, args.out)
    elif args.cmd == "lpips":
        convert_lpips(args.vgg, args.lins, args.out)
    elif args.cmd == "onedc":
        convert_onedc(args.unet, args.codec, args.vae, args.codeformer,
                      args.out, extra)
    elif args.cmd == "guidance":
        convert_guidance(args.src, args.out, extra)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
