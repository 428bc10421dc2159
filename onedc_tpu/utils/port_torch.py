"""Torch reference-checkpoint porter: safetensors state dicts -> our params.

Maps the reference's shipped checkpoint tensors onto the Flax module tree:

- ``model.safetensors``   (SD1.5 UNet + LoRA + conv_in + vae_reduction,
  ref ``model_sd15_with_codec_stage1.py:161-169``) -> ``params/unet``
- ``model_1.safetensors`` (IntraNoAR codec)         -> ``params/codec``
- SD2.1 VAE diffusers checkpoint                    -> ``params/vae``
- MaskGIT-VQGAN torch checkpoint                    -> VQGAN params

Layout transforms: conv OIHW->HWIO, linear (out,in)->(in,out), norm
weight->scale. LoRA adapters (rank 64, alpha 8; ref decoder_unet.py:331-368)
are merged into the base weights at load time — we never train the adapter
separately at inference.

Name translation is rule-based (regex rewrites from the reference's module
naming to ours); see each ``*_RULES`` table. Unmatched keys raise so silent
checkpoint drift is impossible.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# tensor layout transforms
# ---------------------------------------------------------------------------

def _to_flax(name: str, arr: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map a torch leaf (name ending .weight/.bias) to flax leaf name+layout."""
    if name.endswith(".bias"):
        return "bias", arr
    if name.endswith(".weight"):
        if arr.ndim == 4:      # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:      # linear (out,in) -> (in,out)
            return "kernel", arr.T
        return "scale", arr    # norm weight
    # raw parameters (e.g. pos_embedding, quantize.embedding)
    return name.rsplit(".", 1)[-1], arr


# ---------------------------------------------------------------------------
# LoRA merge (peft layout)
# ---------------------------------------------------------------------------

def merge_lora(state: Dict[str, np.ndarray], rank: int = 64,
               alpha: float = 8.0) -> Dict[str, np.ndarray]:
    """Fold peft LoRA adapters into base weights.

    Handles ``X.base_layer.weight`` + ``X.lora_A.default.weight`` /
    ``X.lora_B.default.weight`` triples for linear and conv layers; the
    merged weight lands on ``X.weight``. Scaling = alpha / rank.
    """
    out: Dict[str, np.ndarray] = {}
    lora_a: Dict[str, np.ndarray] = {}
    lora_b: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        m = re.match(r"(.*)\.lora_A\.[^.]+\.weight$", k)
        if m:
            lora_a[m.group(1)] = v
            continue
        m = re.match(r"(.*)\.lora_B\.[^.]+\.weight$", k)
        if m:
            lora_b[m.group(1)] = v
            continue
        if ".lora_" in k:   # lora bias / embedding variants unused
            continue
        out[k.replace(".base_layer", "")] = v

    scale = alpha / rank
    for base, a in lora_a.items():
        b = lora_b.get(base)
        if b is None:
            raise KeyError(f"lora_A without lora_B at {base}")
        key = f"{base}.weight"
        w = out.get(key)
        if w is None:
            raise KeyError(f"lora target missing base weight: {key}")
        if w.ndim == 2:
            delta = b @ a
        else:  # conv: A (r, in, kh, kw), B (out, r, 1, 1)
            delta = np.einsum("orab,rikh->oikh", b, a) if b.shape[2:] != (1, 1) \
                else np.einsum("or,rikh->oikh", b[:, :, 0, 0], a)
        out[key] = (w.astype(np.float64) + scale * delta.astype(np.float64)
                    ).astype(w.dtype)
    return out


# ---------------------------------------------------------------------------
# rule-based renaming
# ---------------------------------------------------------------------------

Rule = Tuple[str, str]


def _apply_rules(name: str, rules: List[Rule]) -> str:
    for pat, rep in rules:
        name = re.sub(pat, rep, name)
    return name


# DepthConvBlock4 / DepthConv / ConvFFN3 internals (dcvc.py:242-266,353-368,
# 424-433) and ResidualBlockUpsample (dcvc.py:183-205)
_DCVC_RULES: List[Rule] = [
    (r"\.block\.0\.conv1\.0\.", r"/dc/conv1_0."),
    (r"\.block\.0\.depth_conv\.", r"/dc/depth_conv."),
    (r"\.block\.0\.conv2\.", r"/dc/conv2."),
    (r"\.block\.0\.adaptor\.", r"/dc/adaptor."),
    (r"\.block\.1\.conv\.", r"/ffn/conv."),
    (r"\.block\.1\.conv_out\.", r"/ffn/conv_out."),
    (r"\.subpel_conv\.0\.", r"/subpel_conv/conv."),
    (r"\.upsample\.0\.", r"/upsample/conv."),
]

# flax nn.Conv submodule inside our Conv-wrapper-free modules is addressed
# directly; torch Sequential indices map to our explicit names.
_CODEC_RULES: List[Rule] = [
    # encoder
    (r"^enc\.pix_emb\.", r"enc/pix_emb."),
    (r"^enc\.pix_fusion\.", r"enc/pix_fusion."),
    (r"^enc\.unet\.conv_in\.3\.", r"enc/unet/conv_in_down."),
    (r"^enc\.unet\.conv_in\.(\d)\.", r"enc/unet/conv_in_res\1."),
    (r"^enc\.unet\.time_embedding\.", r"enc/unet/time_embedding/"),
    (r"^enc\.unet\.(down_blocks|up_blocks)\.(\d)\.(resnets|attentions)\.(\d)\.",
     r"enc/unet/\1_\2/\3_\4/"),
    (r"^enc\.unet\.(down_blocks|up_blocks)\.(\d)\.(downsamplers|upsamplers)\.0\.conv\.",
     r"enc/unet/\1_\2/\3_0/conv."),
    (r"^enc\.unet\.mid_block\.(resnets|attentions)\.(\d)\.",
     r"enc/unet/mid_block/\1_\2/"),
    (r"^enc\.unet\.conv_norm_out\.", r"enc/unet/conv_norm_out."),
    (r"^enc\.unet\.conv_out\.", r"enc/unet/conv_out."),
    (r"^enc\.trans_coding\.0\.", r"enc/tc_bottleneck/res0."),
    (r"^enc\.trans_coding\.1\.", r"enc/tc_bottleneck/attn."),
    (r"^enc\.trans_coding\.2\.", r"enc/tc_bottleneck/res1."),
    (r"^enc\.trans_coding\.3", r"enc/tc_block0"),
    (r"^enc\.trans_coding\.4", r"enc/tc_block1"),
    # decoder
    (r"^dec\.trans_coding\.0", r"dec/tc_block0"),
    (r"^dec\.trans_coding\.1", r"dec/tc_block1"),
    (r"^dec\.blocks\.([012])\.", r"dec/res16_\1."),
    (r"^dec\.blocks\.3\.", r"dec/up/conv_expand."),
    (r"^dec\.blocks\.5\.", r"dec/up/conv_out."),
    (r"^dec\.blocks\.6\.", r"dec/res8_0."),
    (r"^dec\.blocks\.7\.", r"dec/res8_1."),
    (r"^dec\.blocks\.8\.", r"dec/res8_2."),
    (r"^dec\.sem_up\.0", r"dec/sem_up0"),
    (r"^dec\.sem_up\.1", r"dec/sem_block0"),
    (r"^dec\.sem_up\.2", r"dec/sem_up1"),
    (r"^dec\.sem_up\.3", r"dec/sem_block1"),
    (r"^dec\.sem_up\.4", r"dec/sem_up2"),
    (r"^dec\.conv_out", r"dec/conv_out"),
    # semantic adaptor
    (r"^semantic_adaptor\.to_semantic\.0", r"semantic_adaptor/block_in"),
    (r"^semantic_adaptor\.to_semantic\.1\.", r"semantic_adaptor/g0_res0."),
    (r"^semantic_adaptor\.to_semantic\.2\.", r"semantic_adaptor/g0_attn0."),
    (r"^semantic_adaptor\.to_semantic\.3\.", r"semantic_adaptor/g0_attn1."),
    (r"^semantic_adaptor\.to_semantic\.4\.", r"semantic_adaptor/g1_res0."),
    (r"^semantic_adaptor\.to_semantic\.5\.", r"semantic_adaptor/g1_attn0."),
    (r"^semantic_adaptor\.to_semantic\.6\.", r"semantic_adaptor/g1_attn1."),
    (r"^semantic_adaptor\.to_semantic\.7", r"semantic_adaptor/block_out"),
    # hyper encoder / decoder
    (r"^hyper_enc\.y_trans_coding\.0", r"hyper_enc/ytc_block0"),
    (r"^hyper_enc\.y_trans_coding\.1\.", r"hyper_enc/ytc_down0."),
    (r"^hyper_enc\.y_trans_coding\.2", r"hyper_enc/ytc_block1"),
    (r"^hyper_enc\.y_trans_coding\.3\.", r"hyper_enc/ytc_down1."),
    (r"^hyper_enc\.fusion\.0", r"hyper_enc/fusion_block0"),
    (r"^hyper_enc\.fusion\.1\.", r"hyper_enc/fusion_attn0."),
    (r"^hyper_enc\.fusion\.2", r"hyper_enc/fusion_block1"),
    (r"^hyper_enc\.fusion\.3\.", r"hyper_enc/fusion_attn1."),
    (r"^hyper_enc\.fusion\.4", r"hyper_enc/fusion_block2"),
    (r"^hyper_enc\.fusion\.5\.", r"hyper_enc/fusion_out."),
    (r"^hyper_dec\.feat_in\.0\.", r"hyper_dec/feat_in."),
    (r"^hyper_dec\.to_entropy\.0", r"hyper_dec/ent_block0"),
    (r"^hyper_dec\.to_entropy\.1\.", r"hyper_dec/ent_up0."),
    (r"^hyper_dec\.to_entropy\.2", r"hyper_dec/ent_block1"),
    (r"^hyper_dec\.to_entropy\.3\.", r"hyper_dec/ent_up1."),
    (r"^hyper_dec\.to_entropy\.4", r"hyper_dec/ent_block2"),
    # priors
    (r"^y_prior_fusion\.0", r"y_prior_fusion/block0"),
    (r"^y_prior_fusion\.1", r"y_prior_fusion/block1"),
    (r"^y_spatial_prior\.0", r"y_spatial_prior/block0"),
    (r"^y_spatial_prior\.1", r"y_spatial_prior/block1"),
    (r"^y_spatial_prior\.2", r"y_spatial_prior/block2"),
    (r"^y_spatial_prior_adaptor_(\d)\.", r"y_spatial_prior_adaptor_\1."),
    (r"^y_spatial_prior_reduction\.", r"y_spatial_prior_reduction."),
] + _DCVC_RULES + [
    # vq/attn blocks inside codec (AttnBlock names q,k,v,proj_out,norm)
]

_SD_UNET_RULES: List[Rule] = [
    (r"^vae_reduction\.blocks\.0\.", r"vae_reduction/norm1."),
    (r"^vae_reduction\.blocks\.2\.", r"vae_reduction/conv1."),
    (r"^vae_reduction\.blocks\.3\.", r"vae_reduction/norm2."),
    (r"^vae_reduction\.blocks\.5\.", r"vae_reduction/conv2."),
    (r"^vae_reduction\.short_cut\.", r"vae_reduction/short_cut."),
    (r"^time_embedding\.", r"time_embedding/"),
    (r"^(down_blocks|up_blocks)\.(\d)\.(resnets|attentions)\.(\d)\.",
     r"\1_\2/\3_\4/"),
    (r"^(down_blocks|up_blocks)\.(\d)\.(downsamplers|upsamplers)\.0\.conv\.",
     r"\1_\2/\3_0/conv."),
    (r"^mid_block\.(resnets|attentions)\.(\d)\.", r"mid_block/\1_\2/"),
    # inner transformer rules accept both separators: the enclosing
    # block rule above has already rewritten its suffix "." to "/"
    (r"[./]transformer_blocks\.(\d)\.", r"/transformer_blocks_\1/"),
    (r"[./]ff\.net\.0\.proj\.", r"/ff/net_0/proj."),
    (r"[./]ff\.net\.2\.", r"/ff/net_2."),
    (r"[./]to_out\.0\.", r"/to_out_0."),
    (r"[./]attn(\d)\.", r"/attn\1/"),
    (r"[./]norm(\d)\.", r"/norm\1."),
]

_VAE_RULES: List[Rule] = [
    (r"^quant_conv\.", r"encoder/quant_conv."),
    (r"^post_quant_conv\.", r"decoder/post_quant_conv."),
    (r"^(encoder|decoder)\.conv_in\.", r"\1/conv_in."),
    (r"^(encoder|decoder)\.conv_norm_out\.", r"\1/conv_norm_out."),
    (r"^(encoder|decoder)\.conv_out\.", r"\1/conv_out."),
    (r"^(encoder|decoder)\.mid_block\.(resnets|attentions)\.(\d)\.",
     r"\1/mid_block/\2_\3/"),
    (r"^(encoder|decoder)\.(down_blocks|up_blocks)\.(\d)\.resnets\.(\d)\.",
     r"\1/\2_\3/resnets_\4/"),
    (r"^(encoder|decoder)\.(down_blocks|up_blocks)\.(\d)\.downsamplers\.0\.conv\.",
     r"\1/\2_\3/downsamplers_0."),
    (r"^(encoder|decoder)\.(down_blocks|up_blocks)\.(\d)\.upsamplers\.0\.conv\.",
     r"\1/\2_\3/upsamplers_0."),
]

# Swin blocks (ref blocks/swin.py:134-196): attention_block -> attn,
# FeedForward net indices -> mlp_0/mlp_2; the shifted blocks' additive
# masks are recomputed statically on our side (skip at the call sites).
_SWIN_RULES: List[Rule] = [
    (r"\.attention_block\.", r"/attn/"),
    (r"\.mlp_block\.net\.0\.", r"/mlp_0."),
    (r"\.mlp_block\.net\.2\.", r"/mlp_2."),
]

# Codeformer (ref codec_module.py:472-503): up_sample Sequential ->
# up_block0/up_expand/up_block1, blocks.N -> swinN, mlp_head Sequential
# -> head_0/head_norm0/head_3/head_norm1/head_out.
_CODEFORMER_RULES: List[Rule] = [
    (r"^up_sample\.0", r"up_block0"),
    (r"^up_sample\.1\.", r"up_expand."),
    (r"^up_sample\.3", r"up_block1"),
    (r"^blocks\.(\d)\.", r"swin\1/"),
    (r"^mlp_head\.0\.", r"head_0."),
    (r"^mlp_head\.1\.", r"head_norm0."),
    (r"^mlp_head\.3\.", r"head_3."),
    (r"^mlp_head\.4\.", r"head_norm1."),
    (r"^mlp_head\.6\.", r"head_out."),
] + _SWIN_RULES + _DCVC_RULES

_SWIN_SKIP = (r"upper_lower_mask", r"left_right_mask", r"relative_indices")

# SDGuidance GAN head (ref sd_guidance.py:136-151, SD1.5 branch):
# nn.Sequential indices -> our ClsHead names (models/dmd.py:41-65).
_CLS_HEAD_RULES: List[Rule] = [
    (r"^cls_pred_branch\.0\.", r"cls_pred_branch/conv0."),
    (r"^cls_pred_branch\.1\.", r"cls_pred_branch/norm0."),
    (r"^cls_pred_branch\.3\.", r"cls_pred_branch/conv1."),
    (r"^cls_pred_branch\.4\.", r"cls_pred_branch/norm1."),
    (r"^cls_pred_branch\.6\.", r"cls_pred_branch/conv_out."),
]

_VQGAN_RULES: List[Rule] = [
    (r"^quantize\.embedding\.weight$", r"quantize/embedding"),
    (r"^(encoder|decoder)\.conv_in\.", r"\1/conv_in."),
    (r"^(encoder|decoder)\.norm_out\.", r"\1/norm_out."),
    (r"^(encoder|decoder)\.conv_out\.", r"\1/conv_out."),
    (r"^encoder\.down\.(\d)\.block\.(\d)\.", r"encoder/down_\1_block_\2."),
    (r"^encoder\.mid\.(\d)\.", r"encoder/mid_\1."),
    (r"^decoder\.mid\.(\d)\.", r"decoder/mid_\1."),
    (r"^decoder\.up\.(\d)\.block\.(\d)\.", r"decoder/up_\1_block_\2."),
    (r"^decoder\.up\.(\d)\.upsample_conv\.", r"decoder/up_\1_conv."),
]

# generic: diffusers Attention's to_out is a ModuleList(Linear, Dropout).
# Separator class [./]: an enclosing rule may already have rewritten the
# preceding "." to "/" ("/" vs "." is immaterial before _finalize).
_GENERIC_RULES: List[Rule] = [
    (r"[./]to_out\.0\.", r".to_out."),
]

# suffix of the torch attention resnet internals is shared:
# norm1/norm2 (GN), conv1/conv2, conv_shortcut/nin_shortcut,
# time_emb_proj, group_norm, to_q/to_k/to_v, q/k/v/proj_out, norm —
# these names match our flax modules 1:1 and need only `.`->`/` joining.


def _finalize(name: str) -> str:
    """Convert remaining torch dots to flax path separators."""
    return name.replace(".", "/")


def port_state_dict(state: Dict[str, np.ndarray], rules: List[Rule],
                    strict: bool = True,
                    skip: Tuple[str, ...] = (),
                    raw_keys: Tuple[str, ...] = ()) -> Dict[str, np.ndarray]:
    """Apply rules + layout transforms. Returns flat {path: array} with
    '/'-joined keys ready for ``unflatten_params``.

    ``raw_keys``: regex patterns of torch names stored verbatim (no
    transpose, no kernel/bias leaf) — e.g. nn.Embedding weights, whose
    (K, D) layout must survive despite the ``.weight`` suffix.
    """
    flat: Dict[str, np.ndarray] = {}
    for key, arr in state.items():
        if any(re.search(s, key) for s in skip):
            continue
        if any(re.search(p, key) for p in raw_keys):
            stem = key[:-len(".weight")] if key.endswith(".weight") else key
            renamed = _finalize(
                _apply_rules(stem + ".", rules + _GENERIC_RULES).rstrip("./"))
            flat[renamed] = np.asarray(arr)
            continue
        leaf, val = _to_flax(key, np.asarray(arr))
        stem = key
        for suffix in (".weight", ".bias"):
            if stem.endswith(suffix):
                stem = stem[: -len(suffix)]
                break
        else:
            stem = stem.rsplit(".", 1)[0] if "." in stem else ""
        renamed = _apply_rules(stem + ".", rules + _GENERIC_RULES)
        renamed = _finalize(renamed.rstrip("./"))
        path = f"{renamed}/{leaf}" if renamed else leaf
        if strict and re.search(r"/\d+(/|$)", path):
            raise KeyError(f"unmapped torch name: {key} -> {path}")
        flat[path] = val
    return flat


# ---------------------------------------------------------------------------
# top-level entry points
# ---------------------------------------------------------------------------

def port_codec_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """IntraNoAR state dict -> flat codec subtree (skips coder buffers
    plus the pytorch_msssim window should a torch version persist it)."""
    return port_state_dict(state, _CODEC_RULES,
                           skip=(r"^masks\.", r"bit_estimator", r"gaussian",
                                 r"^ssim\.", r"^z_vq\."))


def port_sd_unet_state(state: Dict[str, np.ndarray],
                       lora_rank: int = 64,
                       lora_alpha: float = 8.0) -> Dict[str, np.ndarray]:
    """model.safetensors (UNet + LoRA) -> flat unet subtree, LoRA merged."""
    state = merge_lora(state, lora_rank, lora_alpha)
    return port_state_dict(state, _SD_UNET_RULES)


def port_vae_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return port_state_dict(state, _VAE_RULES)


def port_vqgan_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    # quantize.embedding is an nn.Embedding weight: (K, D) stays as-is
    return port_state_dict(state, _VQGAN_RULES,
                           raw_keys=(r"^quantize\.embedding\.weight$",))


def port_codeformer_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Codeformer checkpoint (ref codec_module.py:472-503 naming) ->
    our models/codeformer.py tree. Swin pos_embedding stays (ws^2, ws^2)
    untransposed; the shifted-window additive masks are static on our
    side and skipped."""
    return port_state_dict(state, _CODEFORMER_RULES, skip=_SWIN_SKIP,
                           raw_keys=(r"\.pos_embedding$",))


def port_guidance_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """SDGuidance state dict (``guidance_ckpt`` warm-starts /
    ``model_2.safetensors`` of a stage-2 run, ref sd_guidance.py:56-146)
    -> flat guidance tree: ``real_unet``/``fake_unet`` are plain SD1.5
    UNets (standard diffusers naming), ``cls_pred_branch`` maps its
    nn.Sequential indices onto our ClsHead names. ``real_unet`` may be
    absent (the reference deletes it under ``gan_alone``)."""
    # non-parameter state the reference persists but we recompute
    # statically: the DDIM alphas_cumprod buffer (sd_guidance.py:89-92)
    # and the FSDP dummy_network placeholder (:71-73)
    _skip = ("alphas_cumprod", "dummy_network")
    subs: Dict[str, Dict[str, np.ndarray]] = {"real_unet": {},
                                              "fake_unet": {}}
    rest: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        head = k.split(".", 1)[0]
        if head in _skip:
            continue
        if head in subs:
            subs[head][k.split(".", 1)[1]] = v
        elif head == "cls_pred_branch":
            rest[k] = v
        else:
            raise KeyError(f"unknown guidance submodule in checkpoint: {k}")
    flat: Dict[str, np.ndarray] = {}
    for prefix, sd in subs.items():
        for kk, vv in port_state_dict(sd, _SD_UNET_RULES).items():
            flat[f"{prefix}/{kk}"] = vv
    flat.update(port_state_dict(rest, _CLS_HEAD_RULES))
    return flat


# ---------------------------------------------------------------------------
# tree assembly
# ---------------------------------------------------------------------------

def _load_state(src) -> Dict[str, np.ndarray]:
    if isinstance(src, dict):
        return src
    from safetensors.numpy import load_file
    return load_file(src)


def _flatten_leaves(tree, prefix: str = "") -> Dict:
    """Leaf-preserving flatten (unlike checkpoint.flatten_params): the
    reference tree may be jax.ShapeDtypeStructs from eval_shape."""
    out: Dict = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            out.update(_flatten_leaves(v, key))
    else:
        out[prefix] = tree
    return out


def _assemble(reference_params, fills: Dict[str, Dict[str, np.ndarray]],
              require_complete: Tuple[str, ...] = ()):
    """Overlay ported flat subtrees onto an initialized param tree.

    ``fills``: {submodule name ("" = tree root): flat {path: array}}.
    Every ported tensor must have a same-shaped home in the model tree;
    ``require_complete`` submodules must be FULLY covered — any leaf left
    at its initialized value raises.
    """
    from .checkpoint import unflatten_params

    flat_ref = _flatten_leaves(reference_params)
    out = dict(flat_ref)
    filled: set = set()
    for sub, flat_src in fills.items():
        base = f"params/{sub}" if sub else "params"
        for k, v in flat_src.items():
            full = f"{base}/{k}"
            if full not in flat_ref:
                raise KeyError(f"ported tensor has no home: {full}")
            if flat_ref[full].shape != v.shape:
                raise ValueError(
                    f"shape mismatch at {full}: ckpt {v.shape} vs "
                    f"model {flat_ref[full].shape}")
            out[full] = v.astype(flat_ref[full].dtype)
            filled.add(full)

    for sub in require_complete:
        missing = [k for k in flat_ref
                   if k.startswith(f"params/{sub}/") and k not in filled]
        if missing:
            raise KeyError(
                f"checkpoint does not cover {len(missing)} model tensors "
                f"under params/{sub}: {sorted(missing)[:8]} ...")
    return unflatten_params(out)


def port_onedc_checkpoint(unet_path: Optional[str] = None,
                          codec_path: Optional[str] = None,
                          vae_path: Optional[str] = None,
                          codeformer_path: Optional[str] = None,
                          reference_params=None,
                          require_complete: Tuple[str, ...] = ()):
    """Assemble a full OneDC param tree from reference checkpoint files.

    ``reference_params``: an initialized param tree used for structure and
    dtype validation; ported tensors must match its shapes exactly. Each
    ``*_path`` may be a file path or an in-memory torch-layout
    ``{name: array}`` state dict. ``require_complete``: submodule names
    ("unet", "codec", ...) whose model subtree must be FULLY covered by
    the checkpoint — any leaf left at its initialized value raises.
    """
    assert reference_params is not None
    fills: Dict[str, Dict[str, np.ndarray]] = {}
    if unet_path is not None:
        fills["unet"] = port_sd_unet_state(_load_state(unet_path))
    if codec_path is not None:
        fills["codec"] = port_codec_state(_load_state(codec_path))
    if vae_path is not None:
        fills["vae"] = port_vae_state(_load_state(vae_path))
    if codeformer_path is not None:
        fills["codeformer"] = port_codeformer_state(
            _load_state(codeformer_path))
    return _assemble(reference_params, fills, require_complete)


def port_guidance_checkpoint(path, reference_params,
                             require_complete: Tuple[str, ...] = (
                                 "fake_unet", "cls_pred_branch")):
    """``guidance_ckpt`` warm-start (ref model_sd15_with_codec_stage2.py:
    74-83, strict=True): overlay a reference SDGuidance state dict onto an
    initialized SDGuidance param tree. ``real_unet`` is required only when
    the checkpoint carries it (the reference may delete it)."""
    flat = port_guidance_state(_load_state(path))
    req = tuple(require_complete)
    if any(k.startswith("real_unet/") for k in flat) \
            and "real_unet" not in req:
        req = req + ("real_unet",)
    return _assemble(reference_params, {"": flat}, req)
