"""Full-layout checkpoint twins (VERDICT round-2 item 2).

Synthesizes COMPLETE torch state dicts with the exact key sets and shapes
of the reference's shipped checkpoint files, derived from the PUBLIC
layouts — the diffusers 0.32 ``UNet2DConditionModel`` (SD1.5 config) /
``UNet2DModel`` naming scheme, peft 0.14 LoRA adapter naming, and the
reference's own module definitions — NOT from our porter rules (that would
be circular):

- ``sd_unet_twin()``  == ``model.safetensors``: SD1.5 UNet after
  ``prepare_unet_for_codec`` (ref decoder_unet.py:371-408): replaced
  conv_in (320ch), added vae_reduction, peft LoRA rank-64/alpha-8 adapters
  on the reference target list (decoder_unet.py:331-368).
- ``codec_twin()``    == ``model_1.safetensors``: the full IntraNoAR tree
  (ref codec_module.py:184-230) including the encoder UNet
  (``UNet2DModel`` with replaced conv_in, encoder_unet.py:137-161).

Values are random; the twins validate NAME + SHAPE coverage end-to-end
through ``utils/port_torch.py`` (real weights are not on this zero-egress
image — see PARITY.md gap analysis).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

# reference LoRA config (decoder_unet.py:331-368); peft matches targets by
# fully-qualified-name suffix, conv_in is excluded (and replaced afterwards)
LORA_TARGETS = (
    "to_q", "to_k", "to_v", "to_out.0", "proj_in", "proj_out",
    "ff.net.0.proj", "ff.net.2", "conv1", "conv2", "conv_shortcut",
    "downsamplers.0.conv", "upsamplers.0.conv", "time_emb_proj",
)
LORA_RANK = 64


def _is_lora_target(name: str) -> bool:
    if "conv_in" in name or "vae_reduction" in name:
        return False
    return any(name == t or name.endswith("." + t) for t in LORA_TARGETS)


class _Builder:
    """Accumulates torch-layout leaves; optionally wraps targets in peft
    LoRA naming (base_layer + lora_A/lora_B.default)."""

    def __init__(self, seed: int, lora: bool = False, scale: float = 0.02):
        self.rng = np.random.default_rng(seed)
        self.scale = scale
        self.lora = lora
        self.out: Dict[str, np.ndarray] = {}

    def _w(self, *shape) -> np.ndarray:
        return (self.rng.standard_normal(shape) * self.scale).astype(
            np.float32)

    def conv(self, name: str, out_ch: int, in_ch: int, k: int = 3,
             bias: bool = True, groups: int = 1):
        w = self._w(out_ch, in_ch // groups, k, k)
        if self.lora and _is_lora_target(name):
            self.out[f"{name}.base_layer.weight"] = w
            if bias:
                self.out[f"{name}.base_layer.bias"] = self._w(out_ch)
            # peft conv LoRA: A mirrors the base kernel geometry, B is 1x1
            self.out[f"{name}.lora_A.default.weight"] = self._w(
                LORA_RANK, in_ch // groups, k, k)
            self.out[f"{name}.lora_B.default.weight"] = self._w(
                out_ch, LORA_RANK, 1, 1)
            return
        self.out[f"{name}.weight"] = w
        if bias:
            self.out[f"{name}.bias"] = self._w(out_ch)

    def linear(self, name: str, out_f: int, in_f: int, bias: bool = True):
        w = self._w(out_f, in_f)
        if self.lora and _is_lora_target(name):
            self.out[f"{name}.base_layer.weight"] = w
            if bias:
                self.out[f"{name}.base_layer.bias"] = self._w(out_f)
            self.out[f"{name}.lora_A.default.weight"] = self._w(
                LORA_RANK, in_f)
            self.out[f"{name}.lora_B.default.weight"] = self._w(
                out_f, LORA_RANK)
            return
        self.out[f"{name}.weight"] = w
        if bias:
            self.out[f"{name}.bias"] = self._w(out_f)

    def norm(self, name: str, ch: int):
        self.out[f"{name}.weight"] = self._w(ch)
        self.out[f"{name}.bias"] = self._w(ch)


# ---------------------------------------------------------------------------
# diffusers building blocks (torch naming)
# ---------------------------------------------------------------------------

def _resnet2d(b: _Builder, p: str, in_ch: int, out_ch: int, temb_ch: int):
    """diffusers ResnetBlock2D ('default')."""
    b.norm(f"{p}.norm1", in_ch)
    b.conv(f"{p}.conv1", out_ch, in_ch)
    b.linear(f"{p}.time_emb_proj", out_ch, temb_ch)
    b.norm(f"{p}.norm2", out_ch)
    b.conv(f"{p}.conv2", out_ch, out_ch)
    if in_ch != out_ch:
        b.conv(f"{p}.conv_shortcut", out_ch, in_ch, k=1)


def _attention_deprecated(b: _Builder, p: str, ch: int):
    """diffusers Attention in _from_deprecated_attn_block style
    (UNet2DModel blocks): group_norm + biased to_q/k/v/to_out.0."""
    b.norm(f"{p}.group_norm", ch)
    b.linear(f"{p}.to_q", ch, ch)
    b.linear(f"{p}.to_k", ch, ch)
    b.linear(f"{p}.to_v", ch, ch)
    b.linear(f"{p}.to_out.0", ch, ch)


def _transformer2d(b: _Builder, p: str, ch: int, context_dim: int):
    """diffusers Transformer2DModel, SD1.5 style (conv projections,
    depth 1, GEGLU ff, bias-free q/k/v)."""
    b.norm(f"{p}.norm", ch)
    b.conv(f"{p}.proj_in", ch, ch, k=1)
    t = f"{p}.transformer_blocks.0"
    b.norm(f"{t}.norm1", ch)
    b.linear(f"{t}.attn1.to_q", ch, ch, bias=False)
    b.linear(f"{t}.attn1.to_k", ch, ch, bias=False)
    b.linear(f"{t}.attn1.to_v", ch, ch, bias=False)
    b.linear(f"{t}.attn1.to_out.0", ch, ch)
    b.norm(f"{t}.norm2", ch)
    b.linear(f"{t}.attn2.to_q", ch, ch, bias=False)
    b.linear(f"{t}.attn2.to_k", ch, context_dim, bias=False)
    b.linear(f"{t}.attn2.to_v", ch, context_dim, bias=False)
    b.linear(f"{t}.attn2.to_out.0", ch, ch)
    b.norm(f"{t}.norm3", ch)
    b.linear(f"{t}.ff.net.0.proj", ch * 8, ch)  # GEGLU: 2 * 4ch
    b.linear(f"{t}.ff.net.2", ch, ch * 4)
    b.conv(f"{p}.proj_out", ch, ch, k=1)


# ---------------------------------------------------------------------------
# model.safetensors twin: SD1.5 UNet + LoRA + conv_in + vae_reduction
# ---------------------------------------------------------------------------

def _sd_unet_body(b: _Builder, ch: Sequence[int], context_dim: int,
                  layers_per_block: int):
    """Shared SD1.5 UNet2DConditionModel body (down/mid/up blocks)."""
    temb = ch[0] * 4
    # down: CrossAttn x3 + plain (SD1.5 config)
    for i, c in enumerate(ch):
        is_final = i == len(ch) - 1
        prev = ch[i - 1] if i else ch[0]
        for j in range(layers_per_block):
            _resnet2d(b, f"down_blocks.{i}.resnets.{j}",
                      prev if j == 0 else c, c, temb)
            if not is_final:
                _transformer2d(b, f"down_blocks.{i}.attentions.{j}", c,
                               context_dim)
        if not is_final:
            b.conv(f"down_blocks.{i}.downsamplers.0.conv", c, c)

    _resnet2d(b, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _transformer2d(b, "mid_block.attentions.0", ch[-1], context_dim)
    _resnet2d(b, "mid_block.resnets.1", ch[-1], ch[-1], temb)

    # up: plain + CrossAttn x3; resnet inputs follow the diffusers skip
    # arithmetic (unet_2d_condition.py): res_skip = input_channel on the
    # last layer, out_channel otherwise
    rev = list(reversed(ch))
    prev_out = ch[-1]
    for i, c in enumerate(rev):
        is_final = i == len(rev) - 1
        input_ch = rev[min(i + 1, len(rev) - 1)]
        for j in range(layers_per_block + 1):
            skip = input_ch if j == layers_per_block else c
            res_in = (prev_out if j == 0 else c) + skip
            _resnet2d(b, f"up_blocks.{i}.resnets.{j}", res_in, c, temb)
            if i > 0:
                _transformer2d(b, f"up_blocks.{i}.attentions.{j}", c,
                               context_dim)
        if not is_final:
            b.conv(f"up_blocks.{i}.upsamplers.0.conv", c, c)
        prev_out = c


def sd_unet_twin(seed: int = 0,
                 in_ch: int = 320, vae_ch: int = 4,
                 block_channels: Sequence[int] = (320, 640, 1280, 1280),
                 context_dim: int = 768,
                 layers_per_block: int = 2) -> Dict[str, np.ndarray]:
    b = _Builder(seed, lora=True)
    ch = list(block_channels)
    temb = ch[0] * 4

    # replaced conv_in (decoder_unet.py:390-393) — added AFTER the LoRA
    # adapter, so plain weights
    b.conv("conv_in", ch[0], in_ch)
    b.linear("time_embedding.linear_1", temb, ch[0])
    b.linear("time_embedding.linear_2", temb, temb)
    _sd_unet_body(b, ch, context_dim, layers_per_block)
    b.norm("conv_norm_out", ch[0])
    b.conv("conv_out", vae_ch, ch[0])

    # vae_reduction (decoder_unet.py:14-29), added after LoRA -> plain
    b.norm("vae_reduction.blocks.0", in_ch)
    b.conv("vae_reduction.blocks.2", in_ch, in_ch)
    b.norm("vae_reduction.blocks.3", in_ch)
    b.conv("vae_reduction.blocks.5", vae_ch, in_ch)
    b.conv("vae_reduction.short_cut", vae_ch, in_ch, k=1)
    return b.out


def sd15_plain_unet_twin(seed: int = 0,
                         block_channels: Sequence[int] = (320, 640,
                                                          1280, 1280),
                         context_dim: int = 768,
                         layers_per_block: int = 2,
                         in_ch: int = 4,
                         out_ch: int = 4) -> Dict[str, np.ndarray]:
    """Standard SD1.5 UNet2DConditionModel state dict (no LoRA, standard
    conv_in/out) — the guidance real/fake UNets (ref sd_guidance.py:56-69)."""
    b = _Builder(seed, lora=False)
    ch = list(block_channels)
    temb = ch[0] * 4
    b.conv("conv_in", ch[0], in_ch)
    b.linear("time_embedding.linear_1", temb, ch[0])
    b.linear("time_embedding.linear_2", temb, temb)
    _sd_unet_body(b, ch, context_dim, layers_per_block)
    b.norm("conv_norm_out", ch[0])
    b.conv("conv_out", out_ch, ch[0])
    return b.out


def guidance_twin(seed: int = 0,
                  block_channels: Sequence[int] = (320, 640, 1280, 1280),
                  context_dim: int = 768,
                  layers_per_block: int = 2,
                  with_real: bool = True) -> Dict[str, np.ndarray]:
    """SDGuidance state dict twin (ref sd_guidance.py:56-151): real/fake
    SD1.5 UNets + the SD1.5-branch cls_pred_branch Sequential."""
    out: Dict[str, np.ndarray] = {}
    prefixes = [("fake_unet", seed)]
    if with_real:
        prefixes.append(("real_unet", seed + 1))
    for prefix, s in prefixes:
        sd = sd15_plain_unet_twin(s, block_channels, context_dim,
                                  layers_per_block)
        out.update({f"{prefix}.{k}": v for k, v in sd.items()})
    b = _Builder(seed + 2)
    c = block_channels[-1]
    b.conv("cls_pred_branch.0", c, c, k=4)
    b.norm("cls_pred_branch.1", c)
    b.conv("cls_pred_branch.3", c, c, k=4)
    b.norm("cls_pred_branch.4", c)
    b.conv("cls_pred_branch.6", 1, c, k=1)
    out.update(b.out)
    # non-parameter state the reference persists: the DDIM alphas_cumprod
    # buffer (sd_guidance.py:89-92) and the FSDP dummy_network placeholder
    # (:71-73) — the porter must SKIP these, not error
    out["alphas_cumprod"] = np.linspace(0.9991, 0.0047, 1000,
                                        dtype=np.float32)
    out["dummy_network.fc.weight"] = np.zeros((4, 4), np.float32)
    out["dummy_network.fc.bias"] = np.zeros((4,), np.float32)
    return out


# ---------------------------------------------------------------------------
# reference block libraries (torch naming)
# ---------------------------------------------------------------------------

def _dcb4(b: _Builder, p: str, in_ch: int, out_ch: int):
    """DepthConvBlock4 = DepthConv + ConvFFN3 (dcvc.py)."""
    b.conv(f"{p}.block.0.conv1.0", in_ch, in_ch, k=1)
    b.conv(f"{p}.block.0.depth_conv", in_ch, in_ch, k=3, groups=in_ch)
    b.conv(f"{p}.block.0.conv2", out_ch, in_ch, k=1)
    if in_ch != out_ch:
        b.conv(f"{p}.block.0.adaptor", out_ch, in_ch, k=1)
    b.conv(f"{p}.block.1.conv", out_ch * 4, out_ch, k=1)
    b.conv(f"{p}.block.1.conv_out", out_ch, out_ch * 2, k=1)


def _rbu(b: _Builder, p: str, in_ch: int, out_ch: int, r: int = 2):
    """ResidualBlockUpsample (dcvc.py:183-205)."""
    b.conv(f"{p}.subpel_conv.0", out_ch * r * r, in_ch, k=1)
    b.conv(f"{p}.conv", out_ch, out_ch)
    b.conv(f"{p}.upsample.0", out_ch * r * r, in_ch, k=1)


def _vq_resnet(b: _Builder, p: str, in_ch: int, out_ch: int = None):
    """vqgan/blocks.py ResnetBlock: bias-free convs; nin_shortcut only
    when channels change (and over the TRANSFORMED tensor: out->out)."""
    out_ch_ = in_ch if out_ch is None else out_ch
    b.norm(f"{p}.norm1", in_ch)
    b.conv(f"{p}.conv1", out_ch_, in_ch, bias=False)
    b.norm(f"{p}.norm2", out_ch_)
    b.conv(f"{p}.conv2", out_ch_, out_ch_, bias=False)
    if in_ch != out_ch_:
        b.conv(f"{p}.nin_shortcut", out_ch_, out_ch_, k=1, bias=False)


def _vq_attn(b: _Builder, p: str, ch: int):
    """vqgan/blocks.py AttnBlock: 1x1 conv q/k/v/proj_out."""
    b.norm(f"{p}.norm", ch)
    for m in ("q", "k", "v", "proj_out"):
        b.conv(f"{p}.{m}", ch, ch, k=1)


def _encoder_unet(b: _Builder, p: str, in_ch: int, out_ch: int,
                  ch_config: Sequence[int], layers_per_block: int = 2):
    """UNet2DModel after prepare_unet_encoder (encoder_unet.py:137-161):
    replaced conv_in (3 local ResnetBlocks + stride-2 conv), AttnDown/
    AttnDown/Down, mid w/ attn, AttnUp/AttnUp/Up (deepest-first)."""
    ch0 = ch_config[0]
    temb = ch0 * 4

    # encoder_unet.py local ResnetBlock == the vqgan ResnetBlock layout
    _vq_resnet(b, f"{p}.conv_in.0", in_ch, ch0)
    _vq_resnet(b, f"{p}.conv_in.1", ch0, ch0)
    _vq_resnet(b, f"{p}.conv_in.2", ch0, ch0)
    b.conv(f"{p}.conv_in.3", ch0, ch0)

    b.linear(f"{p}.time_embedding.linear_1", temb, ch0)
    b.linear(f"{p}.time_embedding.linear_2", temb, temb)

    down_attn = (True, True, False)
    ch = list(ch_config)
    for i, c in enumerate(ch):
        is_final = i == len(ch) - 1
        prev = ch[i - 1] if i else ch[0]
        for j in range(layers_per_block):
            _resnet2d(b, f"{p}.down_blocks.{i}.resnets.{j}",
                      prev if j == 0 else c, c, temb)
            if down_attn[i]:
                _attention_deprecated(
                    b, f"{p}.down_blocks.{i}.attentions.{j}", c)
        if not is_final:
            b.conv(f"{p}.down_blocks.{i}.downsamplers.0.conv", c, c)

    _resnet2d(b, f"{p}.mid_block.resnets.0", ch[-1], ch[-1], temb)
    _attention_deprecated(b, f"{p}.mid_block.attentions.0", ch[-1])
    _resnet2d(b, f"{p}.mid_block.resnets.1", ch[-1], ch[-1], temb)

    # up_block_types=("AttnUpBlock2D","AttnUpBlock2D","UpBlock2D"),
    # applied deepest-first (diffusers unet_2d.py)
    up_attn = (True, True, False)
    rev = list(reversed(ch))
    prev_out = ch[-1]
    for i, c in enumerate(rev):
        is_final = i == len(rev) - 1
        input_ch = rev[min(i + 1, len(rev) - 1)]
        for j in range(layers_per_block + 1):
            skip = input_ch if j == layers_per_block else c
            res_in = (prev_out if j == 0 else c) + skip
            _resnet2d(b, f"{p}.up_blocks.{i}.resnets.{j}", res_in, c, temb)
            if up_attn[i]:
                _attention_deprecated(
                    b, f"{p}.up_blocks.{i}.attentions.{j}", c)
        if not is_final:
            b.conv(f"{p}.up_blocks.{i}.upsamplers.0.conv", c, c)
        prev_out = c

    b.norm(f"{p}.conv_norm_out", ch0)
    b.conv(f"{p}.conv_out", out_ch, ch0)


# ---------------------------------------------------------------------------
# model_1.safetensors twin: full IntraNoAR
# ---------------------------------------------------------------------------

def codec_twin(seed: int = 1,
               cond_ch: int = 4, ctrl_ch: int = 320,
               internal_ch: int = 512, bottleneck_ch: int = 128,
               unet_ch_config: Sequence[int] = (512, 768, 768),
               n_z: int = 7) -> Dict[str, np.ndarray]:
    b = _Builder(seed, lora=False)
    n = bottleneck_ch
    sem = unet_ch_config[-1]
    ch16 = unet_ch_config[0]
    emb = 192

    # Encoder (codec_module.py:51-85)
    b.conv("enc.pix_emb", emb, 3, k=8)
    b.conv("enc.pix_fusion", ctrl_ch, emb + cond_ch, k=1)
    _encoder_unet(b, "enc.unet", ctrl_ch, ch16, unet_ch_config)
    _vq_resnet(b, "enc.trans_coding.0", ch16)
    _vq_attn(b, "enc.trans_coding.1", ch16)
    _vq_resnet(b, "enc.trans_coding.2", ch16)
    _dcb4(b, "enc.trans_coding.3", ch16, ch16)
    _dcb4(b, "enc.trans_coding.4", ch16, n)

    # Decoder (codec_module.py:88-116)
    ch8 = internal_ch // 2
    _dcb4(b, "dec.trans_coding.0", n, internal_ch)
    _dcb4(b, "dec.trans_coding.1", internal_ch, internal_ch)
    for i in range(3):
        _vq_resnet(b, f"dec.blocks.{i}", internal_ch)
    b.conv("dec.blocks.3", internal_ch * 4, internal_ch, k=1)
    b.conv("dec.blocks.5", ch8, internal_ch, k=3)
    for i in range(3):
        _vq_resnet(b, f"dec.blocks.{6 + i}", ch8)
    _rbu(b, "dec.sem_up.0", sem, internal_ch)
    _dcb4(b, "dec.sem_up.1", internal_ch, internal_ch)
    _rbu(b, "dec.sem_up.2", internal_ch, ch8)
    _dcb4(b, "dec.sem_up.3", ch8, ch8)
    _rbu(b, "dec.sem_up.4", ch8, ch8)
    _dcb4(b, "dec.conv_out", ch8 * 2, ctrl_ch)

    # SemanticAdaptor (codec_module.py:169-181)
    _dcb4(b, "semantic_adaptor.to_semantic.0", n, sem)
    _vq_resnet(b, "semantic_adaptor.to_semantic.1", sem)
    _vq_attn(b, "semantic_adaptor.to_semantic.2", sem)
    _vq_attn(b, "semantic_adaptor.to_semantic.3", sem)
    _vq_resnet(b, "semantic_adaptor.to_semantic.4", sem)
    _vq_attn(b, "semantic_adaptor.to_semantic.5", sem)
    _vq_attn(b, "semantic_adaptor.to_semantic.6", sem)
    _dcb4(b, "semantic_adaptor.to_semantic.7", sem, sem)

    # HyperEncoder (codec_module.py:119-142)
    _dcb4(b, "hyper_enc.y_trans_coding.0", n, n)
    b.conv("hyper_enc.y_trans_coding.1", n, n)
    _dcb4(b, "hyper_enc.y_trans_coding.2", n, n)
    b.conv("hyper_enc.y_trans_coding.3", n, n)
    _dcb4(b, "hyper_enc.fusion.0", n + sem, sem)
    _vq_attn(b, "hyper_enc.fusion.1", sem)
    _dcb4(b, "hyper_enc.fusion.2", sem, internal_ch)
    _vq_attn(b, "hyper_enc.fusion.3", internal_ch)
    _dcb4(b, "hyper_enc.fusion.4", internal_ch, internal_ch)
    b.conv("hyper_enc.fusion.5", n_z, internal_ch, k=1)

    # HyperDecoder (codec_module.py:145-166)
    b.conv("hyper_dec.feat_in.0", n, n_z, k=1)
    _dcb4(b, "hyper_dec.to_entropy.0", n, n)
    _rbu(b, "hyper_dec.to_entropy.1", n, n)
    _dcb4(b, "hyper_dec.to_entropy.2", n, n)
    _rbu(b, "hyper_dec.to_entropy.3", n, n)
    _dcb4(b, "hyper_dec.to_entropy.4", n, n)

    # four-part prior heads (codec_module.py:205-217)
    _dcb4(b, "y_prior_fusion.0", n, n * 2)
    _dcb4(b, "y_prior_fusion.1", n * 2, n * 2)
    b.conv("y_spatial_prior_reduction", n, n * 2, k=1)
    for i in (1, 2, 3):
        _dcb4(b, f"y_spatial_prior_adaptor_{i}", n * 2, n * 2)
    for i in range(3):
        _dcb4(b, f"y_spatial_prior.{i}", n * 2, n * 2)
    return b.out
