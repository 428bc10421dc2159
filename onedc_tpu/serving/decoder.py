"""Model-code-free λ-family serving decoder driven by AOT artifacts.

``ServingDecoder`` runs the PRODUCTION pipelined decode — the same
schedule as the live runtime (``serving/pipeline.py``) — from a bundle
directory written by ``python -m onedc_tpu.utils.aot`` plus a flat
safetensors weights file. It imports NO flax model code: the NN
programs are deserialized StableHLO (``utils/aot.py``), the host side
is the entropy package's rANS coder + byte framing, and the z stream
unpacks through the stateless FSQ bit-packing helpers.

This is the serving story the reference lacks (its serving = importing
the full torch training stack; ref src/inference.py:87-135): one
process, jax + artifacts + weights, no tracing, no compilation beyond
loading the portable programs.
"""

from __future__ import annotations

import json
import os
from typing import List

import jax
import jax.numpy as jnp

from ..entropy.coder import EntropyCoder
from ..entropy.framing import decode_i
from ..entropy.gaussian import GaussianConditionalCoder
from ..nn.fsq import FSQ  # stateless host bit-packing helpers only
from ..utils.aot import load_exported
from ..utils.checkpoint import load_safetensors
from .pipeline import DecodePrograms, pipelined_decode

_STAGES = ("begin", "update0", "update1", "update2", "update3",
           "x0", "vae")


def _make_stream_coders(master: GaussianConditionalCoder, y_streams):
    """One coder per y-bitstream sharing the master's CDF tables (the
    artifact twin of models/runtime.py:make_stream_coders)."""
    cdf_info = master.get_cdf_info()
    coders = []
    for ys in y_streams:
        ec = EntropyCoder()
        gc = GaussianConditionalCoder()
        gc.set_cdf_info(*cdf_info)
        gc.entropy_coder = ec
        gc.cdf_group_index = ec.add_cdf(*cdf_info)
        ec.set_stream(ys)
        coders.append(gc)
    return coders


class ServingDecoder:
    """Pipelined λ decode from a serving bundle.

    ``bundle_dir``: directory from ``utils/aot.py`` (begin/update*/x0/
    vae .stablehlo + meta.json). ``weights``: params pytree, or a path
    to a flat '/'-keyed safetensors (the CLI's --save-weights format).
    """

    def __init__(self, bundle_dir: str, weights):
        with open(os.path.join(bundle_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.batch = int(self.meta["batch"])
        self.ds = int(self.meta["ds"])
        self.pad_h = int(self.meta["height"])
        self.pad_w = int(self.meta["width"])
        self.fsq = FSQ(tuple(self.meta["z_fsq_levels"]))
        self._fns = {}
        # int8 update twins are optional (bundles exported before the
        # symbol-narrowing round lack them; the decoder then pins the
        # pipeline to int16 symbols)
        opt = [f"update{s}_i8" for s in range(4)]
        for name in list(_STAGES) + opt:
            path = os.path.join(bundle_dir, f"{name}.stablehlo")
            if name in opt and not os.path.exists(path):
                continue
            with open(path, "rb") as f:
                self._fns[name] = load_exported(f.read())
        self._has_i8 = all(n in self._fns for n in opt)

        if isinstance(weights, (str, os.PathLike)):
            weights = load_safetensors(weights)
        self.params = self._cast_params(weights,
                                        jnp.dtype(self.meta["dtype"]))

        self._coder = GaussianConditionalCoder()
        self._coder.update(force=True, entropy_coder=EntropyCoder())

    @staticmethod
    def _cast_params(weights, dt):
        def cast(x):
            a = jnp.asarray(x)
            return a.astype(dt) if a.dtype == jnp.float32 else a

        return jax.tree_util.tree_map(cast, weights)

    def _programs(self) -> DecodePrograms:
        p = self.params
        f = self._fns

        def step(yq, m, yh, c, _s):
            # the exported signature is fixed per artifact; pick the
            # int8 twin when the pipeline narrowed this chunk's symbols
            name = (f"update{_s}_i8" if jnp.asarray(yq).dtype == jnp.int8
                    else f"update{_s}")
            return f[name](p, yq, m, yh, c)

        return DecodePrograms(
            begin=lambda zi: f["begin"](p, zi),
            update=[
                (lambda yq, m, yh, c, _s=s: step(yq, m, yh, c, _s))
                for s in range(4)],
            x0=lambda yh, zs: f["x0"](p, yh, zs),
            vae=lambda x0: f["vae"](p, x0),
        )

    def decode_batch(self, streams: List[bytes]):
        """Containers -> list of (1,H,W,3) images in input order. Every
        stream must pad to the bundle's bucket size; the exported batch
        is fixed, so chunks are padded up to it (padding rows decode
        zero symbols and are trimmed — serving/pipeline.py)."""
        decs = [decode_i(s, self.fsq.index_bits, self.ds) for s in streams]
        for d in decs:
            if (d["pad_height"], d["pad_width"]) != (self.pad_h, self.pad_w):
                raise ValueError(
                    f"stream pads to {d['pad_height']}x{d['pad_width']}, "
                    f"bundle bucket is {self.pad_h}x{self.pad_w}")
        zh, zw = self.pad_h // self.ds, self.pad_w // self.ds

        preds = pipelined_decode(
            self._programs(),
            lambda ys: _make_stream_coders(self._coder, ys),
            lambda b: self.fsq.unpack_indices(b, zh * zw),
            decs, zh, zw,
            # fixed exported batch: every chunk pads up to it
            mult=self.batch, chunk=self.batch, vae_chunk=self.batch,
            # bundles without int8 update twins pin symbols to int16
            **({} if self._has_i8 else {"narrow": lambda parts: parts}))

        out = []
        for i, d in enumerate(decs):
            pl, pr, pt, pb = d["pad_tuple"]
            h = self.pad_h - pt - pb
            w = self.pad_w - pl - pr
            out.append(preds[i:i + 1, pt:pt + h, pl:pl + w, :].astype(
                jnp.float32))
        return out
