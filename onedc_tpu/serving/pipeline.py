"""Software-pipelined λ-family decode over a stream of images.

This is THE serving schedule (SURVEY section 7.6; ref serial loop
``src/models/.../codec_module.py:418-454``): the four-part prior's host
rANS <-> device ping-pong cannot overlap within ONE image (true data
dependency), and the device queue is a single FIFO — so overlap comes
from dispatch ORDER across images. The two big NN stages (x0 = codec
finish + UNet, then VAE) of chunk i are enqueued BETWEEN the
prior-update programs of chunk i+1; each host fetch waits only on the
small update that precedes the big stage in the queue, so the host runs
chunk i+1's rANS while the device chews chunk i's NN.

The loop is parameterized over the device programs, so the SAME
schedule drives both:
- the live runtime (params-bound jitted flax methods —
  ``models/onedc.py:OneDCRuntime._decode_bucket_pipelined``), and
- a model-code-free serving process calling deserialized StableHLO
  artifacts (``serving/decoder.py:ServingDecoder``).
Outputs match the serial single decode to float epsilon
(tests/test_onedc.py::test_decode_batch_matches_sequential).
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


class DecodePrograms(NamedTuple):
    """Device programs of the staged λ decode (params already bound).

    begin:  z_indices (B,H/64,W/64) i32 ->
            {y_hat, means, common, z_semantic, indexes_r}
    update: 4 step programs, (y_q_r, means, y_hat, common) ->
            {y_hat, means, indexes_r}
    x0:     (y_hat, z_semantic) -> x0 (B,H/8,W/8,4)
    vae:    x0 -> image (B,H,W,3)
    """

    begin: Callable[[Any], Dict[str, Any]]
    update: Sequence[Callable[[Any, Any, Any, Any], Dict[str, Any]]]
    x0: Callable[[Any, Any], Any]
    vae: Callable[[Any], Any]


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    rem = (-arr.shape[0]) % multiple
    if rem:
        arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)])
    return arr


def _narrow_symbols(parts: np.ndarray) -> np.ndarray:
    """Ship decoded rANS symbols as int8 when they fit.

    Trained lambda-family streams concentrate on tiny symbols ({0,+-1,+-2}
    at the shipped bpp band — VERDICT r4 weak item 3), so the int16 the
    native coder emits wastes half of THE hot host->device upload of the
    serial four-part loop. The update programs cast to the compute dtype
    either way (models/codec.py:decompress_update), so each dtype is just
    one more cached jit signature; rare big-symbol chunks (e.g. the
    uncalibrated 9.5 bpp A/B streams) keep the exact int16 path.
    ONEDC_SYMBOL_I8=0 restores int16-always for A/Bs."""
    if os.environ.get("ONEDC_SYMBOL_I8", "1") != "0" \
            and parts.dtype == np.int16 \
            and parts.min() >= -128 and parts.max() <= 127:
        return parts.astype(np.int8)
    return parts


def pipelined_decode(programs: DecodePrograms, make_coders, unpack_z,
                     decs, zh: int, zw: int, *, mult: int = 1,
                     put: Optional[Callable] = None,
                     chunk: Optional[int] = None,
                     depth: Optional[int] = None,
                     vae_chunk: Optional[int] = None,
                     narrow: Callable = _narrow_symbols):
    """Decode one same-padded-size bucket of containers, pipelined.

    ``decs``: framing dicts (entropy/framing.decode_i) with
    ``bit_stream_z`` / ``bit_stream_y``. ``make_coders(streams)`` builds
    one host rANS coder per stream (class must expose
    ``decode_streams_with_indexes``). ``unpack_z(bytes)`` unpacks one
    z-stream to ``zh*zw`` FSQ indices. ``mult``/``put``: mesh data-axis
    sharding (chunks pad to a shardable batch; padding rows decode zero
    symbols and are trimmed). Returns the concatenated padded images.

    Knobs (env defaults, measured on the v5e tunnel chip at 768px
    flagship bf16 — BENCH_r03/r04, ROADMAP):
    - ONEDC_PIPELINE_CHUNK (8): images per prior-loop batch. chunk=8
      beats 4/2/1 (7.94 > 5.48 > 4.81 > 4.28 /s round 3); the VAE split
      below lets the chunk grow past the VAE HBM budget.
    - ONEDC_PIPELINE_DEPTH (3): in-flight chunks; their prior loops
      advance in lockstep so one chunk's index fetch completes WHILE
      the host runs the others' rANS (depth 1/2/3 = 6.8/10.7/11.0 /s).
    - ONEDC_VAE_CHUNK (8): VAE sub-batch. The VAE stage dominates peak
      HBM (768x768x128 bf16 activations/image); sub-dispatching it
      keeps each program within the B=8 activation budget while the
      prior/UNet chunk runs larger (fewer host round trips per image).
    """
    if chunk is None:
        chunk = int(os.environ.get("ONEDC_PIPELINE_CHUNK", "8"))
    if depth is None:
        depth = max(1, int(os.environ.get("ONEDC_PIPELINE_DEPTH", "3")))
    if vae_chunk is None:
        vae_chunk = max(1, int(os.environ.get("ONEDC_VAE_CHUNK", "8")))
    if put is None:
        import jax
        put = jax.device_put

    chunks = [decs[i:i + chunk] for i in range(0, len(decs), chunk)]

    pending: deque = deque()
    x0s: Dict[int, Any] = {}
    vae_parts: Dict[int, dict] = {}
    outs: Dict[int, Any] = {}

    def mk_x0(ci, y_hat, z_sem):
        def f():
            x0s[ci] = programs.x0(y_hat, z_sem)
        return f

    def mk_vae(ci, pi, lo, hi, nparts):
        def f():
            part = programs.vae(x0s[ci][lo:hi])
            vae_parts.setdefault(ci, {})[pi] = part
            if len(vae_parts[ci]) == nparts:
                parts = vae_parts.pop(ci)
                x0s.pop(ci)
                outs[ci] = (parts[0] if nparts == 1 else
                            jnp.concatenate(
                                [parts[i] for i in range(nparts)]))
        return f

    class _ChunkSM:
        """Four-part prior loop for one chunk, one step at a time.

        fetch + rANS run as a FUTURE in a worker thread: the index
        fetch's real cost is waiting for its update program to reach
        the front of the strict-FIFO device queue (~60 ms behind an
        interleaved big stage, measured by cProfile round 3) — with
        one future per in-flight chunk those waits run CONCURRENTLY
        and the main thread only dispatches device work. The worker
        decodes the chunk's streams serially (single-core host; a
        per-stream pool.map adds overhead, not parallelism).
        """

        def __init__(sm, ci, cd, workers):
            sm.ci, sm.workers, sm.n = ci, workers, len(cd)
            z_indices = _pad_rows(np.stack([
                np.asarray(unpack_z(d["bit_stream_z"])).reshape(zh, zw)
                for d in cd]), mult)
            sm.n_rows = z_indices.shape[0]
            sm.coders = make_coders([d["bit_stream_y"] for d in cd])
            st = programs.begin(put(jnp.asarray(z_indices)))
            sm.y_hat, sm.means = st["y_hat"], st["means"]
            sm.common, sm.z_semantic = st["common"], st["z_semantic"]
            sm.step = 0
            sm._issue(st["indexes_r"])

        def _issue(sm, idx_dev):
            idx_dev.copy_to_host_async()

            def work():
                idx = np.asarray(idx_dev)
                # one native call decodes the whole chunk's streams;
                # mesh-padding rows (no coder) get zero symbols
                parts = type(sm.coders[0]).decode_streams_with_indexes(
                    sm.coders,
                    idx[:sm.n].reshape(sm.n, -1)).reshape(idx[:sm.n].shape)
                if sm.n_rows > sm.n:
                    parts = np.concatenate(
                        [parts, np.zeros_like(idx[sm.n:],
                                              dtype=parts.dtype)])
                return put(narrow(parts))

            sm.fut = sm.workers.submit(work)

        def ready(sm):
            return sm.fut.done()

        def advance(sm):
            """Run one prior step; True while more steps remain."""
            parts = sm.fut.result()  # already on device (worker put it)
            nxt = programs.update[sm.step](parts,
                                           sm.means, sm.y_hat, sm.common)
            sm.y_hat, sm.means = nxt["y_hat"], nxt["means"]
            sm.step += 1
            if sm.step < 4:
                sm._issue(nxt["indexes_r"])
                return True
            pending.append(mk_x0(sm.ci, sm.y_hat, sm.z_semantic))
            bounds = list(range(0, sm.n_rows, vae_chunk))
            for pi, lo in enumerate(bounds):
                pending.append(mk_vae(sm.ci, pi, lo,
                                      min(lo + vae_chunk, sm.n_rows),
                                      len(bounds)))
            return False

    with ThreadPoolExecutor(max_workers=depth) as workers:
        todo = deque(enumerate(chunks))
        live: deque = deque()
        while todo or live:
            while todo and len(live) < depth:
                live.append(_ChunkSM(*todo.popleft(), workers))
            # prefer a chunk whose symbols are already decoded; while
            # none is ready, keep the device fed with a big stage,
            # then block on the oldest
            sm = next((s for s in live if s.ready()), None)
            if sm is None and pending:
                pending.popleft()()
                sm = next((s for s in live if s.ready()), None)
            if sm is None:
                sm = live[0]
            live.remove(sm)
            more = sm.advance()
            # one big NN stage of an EARLIER chunk rides behind each
            # small update: the next fetch waits only on the update,
            # and the workers' rANS overlaps the big stage's execution
            if pending:
                pending.popleft()()
            if more:
                live.append(sm)
        while pending:
            pending.popleft()()
    # trim each chunk's mesh-padding rows before stitching
    return jnp.concatenate([outs[ci][:len(chunks[ci])]
                            for ci in range(len(chunks))], axis=0)
