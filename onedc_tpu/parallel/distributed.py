"""Multi-host initialization and cross-host utilities.

The reference's multi-process story is `accelerate launch` + NCCL
(SURVEY.md section 2 parallelism table). The TPU-native equivalent is
single-controller JAX: each host runs the same program,
``jax.distributed.initialize()`` wires the hosts, and pjit-sharded arrays
span the full pod slice. No rank-conditional code paths are needed beyond
"only process 0 writes logs/checkpoints".
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX. On TPU pods all arguments are discovered
    from the environment; pass them explicitly for CPU/GPU clusters.
    Safe to call on a single host (no-op if already initialized).

    NOTE: must run before any other JAX API touches the backend —
    ``jax.process_count()`` itself would initialize a single-process
    backend and make the real initialization impossible, so the
    already-initialized check goes through ``jax.distributed`` state,
    never through the backend."""
    if jax.distributed.is_initialized():
        return
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    # TPU_WORKER_HOSTNAMES is set even on single-host TPU VMs — it only
    # signals a pod slice when it lists MULTIPLE workers
    multi_tpu = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not explicit and not multi_tpu and not any(
            os.environ.get(k) for k in
            ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
             "MEGASCALE_COORDINATOR_ADDRESS",
             "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE")):
        return  # single-host run, nothing to wire
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return
    try:  # env-discovered cluster: degrade to single-process on failure
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        import logging
        logging.getLogger("onedc_tpu").warning(
            "jax.distributed auto-init failed (%s); continuing "
            "single-process", e)


def is_main_process() -> bool:
    return jax.process_index() == 0


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (the reference's accelerator.wait_for_everyone)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def process_allgather(x):
    """Gather per-host values to every host (eval metric reduction)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)


def reduce_mean_across_hosts(metrics: dict) -> dict:
    """Mean-reduce a {name: scalar} dict across hosts (the reference's
    accelerator.reduce on the eval AvgDict, train_sd15_codec_stage1.py:
    231-258). Single-process: identity, no collective issued."""
    if jax.process_count() == 1 or not metrics:
        return metrics
    import numpy as np
    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys], np.float64)
    gathered = process_allgather(vals)  # (n_processes, n_keys)
    mean = np.mean(np.asarray(gathered), axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
