"""Multi-host (multi-process) training support over DCN.

The reference scales training by spawning one process per GPU and wiring
them with NCCL (single machine) or gloo + a hand-built TCPStore
(infer/modules/train/train.py:102-217).  The TPU-native equivalent is
`jax.distributed.initialize`: every host runs the SAME `run_training`
call, the runtime stitches all hosts' chips into one global device set,
and the (data, model) mesh simply spans it — XLA routes gradient psums
over ICI within a slice and DCN across slices.  No transport code is
needed here; what IS needed host-side:

1. each host feeds only its own rows of every global batch via
   `BucketBatcher.epoch_local_slice(epoch, process_index, process_count)`
   — every host derives the IDENTICAL global batch plan and slices
   rank::world rows *within* each batch, so all hosts step through the
   same number of batches with the same bucket shapes (the lockstep the
   jitted SPMD program requires; partitioning the dataset per host
   BEFORE bucketing would desync batch counts/shapes and hang the
   collectives), and
2. those host-local rows are assembled into one *global* sharded array
   via `global_batch_from_local` /
   `jax.make_array_from_process_local_data` (a plain device_put of
   the full batch is impossible: no host holds the full batch).

Launch (identical on every host):

    python -m apps.cli.train train ... \
        --coordinator <host0-ip>:1234 --num-processes 4 --process-id $i

or rely on the TPU pod metadata auto-detection by passing
`--multihost` alone (jax.distributed.initialize() with no args).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (idempotent).

    With no arguments, defers to jax.distributed.initialize()'s
    environment auto-detection (TPU pod metadata / cluster env vars) —
    the normal path on Cloud TPU slices.  Explicit arguments mirror the
    reference's MASTER_ADDR/RANK/WORLD_SIZE contract (train.py:145-217).
    """
    global _initialized
    if _initialized:
        return
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    _initialized = True
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch_from_local(batch: Dict[str, Any],
                            sharding) -> Dict[str, Any]:
    """Assemble one GLOBAL batch-sharded array per leaf from this host's
    local rows.

    Single-process: equivalent to jax.device_put(leaf, sharding) on the
    full batch.  Multi-process: each host passes only its rank::world
    rows (1/process_count of the global batch) and the result is a
    global jax.Array whose addressable shards hold exactly this host's
    data — zero cross-host data movement at load time.
    """
    if jax.process_count() == 1:
        import jax.numpy as jnp
        return {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
            for k, v in batch.items()}


def is_primary() -> bool:
    """True on the process that owns checkpoint writes / logging
    (reference rank-0 role, train.py:604)."""
    return jax.process_index() == 0


def assert_same_across_hosts(value: int, what: str) -> int:
    """Verify an integer agrees on every host; returns rank 0's value.

    Used for resume: only rank 0 writes checkpoints, so on a pod without
    a shared exp_dir the other hosts would silently start at epoch 0
    with fresh params while rank 0 resumes — divergent step counts hang
    the SPMD collectives much later with no diagnosis.  Fail loudly at
    startup instead and tell the operator to share the checkpoint.
    """
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    r0 = int(multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.int32)))
    if r0 != value:
        raise RuntimeError(
            f"multihost desync: {what} is {value} on process "
            f"{jax.process_index()} but {r0} on rank 0 — the experiment "
            "dir (checkpoints) must be visible to every host, e.g. on "
            "shared storage")
    return r0
