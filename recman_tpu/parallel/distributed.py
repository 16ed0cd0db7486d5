"""Multi-host runtime bootstrap.

The reference is single-process (SURVEY.md §2.8); this is the thin
host-side control layer a pod-slice run needs. All data-plane
communication is XLA collectives over ICI/DCN — there is no user-level
transport (no NCCL/MPI analog required on TPU).

Typical multi-host entry:

    from recman_tpu.parallel import initialize_cluster, make_mesh
    initialize_cluster()          # no-op on a single host
    mesh = make_mesh(model=4)     # global mesh over all hosts' devices
    trainer = ShardedTrainer(model, mesh=mesh, ...)

On Cloud TPU the coordinator address / process ids come from the
environment, so ``jax.distributed.initialize()`` needs no arguments.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def initialize_cluster(coordinator_address=None, num_processes=None,
                       process_id=None, timeout_s=300) -> bool:
    """Initialize jax.distributed when running multi-process; returns
    whether a multi-process runtime is active. Safe to call on one host.
    """
    # check the distributed client WITHOUT jax.process_count(): that call
    # initializes the XLA backend, after which jax.distributed.initialize
    # refuses to run (it must precede any backend touch)
    try:
        from jax._src import distributed as _dist_state

        state = getattr(_dist_state, "global_state", None)
        if state is None:
            # jax._src.distributed reorganized: we can no longer tell
            # whether initialize already ran — fall through and let the
            # guarded initialize below decide
            raise ImportError("jax._src.distributed.global_state absent")
        if getattr(state, "client", None) is not None:
            return jax.process_count() > 1
    except ImportError:  # pragma: no cover - internal layout changed
        pass
    if coordinator_address is None and num_processes is None:
        import os

        if not any(
            v in os.environ
            for v in ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            log.info("single-process run; skipping jax.distributed.initialize")
            return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(
            initialization_timeout=timeout_s, **kwargs
        )
    except RuntimeError as e:  # pragma: no cover - depends on jax internals
        # "already initialized" can reach here if the pre-check above lost
        # visibility into jax internals (ADVICE r3); degrade gracefully
        if "already" in str(e).lower():
            log.warning("jax.distributed already initialized: %s", e)
        else:
            raise
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def enable_debug_checks(nans=True, infs=False):
    """Numerical-debug mode (SURVEY.md §5 race-detection/sanitizer row):
    make any NaN/Inf produced under jit raise immediately."""
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_debug_infs", bool(infs))
