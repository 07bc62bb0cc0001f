"""Ray serialization helper.

This package is used from a repo checkout (not pip-installed), so Ray worker
processes can't import it by module path. ``ensure_serializable()`` registers
every loaded submodule with cloudpickle's pickle-by-value so map_batches
UDFs/actor classes ship self-contained to workers regardless of the driver's
PYTHONPATH. Called at the top of every pipeline entry point; idempotent.
"""

from __future__ import annotations

import sys

_registered: set = set()


def ensure_serializable():
    # incremental, NOT once-only: a submodule imported after the first
    # call (e.g. functions.partition pulled in by a later pipeline) must
    # still be registered or workers without the repo on PYTHONPATH fail
    # to unpickle UDFs referencing it
    try:
        from ray import cloudpickle
    except Exception:
        return
    pkg = __name__.rsplit(".", 1)[0]  # "whoosh_reloaded_ray"
    for name, mod in list(sys.modules.items()):
        if (
            mod is not None
            and name not in _registered
            and (name == pkg or name.startswith(pkg + "."))
        ):
            try:
                cloudpickle.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:
                pass


def actor_pool_size(divisor: int = 2, floor: int = 2) -> int:
    """Actor-pool concurrency derived from the cluster's CPU count
    (cpus // divisor, at least ``floor``) — stages must scale with the
    cluster, never a hardcoded cap (a fixed concurrency=2 starves 30 of
    32 cores)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(floor, cpus // divisor)


def consume_fault_flag(flag_path: str) -> None:
    """TEST-ONLY crash hook (fault-injection for the Ray restart paths).

    If ``flag_path`` exists, atomically consume it (os.rename — exactly one
    process wins) and kill THIS worker process with ``os._exit(1)``: a real
    mid-task process death, not a Python exception, so Ray's actor-restart
    + task-retry machinery is what recovers.  No-op when the flag file is
    absent, which is always true outside tests (the file lives inside the
    index dir and is only ever created by tests/test_fault_injection.py).
    """
    import os

    if not flag_path or not os.path.exists(flag_path):
        return
    try:
        os.rename(flag_path, flag_path + ".consumed")
    except OSError:
        return  # another worker already consumed it
    os._exit(1)
