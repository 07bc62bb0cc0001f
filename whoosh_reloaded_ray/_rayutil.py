"""Ray serialization helper.

This package is used from a repo checkout (not pip-installed), so Ray worker
processes can't import it by module path. ``ensure_serializable()`` registers
every loaded submodule with cloudpickle's pickle-by-value so map_batches
UDFs/actor classes ship self-contained to workers regardless of the driver's
PYTHONPATH. Called at the top of every pipeline entry point; idempotent.
"""

from __future__ import annotations

import sys

_done = False


def ensure_serializable():
    global _done
    if _done:
        return
    try:
        from ray import cloudpickle
    except Exception:
        return
    pkg = __name__.rsplit(".", 1)[0]  # "whoosh_reloaded_ray"
    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == pkg or name.startswith(pkg + ".")):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass
    _done = True
