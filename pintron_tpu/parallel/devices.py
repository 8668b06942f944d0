"""Backend (re)pointing helpers.

Import-light on purpose: pulling in the mesh/ops modules can initialize
a JAX backend as a side effect, after which the platform can no longer
be switched.  Callers that need a virtual CPU mesh must call
``ensure_virtual_cpu_devices`` BEFORE importing anything that touches
device arrays.
"""

from __future__ import annotations

import os


def ensure_virtual_cpu_devices(n: int) -> int:
    """Re-point JAX at an ``n``-device virtual CPU platform, even when a
    sitecustomize preselected another platform (the tests/conftest.py
    pattern).  Only works before the first backend initialization.
    Returns the resulting device count; on failure the environment and
    platform config are RESTORED so the caller's process keeps its real
    accelerator (it typically falls back to a clean subprocess)."""
    import jax
    saved = {k: os.environ.get(k) for k in ("XLA_FLAGS", "JAX_PLATFORMS")}
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb
        if _xb.backends_are_initialized():
            _xb._clear_backends()
    except Exception:
        pass
    got = len(jax.devices())
    if got < n:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        try:
            jax.config.update("jax_platforms", saved.get("JAX_PLATFORMS"))
            from jax._src import xla_bridge as _xb
            if _xb.backends_are_initialized():
                _xb._clear_backends()
        except Exception:
            pass
    return got
