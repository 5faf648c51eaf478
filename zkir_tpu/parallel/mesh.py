"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default all).

    On multi-host slices the devices come from ``jax.devices()`` so the
    mesh spans hosts; collectives ride ICI within a slice and DCN across.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:n_devices]), (axis,))
