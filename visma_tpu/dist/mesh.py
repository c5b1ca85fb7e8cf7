"""Mesh helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: int = None, axis: str = "d") -> Mesh:
    """1-D data mesh over the first n devices (landmark/frame sharding
    axis). Multi-host: call within jax.distributed-initialized processes;
    the devices list is global."""
    devs = jax.devices()[: (n_devices or jax.device_count())]
    return Mesh(np.asarray(devs), (axis,))
