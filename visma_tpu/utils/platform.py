"""Platform selection for CLI entry points.

The axon sitecustomize pins jax_platforms to the TPU; set
VISMA_TPU_PLATFORM=cpu (or tpu/axon) to override for a tool invocation.
"""
from __future__ import annotations

import os


def configure_platform() -> None:
    plat = os.environ.get("VISMA_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
