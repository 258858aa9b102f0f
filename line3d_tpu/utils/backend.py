"""Shared backend-selection rule for "auto" config knobs.

diffusion_backend / refine_backend both mean: run the jitted device
formulation when an accelerator is present, keep the float64 host
reference path on CPU (tests / golden runs).  One helper so the platform
list cannot drift between subsystems.
"""
from __future__ import annotations


def resolve_auto_backend(value: str) -> str:
    """"auto" -> "device" on a TPU backend (incl. the axon tunnel),
    "host" otherwise; explicit values pass through."""
    if value != "auto":
        return value
    import jax
    try:
        return "device" if jax.default_backend() in ("tpu", "axon") \
            else "host"
    except Exception:
        return "host"
