"""Benchmark drivers. The container's sitecustomize pins jax to the TPU
backend regardless of JAX_PLATFORMS; honor the env var here so
`JAX_PLATFORMS=cpu python -m benchmarks.<driver>` works as expected."""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
