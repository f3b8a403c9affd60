#!/usr/bin/env bash
# TPU-VM environment setup — the reference ships a Docker image building
# PALISADE/GMP/Crypto++ (reference Dockerfile:1-44); the TPU framework
# needs only jax[tpu] plus a C++ toolchain for the native Paillier
# kernels (built automatically on first import).
set -euo pipefail

python3 -m pip install --upgrade pip
# TPU wheels; on CPU-only dev boxes use: pip install jax
python3 -m pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
python3 -m pip install numpy optax pytest

# native toolchain for fhe_fed_tpu/native (no GMP needed)
if ! command -v g++ >/dev/null; then
    sudo apt-get update && sudo apt-get install -y g++
fi

python3 -m pip install -e .
python3 -c "import fhe_fed_tpu, jax; print('fhe_fed_tpu', fhe_fed_tpu.__version__, 'devices', jax.devices())"
