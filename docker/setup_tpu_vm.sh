#!/usr/bin/env bash
# Bare-metal (no container) bring-up on a fresh Cloud TPU VM — the
# one-command equivalent of building the Docker image, for hosts where
# docker is unavailable. Mirrors docker/Dockerfile exactly.
#
#   bash docker/setup_tpu_vm.sh [venv_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
venv="${1:-.venv}"

python3 -m venv "$venv"
# shellcheck disable=SC1091
source "$venv/bin/activate"
pip install --upgrade pip
pip install -r requirements-pinned.txt
pip install 'jax[tpu]==0.9.0' \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

python - <<'EOF'
import jax
print("jax", jax.__version__, "devices:", jax.devices())
EOF

# smoke: synthetic end-to-end train + test (no dataset needed)
python -m semanticlidarunc_tpu.cli.train_semantics \
    --cfg_path configs/Synthetic_smoke.yaml --mode train
python -m semanticlidarunc_tpu.cli.train_semantics \
    --cfg_path configs/Synthetic_smoke.yaml --mode test
echo "setup OK — activate with: source $venv/bin/activate"
