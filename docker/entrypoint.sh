#!/usr/bin/env bash
# Entrypoint for the semanticlidarunc_tpu container (analog of the
# reference's docker/entrypoint.sh). Modes:
#   smoke        — synthetic end-to-end train + test on whatever backend is
#                  present (TPU if /dev/accel* is mapped, else CPU), then a
#                  device report. The one-command fresh-machine check.
#   train|test|calibrate <cfg> [extra args...] — run the CLI.
#   bench        — the headline scans/s benchmark (needs a TPU).
#   tests        — full pytest suite on a virtual 8-device CPU mesh.
#   shell        — interactive bash.
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-smoke}"
shift || true

case "$mode" in
  smoke)
    python - <<'EOF'
import jax
print("devices:", jax.devices())
EOF
    python -m semanticlidarunc_tpu.cli.train_semantics \
        --cfg_path configs/Synthetic_smoke.yaml --mode train "$@"
    python -m semanticlidarunc_tpu.cli.train_semantics \
        --cfg_path configs/Synthetic_smoke.yaml --mode test "$@"
    echo "smoke OK"
    ;;
  train|test|calibrate)
    cfg="${1:?usage: $mode <cfg_path> [args...]}"
    shift
    python -m semanticlidarunc_tpu.cli.train_semantics \
        --cfg_path "$cfg" --mode "$mode" "$@"
    ;;
  bench)
    python bench.py
    ;;
  tests)
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
        python -m pytest tests/ -q "$@"
    ;;
  shell)
    exec bash
    ;;
  *)
    echo "unknown mode: $mode (smoke|train|test|calibrate|bench|tests|shell)" >&2
    exit 2
    ;;
esac
