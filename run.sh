#!/bin/sh
# One-command launcher (reference /root/reference/run.sh:1 role): venv
# bootstrap + asset check + WebUI.  Usage:
#   ./run.sh            # WebUI on :7865 (gradio if installed, else HTTP API)
#   ./run.sh serve ...  # streaming TCP daemon on :7866
#   ./run.sh bench      # single-chip benchmark (prints one JSON line)
set -e

cd "$(dirname "$0")"

if ! command -v python3 >/dev/null 2>&1; then
  echo "python3 not found — install Python >= 3.10 first." >&2
  exit 1
fi

PY=python3
VENV=".venv"
if [ ! -x "$VENV/bin/python" ]; then
  if ! $PY -c "import jax, flax, optax" >/dev/null 2>&1; then
    echo "[run] creating venv + installing deps..."
    $PY -m venv "$VENV"
    "$VENV/bin/pip" install --upgrade pip >/dev/null
    "$VENV/bin/pip" install jax flax optax numpy einops scipy tensorboardX
  fi
fi
[ -x "$VENV/bin/python" ] && PY="$VENV/bin/python"

export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$(pwd)"

# asset integrity check / download attempt (reference rvcmd role)
$PY -m tpu_rvc.utils.assets --root . || \
  echo "[run] assets missing/unverified — conversion with pretrained" \
       "models needs them; tools and random-weight paths still work"

case "${1:-web}" in
  web)
    [ $# -gt 0 ] && shift
    exec $PY apps/web.py "$@"
    ;;
  serve)
    shift
    exec $PY apps/serve.py "$@"
    ;;
  bench)
    exec $PY bench.py
    ;;
  *)
    exec $PY "$@"
    ;;
esac
