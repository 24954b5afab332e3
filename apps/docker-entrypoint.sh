#!/bin/sh
# Container entrypoint: asset check, then the requested service.
#   web   — WebUI/API server on :7865 (default)
#   serve — streaming TCP daemon on :7866
#   any other argv — exec'd verbatim (e.g. a CLI: apps/cli/convert.py ...)
set -e

cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$(pwd)"

# integrity-check (and, when the network allows, fetch) core assets —
# reference run flow: check_all_assets before web.py (rvcmd role)
python -m tpu_rvc.utils.assets --root . || \
  echo "[entrypoint] assets missing/unverified — mount them into" \
       "/app/assets or allow egress; continuing (random-weight paths" \
       "and tools still work)"

case "$1" in
  web)
    shift
    exec python apps/web.py --host 0.0.0.0 --port 7865 "$@"
    ;;
  serve)
    shift
    exec python apps/serve.py --host 0.0.0.0 --port 7866 "$@"
    ;;
  *)
    exec "$@"
    ;;
esac
