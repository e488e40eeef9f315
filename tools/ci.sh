#!/usr/bin/env bash
# Local CI: full test suite on the virtual CPU mesh + a bench smoke run.
# Usage: tools/ci.sh [--fast|--smoke]
#   --fast   skips tests marked slow
#   --smoke  <5 min fast-signal tier only (unit + cheap parity;
#            see tests/conftest.py _SMOKE_EXCLUDE)
set -euo pipefail
cd "$(dirname "$0")/.."

MARK=()
if [[ "${1:-}" == "--fast" ]]; then
  MARK=(-m "not slow")
elif [[ "${1:-}" == "--smoke" ]]; then
  MARK=(-m "smoke")
fi

echo "== pytest =="
python -m pytest tests/ -q "${MARK[@]}"

echo "== bench smoke (CPU) =="
# The real benchmark runs on TPU via the driver; here we only verify the
# program contract (note: under the axon tunnel the JAX_PLATFORMS env is
# ignored and this still runs on the TPU; elsewhere it runs on CPU).
# bench program executes end-to-end and emits its one-line JSON contract.
out=$(JAX_PLATFORMS=cpu timeout 560 python bench.py | tail -1)
echo "$out"
python - "$out" <<'PY'
import json, sys
d = json.loads(sys.argv[1])
assert {"metric", "value", "unit", "vs_baseline"} <= set(d), d
assert d["value"] > 0, d
print("bench contract OK")
PY

echo "== graft entry compile check =="
JAX_PLATFORMS=cpu python - <<'PY'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry() compiles")
PY

echo "CI PASSED"
