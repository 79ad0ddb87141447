#!/usr/bin/env bash
# Run the real-asset validation tier the moment assets/ is populated
# (see scripts/download_assets.sh for the expected layout).
#
# Exits non-zero if any asset test FAILS, and warns loudly about tests that
# still SKIP (missing assets).  This is the zero-engineering runbook for
# "the weights just landed — is everything actually correct?":
#   1. tokenizer vs HF on the real 50k vocab (incl. a 2k caption corpus)
#   2. GPT-2 port vs HF forward numerics
#   3. CLIP port + end-to-end captions (non-degenerate)
#   4. DINOv3 + dino.txt checkpoint port
set -euo pipefail
cd "$(dirname "$0")/.."

out=$(python -m pytest tests/test_assets.py -m assets -v -rs 2>&1) || {
    echo "$out"
    echo "ASSET VALIDATION FAILED" >&2
    exit 1
}
echo "$out"
if echo "$out" | grep -q "SKIPPED"; then
    echo
    echo "WARNING: some asset tests skipped — assets incomplete (see above)." >&2
fi

# bonus: if pycocoevalcap was installed alongside the assets, run THE
# bit-parity metric gate too
if python -c "import pycocoevalcap" 2>/dev/null; then
    python -m pytest tests/test_metrics.py tests/test_metrics_oracles.py -q -k pycocoevalcap
fi
