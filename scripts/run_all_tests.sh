#!/usr/bin/env bash
# Test orchestration (role of the reference's tests/run_all_tests.sh):
# build the native library, run the pytest suite (CPU, 8 virtual devices),
# and optionally smoke the CLI + bench when model files / a TPU exist.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== native library ==="
if make -C native >/dev/null 2>&1; then
    echo "OK  built native/libqwen3_host.so"
else
    echo "SKIP native build failed (pure-Python fallbacks active)"
fi

echo "=== pytest suite (per-file shards) ==="
# One subprocess per test file: after hundreds of XLA-CPU compiles in a
# single process the compiler can SIGSEGV (r4: suite died at
# tests/test_streaming.py inside backend_compile_and_load while the same
# file passes alone). Per-file isolation bounds compiles per process and
# keeps one crash from killing the whole gate; the persistent compile
# cache (conftest.py) keeps the per-shard cost to interpreter+import.
fails=()
total_pass=0
for f in tests/test_*.py; do
    out=$(python -m pytest "$f" -q 2>&1)
    rc=$?
    tail_line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
    if [[ $rc -ne 0 ]]; then
        echo "FAIL $f (rc=$rc): $tail_line"
        echo "$out" | tail -30
        fails+=("$f")
    else
        echo "OK   $f: $tail_line"
        n=$(echo "$tail_line" | grep -oE "[0-9]+ passed" | grep -oE "[0-9]+")
        total_pass=$((total_pass + ${n:-0}))
    fi
done
echo "pytest shards: ${total_pass} passed, ${#fails[@]} failed file(s)"
if [[ ${#fails[@]} -gt 0 ]]; then
    echo "failed files: ${fails[*]}"
    exit 1
fi

MODEL="${QWEN3_ASR_GGUF:-models/qwen3-asr-0.6b-f16.gguf}"
AUDIO="${QWEN3_ASR_WAV:-sample.wav}"
if [[ -f "$MODEL" && -f "$AUDIO" ]]; then
    echo "=== CLI smoke (real model) ==="
    python -m qwen3_asr_tpu.cli -m "$MODEL" -f "$AUDIO" --no-timing | head -3
else
    echo "SKIP CLI smoke (no model/audio: set QWEN3_ASR_GGUF / QWEN3_ASR_WAV)"
fi

# golden tier (role of the reference's model-gated suites,
# run_all_tests.sh:100-183): runs IFF the HF checkpoint + golden npy dir
# exist — mel @ 1e-4, encoder @ 2e-2, decoder @ 1e-2, WER @ 0.05
HF_DIR="${QWEN3_ASR_HF_DIR:-}"
GOLDENS="${QWEN3_ASR_GOLDENS:-}"
if [[ -n "$HF_DIR" && -d "$HF_DIR" && -n "$GOLDENS" && -d "$GOLDENS" \
      && -f "$AUDIO" ]]; then
    echo "=== golden tier (real weights) ==="
    python -m qwen3_asr_tpu.tools.validate_real_weights \
        --hf-dir "$HF_DIR" --goldens "$GOLDENS" --audio "$AUDIO" \
        ${QWEN3_FA_HF_DIR:+--fa-hf-dir "$QWEN3_FA_HF_DIR"} \
        --workdir "${TMPDIR:-/tmp}/qwen3_validate" || exit 1
else
    echo "SKIP golden tier (set QWEN3_ASR_HF_DIR + QWEN3_ASR_GOLDENS" \
         "+ QWEN3_ASR_WAV to run the real-weights gates)"
fi

echo "=== done ==="
