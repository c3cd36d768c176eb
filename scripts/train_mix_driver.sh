#!/bin/bash
# Chunked, crash-resumable mixed-domain LightGlue fine-tune.
#
# The tunnel intermittently hangs a process at its first device contact
# (r4: 55-min silent hang; r5: reproduced twice) — so train in 400-step
# chunks under `timeout`, each chunk resuming from the previous
# checkpoint. Any wedged chunk is killed and retried; at most one
# chunk's steps are lost.
#
#   bash scripts/train_mix_driver.sh [total_steps] [out.npz]
set -u
TOTAL=${1:-3200}
OUT=${2:-weights/lightglue_mix.npz}
CHUNK=${CHUNK:-400}
KPS=${KPS:-256}
SIZE=${SIZE:---width 224 --height 168}
CHUNK_TIMEOUT=${CHUNK_TIMEOUT:-1500}
LOG=${LOG:-/tmp/train_mix_driver.log}
cd "$(dirname "$0")/.."

done_steps=0
attempt=0
while [ "$done_steps" -lt "$TOTAL" ] && [ "$attempt" -lt 40 ]; do
  attempt=$((attempt + 1))
  if [ -f "$OUT" ]; then INIT="--init $OUT"; else INIT=""; fi
  echo "[driver] attempt $attempt: steps $done_steps/$TOTAL" | tee -a "$LOG"
  timeout -k 30 "$CHUNK_TIMEOUT" python scripts/train_deep_sp.py \
    --world mix --steps "$CHUNK" --skip-eval $INIT --out "$OUT" \
    --kps "$KPS" $SIZE --seed $((1000 + done_steps)) >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ] && tail -3 "$LOG" | grep -q "CHUNK DONE"; then
    done_steps=$((done_steps + CHUNK))
  else
    echo "[driver] chunk failed rc=$rc — retrying" | tee -a "$LOG"
    sleep 15
  fi
done
echo "[driver] finished $done_steps steps" | tee -a "$LOG"
# final evaluation on both domains (also under timeout + one retry)
for i in 1 2; do
  timeout -k 30 900 python scripts/train_deep_sp.py \
    --eval-only --init "$OUT" --kps "$KPS" >> "$LOG" 2>&1 && break
done
tail -6 "$LOG"
