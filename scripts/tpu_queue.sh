#!/bin/bash
# TPU work queue v3: capture-first + AD-gated training capture.
#
# Polls the tunnel; when it answers:
#   1. recapture the scoreboard headline (probe + bench_infer) at HEAD
#      and commit immediately — the single most losable artifact;
#   2. run the hardware gradient check for the image-attention AD
#      (scripts/check_image_ad_tpu.py). The narrow-C folded-LN packed
#      backward is default-on in training with only CPU-interpret
#      parity; if the hardware check FAILS, bench_train runs with
#      UFORMER_TPU_PACKED_ATTN=0 so the captured train number is for a
#      verified path (and the failure is committed as evidence);
#   3. capture bench_train (gated) and commit;
#   4. profiles + kernel table + aux, per-variant compile cost;
#   5. A/B legs (diag softmax / T256 megakernel / LeFF interleave)
#      into bench_artifacts/ab/ so the end-of-round auto-commit
#      preserves them even with no session alive.
cd /root/repo
log() { echo "$1 $(date +%H:%M:%S)" >> /tmp/tpu_queue_log.txt; }

while true; do
  if timeout 90 python -c "import jax; assert jax.default_backend() != 'cpu'; print(jax.devices())" >/tmp/tpu_status.txt 2>&1; then
    echo "UP $(date +%H:%M:%S)" >> /tmp/tpu_status.txt
    break
  fi
  echo "down $(date +%H:%M:%S)" >> /tmp/tpu_probe_log.txt
  sleep 240
done

echo "=== queue v3 start $(date +%H:%M:%S)" > /tmp/tpu_queue_log.txt
mkdir -p bench_artifacts/ab

# --- Stage 1: scoreboard headline (inference) ---
timeout 2400 python -u scripts/tpu_capture.py --only probe,bench_infer > /tmp/q_cap1.txt 2>&1
log "cap1 rc=$?"
git add bench_artifacts && git commit -q -m "bench: recapture headline inference artifact at HEAD (auto-queue)" && log "commit1 ok"

# --- Stage 2: hardware AD parity gates the training capture ---
timeout 1200 python -u scripts/check_image_ad_tpu.py > bench_artifacts/ab/q_ad.txt 2>&1
AD_RC=$?
log "ad rc=$AD_RC"
TRAIN_ENV=()
if [ $AD_RC -ne 0 ]; then
  TRAIN_ENV=(UFORMER_TPU_PACKED_ATTN=0)
  echo "AD check failed (rc=$AD_RC): capturing bench_train with UFORMER_TPU_PACKED_ATTN=0" \
    >> bench_artifacts/ab/q_ad.txt
fi

# --- Stage 3: training capture (gated by stage 2) ---
env "${TRAIN_ENV[@]}" timeout 2400 python -u scripts/tpu_capture.py --only bench_train > /tmp/q_cap3.txt 2>&1
log "cap3 rc=$?"
git add bench_artifacts && git commit -q -m "bench: recapture train artifact at HEAD, AD-gated (auto-queue)" && log "commit3 ok"

# --- Stage 4: profiles + kernel table + aux ---
env "${TRAIN_ENV[@]}" timeout 4500 python -u scripts/tpu_capture.py --only profile_train,kernel_bench,bench_aux > /tmp/q_cap4.txt 2>&1
log "cap4 rc=$?"
git add bench_artifacts && git commit -q -m "bench: recapture train profile + kernel table at HEAD (auto-queue)" && log "commit4 ok"

# --- Stage 4b: per-variant compile cost (VERDICT item 5 data) ---
timeout 2400 python -u scripts/compile_cost.py > bench_artifacts/ab/q_compile_cost.txt 2>&1
log "compile_cost rc=$?"

# --- Stage 5: A/B legs (opt-in perf work landed while tunnel was down) ---
timeout 6200 python -u scripts/ab_stage_opts.py > bench_artifacts/ab/q_stage_opts.txt 2>&1
log "stage_opts rc=$?"
UFORMER_TPU_MEGA_T256=1 timeout 1800 python -u bench.py --mode infer > bench_artifacts/ab/q_infer_t256.txt 2>&1
log "infer_t256 rc=$?"
timeout 2000 python -u scripts/leff_bwd_bench.py > bench_artifacts/ab/q_leff_il2.txt 2>&1
log "leff_il2 rc=$?"
UFORMER_TPU_LEFF_ILEAVE=1 timeout 2000 python -u scripts/leff_bwd_bench.py > bench_artifacts/ab/q_leff_il1.txt 2>&1
log "leff_il1 rc=$?"
git add bench_artifacts && git commit -q -m "bench: hardware A/B legs (diag softmax, T256 megakernel, LeFF interleave)" && log "commit5 ok"
echo "=== queue v3 done $(date +%H:%M:%S)" >> /tmp/tpu_queue_log.txt
