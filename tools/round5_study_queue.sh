#!/bin/bash
# Round-5 study queue (serial: the dev tunnel exposes ONE TPU chip).
# Stage 1: random-init kNN baseline (reuses the cached width-10 feature program)
# Stage 2: regenerate the tau-0.994 escape run to step 1310 with kept step
#          checkpoints (600, 1200) — seeded + canonical subset, so the
#          trajectory reproduces the committed w02707bq curve exactly
# Stage 3: offline kNN on the mid-escape step-1200 checkpoint
# Logs: /tmp/knn_random.log /tmp/regen_escape.log /tmp/knn_escape1200.log
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

echo "=== stage 1: random-init kNN baseline ($(date +%T)) ==="
timeout 2700 python tools/knn_study_drive.py \
  pretrained_feature_extractor=/nonexistent \
  name=Random-IDR10k-KNN > /tmp/knn_random.log 2>&1
echo "stage 1 rc=$? ($(date +%T))"
tail -3 /tmp/knn_random.log

echo "=== stage 2: escape regen to step 1310 ($(date +%T)) ==="
timeout 2700 python main_pretrain.py --config-path scripts/pretrain \
  --config-name dino_idr10k.yaml \
  max_steps=1310 \
  checkpoint.step_frequency=600 \
  checkpoint.keep_prev=True \
  checkpoint.dir=/tmp/chadavit_idr10k_escape_ckpt \
  auto_resume.enabled=False > /tmp/regen_escape.log 2>&1
echo "stage 2 rc=$? ($(date +%T))"
tail -3 /tmp/regen_escape.log

CKPT=$(ls -d /tmp/chadavit_idr10k_escape_ckpt/dino/*/dino-idr10k-*step=1200 2>/dev/null | head -1)
echo "=== stage 3: kNN on mid-escape ckpt $CKPT ($(date +%T)) ==="
if [ -n "$CKPT" ]; then
  timeout 2700 python tools/knn_study_drive.py \
    "pretrained_feature_extractor=$CKPT" \
    name=Dino-IDR10k-escape1200-KNN > /tmp/knn_escape1200.log 2>&1
  echo "stage 3 rc=$? ($(date +%T))"
  tail -3 /tmp/knn_escape1200.log
else
  echo "stage 3 SKIPPED: no step=1200 checkpoint found"
fi
echo "=== queue done ($(date +%T)) ==="
