#!/usr/bin/env bash
# One-command 300-epoch COCO mAP-parity run (VERDICT r2 #8) with
# preemption-resume: restarts train.py with --resume after any non-zero
# exit (SIGTERM preemption writes a checkpoint first — trainer.py), up to
# MAX_RESTARTS times. Prepare data first: tools/prepare_coco.py.
#
#   DATA_ROOT=/data/COCO2017 ./tools/launch_coco300.sh
#
# Env overrides: MODEL (default yolox_s), DATA_CFG, OUT (default
# runs/coco300), EPOCHS (default 300), MAX_RESTARTS (default 50).
set -u

cd "$(dirname "$0")/.."
MODEL="${MODEL:-yolox_s}"
MODEL_CFG="${MODEL_CFG:-pl_yolo_tpu/configs/model/${MODEL}.yaml}"
DATA_CFG="${DATA_CFG:-pl_yolo_tpu/configs/data/coco2017_tpu.yaml}"
OUT="${OUT:-runs/coco300}"
EPOCHS="${EPOCHS:-300}"
MAX_RESTARTS="${MAX_RESTARTS:-50}"

if [ -n "${DATA_ROOT:-}" ]; then
    # point the config at DATA_ROOT without editing the repo copy
    TMP_CFG="$(mktemp --suffix=.yaml)"
    sed "s#dir: '/data/COCO2017'#dir: '${DATA_ROOT}'#; \
         s#disk_cache: '/data/COCO2017/diskcache'#disk_cache: '${DATA_ROOT}/diskcache'#" \
        "${DATA_CFG}" > "${TMP_CFG}"
    DATA_CFG="${TMP_CFG}"
fi

attempt=0
while :; do
    RESUME=""
    # --resume requires an existing checkpoint; first launch starts fresh
    if ls "${OUT}"/*/checkpoints/*/ >/dev/null 2>&1 || \
       ls "${OUT}"/checkpoints/*/ >/dev/null 2>&1; then
        RESUME="--resume"
    fi
    echo "[launch_coco300] attempt ${attempt} ${RESUME:+(resuming)}"
    python train.py -c "${MODEL_CFG}" \
        -d "${DATA_CFG}" --output_dir "${OUT}" --max_epochs "${EPOCHS}" \
        ${RESUME}
    code=$?
    if [ "${code}" -eq 0 ]; then
        echo "[launch_coco300] completed"
        exit 0
    fi
    attempt=$((attempt + 1))
    if [ "${attempt}" -gt "${MAX_RESTARTS}" ]; then
        echo "[launch_coco300] giving up after ${MAX_RESTARTS} restarts"
        exit "${code}"
    fi
    echo "[launch_coco300] exit ${code}; restarting in 10s"
    sleep 10
done
