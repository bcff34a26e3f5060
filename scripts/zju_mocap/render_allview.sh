#!/usr/bin/env bash
# Render one frame from every real eval camera (reference scripts/zju_mocap/render_allview.sh).
SUBJECT=${1:-387}
FRAME_IDX=${2:-0}
exec python run.py \
    --type allview \
    --cfg "./configs/occnerf/zju_mocap/${SUBJECT}/occnerf.yaml" \
    load_net latest \
    freeview.frame_idx "${FRAME_IDX}" "${@:3}"
