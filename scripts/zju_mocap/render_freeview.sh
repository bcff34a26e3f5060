#!/usr/bin/env bash
# Orbit-camera render around one frame (reference scripts/zju_mocap/render_freeview.sh).
SUBJECT=${1:-387}
FRAME_IDX=${2:-0}
exec python run.py \
    --type freeview \
    --cfg "./configs/occnerf/zju_mocap/${SUBJECT}/occnerf.yaml" \
    load_net latest \
    freeview.frame_idx "${FRAME_IDX}" "${@:3}"
