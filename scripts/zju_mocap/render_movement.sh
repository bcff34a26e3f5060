#!/usr/bin/env bash
# Render the training motion sequence (reference scripts/zju_mocap/render_movement.sh).
SUBJECT=${1:-387}
exec python run.py \
    --type movement \
    --cfg "./configs/occnerf/zju_mocap/${SUBJECT}/occnerf.yaml" \
    load_net latest "${@:2}"
