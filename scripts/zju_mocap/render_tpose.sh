#!/usr/bin/env bash
# Render the canonical T-pose (reference scripts/zju_mocap/render_tpose.sh).
SUBJECT=${1:-387}
exec python run.py \
    --type tpose \
    --cfg "./configs/occnerf/zju_mocap/${SUBJECT}/occnerf.yaml" \
    load_net latest "${@:2}"
