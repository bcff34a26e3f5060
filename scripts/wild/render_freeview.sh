#!/usr/bin/env bash
# Orbit-camera render for an in-the-wild subject (see render_movement.sh
# for the reference config-path quirk).
SUBJECT=${1:-monocular}
FRAME_IDX=${2:-0}
exec python run.py \
    --type freeview \
    --cfg "./configs/occnerf/wild/${SUBJECT}/occnerf.yaml" \
    load_net latest \
    freeview.frame_idx "${FRAME_IDX}" "${@:3}"
