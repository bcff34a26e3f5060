#!/usr/bin/env bash
# Render the canonical T-pose for an in-the-wild subject (see
# render_movement.sh for the reference config-path quirk).
SUBJECT=${1:-monocular}
exec python run.py \
    --type tpose \
    --cfg "./configs/occnerf/wild/${SUBJECT}/occnerf.yaml" \
    load_net latest "${@:2}"
