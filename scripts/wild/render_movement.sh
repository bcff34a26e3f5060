#!/usr/bin/env bash
# Render the motion sequence for an in-the-wild subject.
# The reference script (scripts/wild/render_movement.sh) points at a
# HumanNeRF-era config path (configs/human_nerf/wild/.../adventure.yaml)
# that does not exist in its repo; this wrapper targets the shipped
# configs/occnerf/wild/<subject>/occnerf.yaml instead.
SUBJECT=${1:-monocular}
exec python run.py \
    --type movement \
    --cfg "./configs/occnerf/wild/${SUBJECT}/occnerf.yaml" \
    load_net latest "${@:2}"
