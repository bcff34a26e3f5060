#!/usr/bin/env bash
# Train the flagship ZJU-MoCap 387 recipe (reference train.sh).
# Pass a different config as $1 to train another subject.
CFG=${1:-configs/occnerf/zju_mocap/387/occnerf.yaml}
exec python train.py --cfg "${CFG}" "${@:2}"
