#!/usr/bin/env bash
# Quantitative eval for a ZJU-MoCap subject (reference scripts/zju_mocap/eval.sh).
SUBJECT=${1:-387}
exec python eval.py --cfg "./configs/occnerf/zju_mocap/${SUBJECT}/occnerf.yaml" "${@:2}"
