#!/usr/bin/env bash
# TensorBoard over the run dirs (ref: /root/reference/tensorboard_start.sh)
ROOT="${1:-/data/results}"
exec tensorboard --logdir "$ROOT" --port "${2:-6006}" --bind_all
