#!/usr/bin/env bash
# Scalars live in <output_dir>/tensorboard/scalars.jsonl (and TB event files
# when tensorboard is installed). reference: scripts/tensorboard.sh
logdir=${1:?usage: tensorboard.sh <output_dir>}
if command -v tensorboard >/dev/null; then
  tensorboard --logdir "$logdir/tensorboard" --port "${2:-6006}"
else
  tail -f "$logdir/tensorboard/scalars.jsonl"
fi
