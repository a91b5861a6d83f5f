#!/usr/bin/env bash
# Run the full 8-scene Replica suite (BASELINE.json config #5).
set -euo pipefail
for scene in room0 room1 room2 office0 office1 office2 office3 office4; do
  python src/vtgaussian_slam.py "configs/replica/${scene}.py"
done
