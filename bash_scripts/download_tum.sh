#!/usr/bin/env bash
# Fetch the TUM-RGBD benchmark sequences used by the configs into
# ./data/TUM_RGBD.
set -euo pipefail
mkdir -p data/TUM_RGBD
cd data/TUM_RGBD
for seq in \
  freiburg1/rgbd_dataset_freiburg1_desk \
  freiburg2/rgbd_dataset_freiburg2_xyz \
  freiburg3/rgbd_dataset_freiburg3_long_office_household; do
  wget "https://cvg.cit.tum.de/rgbd/dataset/${seq}.tgz"
  tar -xvzf "$(basename "$seq").tgz"
done
