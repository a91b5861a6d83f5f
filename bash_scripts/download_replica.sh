#!/usr/bin/env bash
# Fetch the Replica RGB-D renders (NICE-SLAM packaging) into ./data/Replica.
set -euo pipefail
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
