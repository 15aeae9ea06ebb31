#!/bin/sh
# Build the native runtime library into defslam_tpu/_lib/.
set -e
cd "$(dirname "$0")"
mkdir -p build ../defslam_tpu/_lib
cd build
cmake -G Ninja .. >/dev/null
ninja
echo "built: $(ls ../../defslam_tpu/_lib/)"
