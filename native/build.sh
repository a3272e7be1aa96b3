#!/bin/bash
# Build libmvsnative.so and drop it into adamvs_tpu/_native/.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build -j >/dev/null
mkdir -p ../adamvs_tpu/_native
cp build/libmvsnative.so ../adamvs_tpu/_native/
echo "built adamvs_tpu/_native/libmvsnative.so"
