#!/bin/bash
# Build the ACTUAL reference VO binary (/root/reference, Brown-LEMS
# C++17/OpenMP) for ground-truth baseline measurement + end-to-end parity
# (VERDICT r1 items 2/7). The reference's own CMake wants Eigen3 +
# OpenCV + yaml-cpp (+ optional glog/gflags); on this image:
#   - OpenCV 4.6: system (/usr/include/opencv4)
#   - Eigen: TensorFlow's bundled headers (header-only, same library)
#   - yaml-cpp: shim/yaml-cpp/yaml.h (minimal API shim, config subset)
#   - glog/gflags: off (the reference's USE_GLOGS=false path)
# Nothing is copied from or written to /root/reference - sources compile
# in place, objects + binary land here.
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference
EIGEN=$(python - <<'EOF'
import os
cands = ["/opt/venv/lib/python3.12/site-packages/tensorflow/include"]
try:
    import tensorflow
    cands.insert(0, os.path.join(os.path.dirname(tensorflow.__file__), "include"))
except Exception:
    pass
for c in cands:
    if os.path.isdir(os.path.join(c, "Eigen")):
        print(c)
        break
EOF
)
[ -n "$EIGEN" ] || { echo "no Eigen headers found" >&2; exit 1; }

OUT=build
mkdir -p "$OUT"

SRCS=(
  "$REF/src/Dataset.cpp"
  "$REF/src/Pipeline.cpp"
  "$REF/src/utility.cpp"
  "$REF/src/MotionTracker.cpp"
  "$REF/src/toed/cpu_toed.cpp"
  "$REF/src/Stereo_Matches.cpp"
  "$REF/src/Temporal_Matches.cpp"
  "$REF/src/Stereo_Iterator.cpp"
  "$REF/src/EdgeClusterer.cpp"
  "$REF/cmd/main_VO.cpp"
)

FLAGS=(-O3 -std=c++17 -fopenmp -w
  -I"$REF" -I"$REF/include"
  -I"$EIGEN"
  -I/usr/include/opencv4
  -Ishim
  -DUSE_GLOGS=0)

LIBS=(-lopencv_core -lopencv_imgproc -lopencv_imgcodecs
  -lopencv_features2d -lopencv_calib3d)

OBJS=()
for s in "${SRCS[@]}"; do
  o="$OUT/$(basename "${s%.cpp}").o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ] || [ shim/yaml-cpp/yaml.h -nt "$o" ]; then
    echo "CXX $(basename "$s")"
    g++ "${FLAGS[@]}" -c "$s" -o "$o"
  fi
  OBJS+=("$o")
done

echo "LINK ref_main_vo"
g++ -fopenmp "${OBJS[@]}" "${LIBS[@]}" -o "$OUT/ref_main_vo"
echo "OK: $OUT/ref_main_vo"
