#!/bin/bash
# Measure the C++ reference baseline for BASELINE.json configs 3-5
# (the rows marked TBD in BASELINE.md).  Single-threaded box; expect
# ~1.5-2 h total, dominated by config 3's box-55 RPF pass.
#
#   config 3: sample.pbrt 4 spp + multi-scale RPF {55,35,17,7}
#             vs a 64 spp path reference          (rpf.cpp:767)
#   config 4: sample.pbrt RPF under random/stratified/halton samplers
#             (api.cpp:817-837 factories)
#   config 5: direct-lighting + textured scene    (directlighting.cpp,
#             imagemap.cpp via vendored lodepng)
#
# Usage: bash tools/baseline_cpp_configs.sh   (logs to /tmp/baseline_cpp/)
set -u
OUT=/tmp/baseline_cpp
BIN=/tmp/refbuild-out/bin
SCENES=/root/reference/scenes
mkdir -p $OUT
cd /root/repo

make -C refbuild all patched -j"$(nproc)" BUILD=/tmp/refbuild-out \
  > $OUT/build.log 2>&1 || { echo "refbuild failed"; exit 1; }

mkdir -p $OUT/sc
ln -sfn $SCENES/geometry $OUT/sc/geometry

mkscene() {  # mkscene <out.pbrt> <spp> <integrator> <sampler> <outfile>
  python3 - "$1" "$2" "$3" "$4" "$5" <<'EOF'
import re, sys
src = open("/root/reference/scenes/sample.pbrt").read()
out, spp, integ, sampler, exr = sys.argv[1:6]
src = re.sub(r'Sampler "\w+" "integer pixelsamples" \[\d+\]',
             f'Sampler "{sampler}" "integer pixelsamples" [{spp}]', src)
src = re.sub(r'Integrator "\w+"', f'Integrator "{integ}"', src)
src = src.replace('"string filename" "sample.exr"',
                  f'"string filename" "{exr}"')
open(out, "w").write(src)
EOF
}

run() {  # run <label> <cmd...>   (no /usr/bin/time on this image)
  label=$1; shift
  echo "=== $label: $*"
  local t0=$SECONDS
  timeout 7200 "$@" > $OUT/$label.log 2>&1
  local rc=$?
  echo "$((SECONDS - t0)) s wall" > $OUT/$label.time
  echo "--- $label exit=$rc $(cat $OUT/$label.time)"
}

# Ordered cheap-first so a bounded session still yields measured rows;
# config 3's box-55 multi-scale RPF pass (the multi-hour tail) runs last.

# --- config 4 ---------------------------------------------------------
for s in random stratified halton; do
  mkscene $OUT/sc/s_rpf_$s.pbrt 8 rpf $s $OUT/rpf_$s.exr
  run cfg4_rpf_$s $BIN/pbrt-patched $OUT/sc/s_rpf_$s.pbrt
done

# --- config 5 (scene authored below, run before cfg3's long tail) -----
python3 - $OUT <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
out = sys.argv[1]
import numpy as np
import tpurt.io as tio
yy, xx = np.mgrid[0:256, 0:256]
tex = np.stack([(xx // 32 % 2).astype(np.float32),
                (yy // 32 % 2).astype(np.float32),
                ((xx + yy) // 32 % 2).astype(np.float32)], -1)
tex = 0.2 + 0.7 * tex
tio.write_image(os.path.join(out, "sc/grid.png"), tex)
import bench
scene = bench._TEXTURED_SCENE.format(texpng=os.path.join(out, "sc/grid.png"))
scene = scene.replace('"direct_textured.exr"',
                      f'"{out}/direct_textured_cpp.exr"')
open(os.path.join(out, "sc/s_direct_tex.pbrt"), "w").write(scene)
EOF
run cfg5_direct_textured $BIN/pbrt $OUT/sc/s_direct_tex.pbrt

# --- config 3 ---------------------------------------------------------
mkscene $OUT/sc/s_path64.pbrt 64 path halton $OUT/ref64.exr
mkscene $OUT/sc/s_rpf4.pbrt 4 rpf halton $OUT/rpf4_ms.exr
mkscene $OUT/sc/s_path4.pbrt 4 path halton $OUT/path4.exr
run cfg3_path4 $BIN/pbrt $OUT/sc/s_path4.pbrt
run cfg3_path64 $BIN/pbrt $OUT/sc/s_path64.pbrt
# path4-vs-ref64 MSE depends only on the two runs above — record it before
# the multi-hour RPF tail so a bounded session still yields this row.
$BIN/imgtool diff $OUT/path4.exr $OUT/ref64.exr \
  > $OUT/cfg3_mse_path4.log 2>&1
RPF_BOX_SIZES=55,35,17,7 run cfg3_rpf4_multiscale \
  $BIN/pbrt-patched $OUT/sc/s_rpf4.pbrt
$BIN/imgtool diff $OUT/rpf4_ms.exr $OUT/ref64.exr \
  > $OUT/cfg3_mse_rpf4.log 2>&1

echo "=== baseline_cpp done ==="
grep -H . $OUT/*.time
