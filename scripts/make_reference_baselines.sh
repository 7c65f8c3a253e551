#!/bin/sh
# Rebuild the reference's CPU binaries (mod_main / rtm_main) against the
# vendored prebuilt CWP libraries and regenerate baseline artifacts:
#   .baseline_build/run3lay/   - golden-config rerun (validates the build:
#                                dir.image must be bit-identical to the
#                                committed golden)
#   .baseline_build/runmarm/   - marmousi modeling + migration outputs
#                                (dado_teste.bin, dir.image) and timings,
#                                since the upstream marmousi data blob is
#                                missing
# Timings land in BASELINE_LOCAL.json (updated manually from the output).
set -e
R=${PFDC_REFERENCE_ROOT:-/root/reference}/dpct_gpu_rtm_domain_division
# build outside the repo tree (copies of reference sources must not live in
# the repo, even gitignored)
B=${PFDC_BASELINE_BUILD:-/tmp/pfdc_oracle/baseline_build}
mkdir -p "$B"
cp -r "$R/src" "$B/src" 2>/dev/null || true
cp -r "$R/include" "$B/include" 2>/dev/null || true
I="-I$B/include -I$B/include/timestep -I$B/include/source -I$B/include/boundary -I$R/lib/cwp/include"
g++ -w $I -O3 -fopenmp -o "$B/rtm_main" "$B"/src/rtm_main.cpp "$B"/src/timestep/fd.c "$B"/src/source/ptsrc.c "$B"/src/boundary/taper.c -L"$R/lib/cwp/lib" -lsu -lpar -lcwp -lm
g++ -w $I -O3 -fopenmp -o "$B/mod_main" "$B"/src/mod_main.cpp "$B"/src/timestep/fd.c "$B"/src/source/ptsrc.c "$B"/src/boundary/taper.c -L"$R/lib/cwp/lib" -lsu -lpar -lcwp -lm
echo "built $B/mod_main and $B/rtm_main"

mkdir -p "$B/run3lay" && cd "$B/run3lay"
cp "$R/build/3lay_mod/input.dat" "$R/build/3lay_mod/3layer_151x151.bin" "$R/build/3lay_mod/dobs.bin" .
chmod +w input.dat 3layer_151x151.bin dobs.bin
../mod_main par=input.dat > /dev/null
../rtm_main par=input.dat | tail -1
cmp dir.image "$R/build/3lay_mod/dir.image" && echo "3lay dir.image BIT-IDENTICAL to committed golden"

mkdir -p "$B/runmarm" && cd "$B/runmarm"
cp "${PFDC_REFERENCE_ROOT:-/root/reference}/cuda_reference_RTM/models/marmousi/model-375.cwp" .
chmod +w model-375.cwp
cat > input.dat <<'EOF'
tmpdir=./
vpfile=model-375.cwp
datfile=dado_teste.bin
nz=375
nx=369
nt=3004
dz=8.
dx=25.
dt=0.001
fpeak=6.5
ns=1
sz=0
fsx=179
ds=6
gz=0
nxb=40
nzb=40
fac=0.75
order=8
EOF
../mod_main par=input.dat > /dev/null
../rtm_main par=input.dat | tail -1
echo "marmousi baselines regenerated in $B/runmarm"
