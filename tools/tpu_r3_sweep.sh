#!/bin/bash
# Round-3 TPU measurement sweep — run ONE AT A TIME (two concurrent TPU
# processes corrupt both timings over the tunnel; docs/PERFORMANCE.md
# "Measurement methodology").  Each step is independently resumable;
# everything lands in /tmp/r3sweep for transcription into
# docs/PERFORMANCE.md / docs/SERVING.md / docs/evidence/.
#
# Usage: bash tools/tpu_r3_sweep.sh [stage]   (default: all stages)
set -e
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3sweep
STAGE="${1:-all}"

run() { local name="$1"; echo "=== $name ==="; shift; "$@" 2>&1 | tee "/tmp/r3sweep/$name.log"; }

# 1. warm the persistent compile cache + capture the headline number the
#    driver will re-measure (VERDICT r2 next #1)
if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  run bench_warm python bench.py
  run bench_cached python bench.py      # must be fast: cache hit check
fi

# 2. chain numerics gate on hardware (strict-CPU pass + TPU budget pass)
if [ "$STAGE" = all ] || [ "$STAGE" = chain ]; then
  run chainverify python tools/chainverify.py --topology phone-lm
fi

# 2b. trainer-loop throughput (async metrics + double-buffered uploads,
#     VERDICT r2 next #2: step_ms should drop from ~96 toward the ~77ms
#     device time at B=128)
if [ "$STAGE" = all ] || [ "$STAGE" = train ]; then
  run traintest python tools/traintest.py
  # flagship-scale production loop: same model/den/batch as bench.py, but
  # through Trainer.train_batch + the host dataloader — step_ms here vs
  # bench.py's raw-loop step_ms isolates the dispatch/metrics overhead
  run traintest_flagship python tools/traintest.py \
      --xconfig configs/cnn_tdnn.xconfig --pdfs 3080 --batch 128 \
      --steps 15 --den-topology phone-lm --frames-in 150 --frames-out 49
fi

# 3. decode: segment vs tree at HCLG scale (VERDICT r2 next #3 — target
#    >= 100 audio-sec/s at S=100K/390K arcs, was 15.7)
if [ "$STAGE" = all ] || [ "$STAGE" = decode ]; then
  run decode_seg_hclg python tools/decodebench.py --hclg --states 100000 \
      --pdfs 3080 --batch 16 --frames 500 --iters 2 --layout segment \
      --on-device-ll
  run decode_tree_hclg python tools/decodebench.py --hclg --states 100000 \
      --pdfs 3080 --batch 16 --frames 500 --iters 2 --layout tree \
      --on-device-ll
  run decode_tree_bench python tools/decodebench.py --states 2048 \
      --pdfs 512 --batch 32 --frames 500 --iters 3 --layout tree \
      --on-device-ll
  # 4. round-2 lattice kernels, TPU-unbenchmarked so far (next #4)
  run lattice_seg python tools/decodebench.py --states 2048 --pdfs 512 \
      --batch 32 --frames 500 --iters 2 --lattice --on-device-ll
  run lattice_tree_hclg python tools/decodebench.py --hclg \
      --states 100000 --pdfs 3080 --batch 8 --frames 300 --iters 1 \
      --lattice --layout tree --on-device-ll
fi

# 5. fast-mode A/B at flagship scale (next #5): cnn_tdnn xconfig,
#    3080 pdfs, phone-LM den, >= 200 steps
if [ "$STAGE" = all ] || [ "$STAGE" = ab ]; then
  run abtest_flagship python tools/abtest.py \
      --workdir /tmp/r3sweep/abtest --xconfig configs/cnn_tdnn.xconfig \
      --pdfs 3080 --den-states 7052 --files 4 --per-file 128 \
      --batch 16 --epochs 7 --frames-in 150 --frames-out 49 --lr 1e-4
  cp /tmp/r3sweep/abtest/ab_result.json \
     docs/evidence/ab_result_r3_tpu.json || true
fi

# 6. kill/resume soak at flagship scale on TPU (next #5b)
if [ "$STAGE" = all ] || [ "$STAGE" = soak ]; then
  run soak_flagship python tools/soak.py --workdir /tmp/r3sweep/soak \
      --pdfs 3080 --batch 16 --epochs 3
  cp /tmp/r3sweep/soak/soak_result.json \
     docs/evidence/soak_result_r3_tpu.json || true
fi

# 7. bf16-BN-stats A/B (next #9): trainbench with/without the opt-in
if [ "$STAGE" = all ] || [ "$STAGE" = bn ]; then
  run trainbench_base python tools/trainbench.py --batch 128
  run trainbench_bnlowp python tools/trainbench.py --batch 128 --bn-lowp
  # r3b: the trajectory A/B that settles the promotion (REVOKED —
  # max objf diff 2.31 over 112 flagship steps; PERFORMANCE.md)
  run abtest_bnlowp python tools/abtest.py --ab bn-lowp \
      --workdir /tmp/r3sweep/bnlowp --xconfig configs/cnn_tdnn.xconfig \
      --pdfs 3080 --den-states 7052 --files 4 --per-file 512 \
      --batch 128 --epochs 7 --frames-in 150 --frames-out 49 --lr 1e-4
  cp /tmp/r3sweep/bnlowp/ab_result.json \
     docs/evidence/ab_bn_lowp_r3_tpu.json || true
fi

# 8. r3b fused slot-order lattice masks at HCLG scale (B sweep; note the
#    packed-mask D2H rides the tunnel — see PERFORMANCE.md decomposition)
if [ "$STAGE" = all ] || [ "$STAGE" = lattice ]; then
  for B in 8 64; do
    run "lattice_tree_hclg_B$B" python tools/decodebench.py --hclg \
        --states 100000 --pdfs 3080 --batch "$B" --frames 300 --iters 2 \
        --lattice --layout tree --on-device-ll
  done
  run lattice_profile python tools/profile_lattice.py \
      --states 100000 --pdfs 3080 --batch 8 --frames 16
fi

echo "sweep complete; logs in /tmp/r3sweep"
