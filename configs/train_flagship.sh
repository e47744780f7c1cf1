#!/usr/bin/env bash
# Flagship CNN-TDNN chain training recipe.
#
# Mirrors the reference's production hyperparameters
# (ref: scripts/train_cnn_tdnn.sh:20-45 — epochs 15, lr 1e-3 -> 1e-4,
# batch 64, loss-scale 65536 with growth/backoff, 2 warmup epochs,
# SpecAugment on) mapped onto this framework's knobs, plus what the
# reference parsed but never ran: NG-SGD preconditioning and the TDNN-F
# semi-orthogonal constraint.  On a single v5e chip --batch 128 is the
# measured throughput sweet spot (docs/PERFORMANCE.md); keep 64 for
# recipe parity or when sharing HBM.
#
# Usage: configs/train_flagship.sh <egs-glob> <den.fst> [extra tools/train.py args]
set -euo pipefail

EGS=${1:?usage: train_flagship.sh '<egs-glob>' <den.fst> [extra args]}
DEN=${2:?need den.fst}
shift 2

exec python "$(dirname "$0")/../tools/train.py" \
    --egs "$EGS" \
    --den-fst "$DEN" \
    --xconfig "$(dirname "$0")/cnn_tdnn.xconfig" \
    --pdfs 3080 \
    --epochs 15 \
    --batch 128 \
    --lr 1e-3 --lr-final 1e-4 \
    --warmup-steps 2000 \
    --max-param-change 2.0 \
    --l2-regularize 5e-5 \
    --xent-regularize 0.1 \
    --leaky-hmm 1e-5 \
    --loss-scaling \
    --natural-gradient \
    --orthonormal-interval 4 \
    --ckpt-dir exp/flagship \
    --ckpt-every 500 \
    "$@"
