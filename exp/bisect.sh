#!/bin/bash
# Bisect the three step optimizations one at a time.
cd /root/repo
run() {
  echo "--- $1 (JOINT=$S2R_JOINT_LOSS DROP=$S2R_DROPOUT_RECOMPUTE S2D=$S2R_D_S2D)"
  PYTHONPATH=/root/repo:$PYTHONPATH timeout 1200 python exp/perf_ablate.py full8 2>&1 | grep "full step"
}
export S2R_JOINT_LOSS=0 S2R_DROPOUT_RECOMPUTE=0 S2R_D_S2D=0; run baseline
export S2R_JOINT_LOSS=1 S2R_DROPOUT_RECOMPUTE=0 S2R_D_S2D=0; run joint-only
export S2R_JOINT_LOSS=0 S2R_DROPOUT_RECOMPUTE=1 S2R_D_S2D=0; run dropout-only
export S2R_JOINT_LOSS=0 S2R_DROPOUT_RECOMPUTE=0 S2R_D_S2D=2; run s2d-only
export S2R_JOINT_LOSS=0 S2R_DROPOUT_RECOMPUTE=0 S2R_D_S2D=1; run s2d1-only
