#!/bin/bash
# Reproduce the RESULTS.md headline + control rows and preserve auditable
# artifacts in-tree (VERDICT r2 "evidence discipline"): for each row, the
# training log, eval JSON and options.yaml are copied to results/<row>/.
# Rows run sequentially — ONE TPU job at a time (axon serializes the chip).
#
# Usage: bash scripts/run_evidence.sh [rows...]   (default: all four)
set -u
cd "$(dirname "$0")/.."
WS=workspace/evidence
OUT=results
# n_test=4: quality metrics average >=4 test views (VERDICT r3 weak #1 —
# single-view PSNR/SSIM/LPIPS carried single-sample variance)
SYN='--synthetic={"H":300,"W":400,"n_train":3,"n_test":4,"texture_octaves":3,"angular_span":0.35}'

run_row() {
  local row=$1; shift
  local module=$1; shift
  local name=$1; shift
  echo "=== row: $row ($(date -u +%H:%M:%S)) ==="
  rm -rf "$WS/$row"
  timeout 7200 python run_trainval.py "$module" "$name" --scene spheres \
    --workspace_dir "$WS/$row" "$@" > "/tmp/evidence_$row.log" 2>&1
  local rc=$?
  mkdir -p "$OUT/$row"
  local proj="$WS/$row/$module/$name/spheres"
  cp "$proj/train.log" "$OUT/$row/train.log" 2>/dev/null
  cp "$proj/options.yaml" "$OUT/$row/options.yaml" 2>/dev/null
  # evaluate_full writes <eval_dir>/<project>/<expname>.json
  find "$WS/$row/eval" -name '*.json' -exec cp {} "$OUT/$row/eval.json" \; 2>/dev/null
  echo "row $row rc=$rc; artifacts: $(ls $OUT/$row 2>/dev/null | tr '\n' ' ')"
}

rows=("$@")
[ ${#rows[@]} -eq 0 ] && rows=(headline headline_learned headline_learned_raw headline_learned_raw_r5 static_pools barf sfm_init sfm_init_zncc)
for row in "${rows[@]}"; do
  case $row in
    headline)
      # classical geometry-guided matcher (explicit: the preset default is
      # PDCNet, which now autoloads bundled learned weights — see
      # headline_learned for that row)
      run_row headline joint_pose_nerf_training/synthetic sparf "$SYN" \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=zncc \
        --max_iter=15000 --rematch_at_ratio=0.15 ;;
    headline_learned)
      # same recipe with the LEARNED dense matcher (pdcnet_jax + bundled
      # sparf_tpu/data/pdcnet_synth.npz); train.log must show
      # "correspondence precompute [pdcnet_jax]" and NO fallback warning
      run_row headline_learned joint_pose_nerf_training/synthetic sparf "$SYN" \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=PDCNet \
        --max_iter=15000 --rematch_at_ratio=0.15 ;;
    headline_learned_raw)
      # reference-parity configuration: RAW learned flows supervise pose
      # directly (no geometry-stage refit/rematch), like the reference's
      # PDC-Net consumption (corres_loss.py:73-95). The de-biasing bar:
      # <=1 deg on this row (VERDICT r4 #2; was 2.18 deg with the r4
      # biased weights).
      run_row headline_learned_raw joint_pose_nerf_training/synthetic sparf "$SYN" \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=PDCNet --pdcnet_geometry_refine=false \
        --max_iter=15000 --rematch_at_ratio=0.15 ;;
    headline_learned_raw_r5)
      # the raw row with the round-5 DE-BIASED matcher weights
      # (scripts/train_pdcnet_synth.py symmetrized+consistency retrain).
      # This is the row that clears the <=1 deg de-biasing bar.
      run_row headline_learned_raw_r5 joint_pose_nerf_training/synthetic sparf "$SYN" \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=PDCNet --pdcnet_geometry_refine=false \
        --flow_ckpt_path=sparf_tpu/data/pdcnet_synth_r5.npz \
        --max_iter=15000 --rematch_at_ratio=0.15 ;;
    static_pools)
      # classical matcher forced: this row evidences the "static pools,
      # reference behavior" ladder rung (2.2 deg freeze). The preset default
      # PDCNet now autoloads the bundled learned weights, which would change
      # the row's meaning.
      run_row static_pools joint_pose_nerf_training/synthetic sparf "$SYN" \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=zncc \
        --max_iter=15000 ;;
    barf)
      run_row barf joint_pose_nerf_training/synthetic barf "$SYN" \
        --camera.initial_pose=noisy_gt --camera.noise=0.15 --max_iter=15000 ;;
    sfm_init)
      # preset-default PDCNet backend = bundled learned weights (reference-
      # faithful: the reference's SfM init is PDC-Net-based)
      run_row sfm_init nerf_fixed_noisy_poses/synthetic sparf \
        '--synthetic={"H":300,"W":400,"n_train":4,"n_test":4,"texture_octaves":3,"angular_span":0.35}' \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --camera.initial_pose=sfm_pdcnet --max_iter=8000 ;;
    sfm_init_zncc)
      # same recipe, classical geometry-guided matcher (the backend the
      # r1/r2 "0.028 deg" number effectively used, since the weightless
      # PDCNet fell back)
      run_row sfm_init_zncc nerf_fixed_noisy_poses/synthetic sparf \
        '--synthetic={"H":300,"W":400,"n_train":4,"n_test":4,"texture_octaves":3,"angular_span":0.35}' \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=zncc \
        --camera.initial_pose=sfm_pdcnet --max_iter=8000 ;;
    wide_learned)
      # the 1.0-rad wide-baseline ladder rung (57 deg span, far beyond the
      # DTU 3-view regime) driven by the learned matcher in the hybrid
      # pipeline + mid-training rematch — the matcher stress test
      # (VERDICT r4 #9). The previous rung entry (6.47 deg) used the
      # classical matcher with static pools.
      run_row wide_learned joint_pose_nerf_training/synthetic sparf \
        '--synthetic={"H":300,"W":400,"n_train":3,"n_test":4,"texture_octaves":3,"angular_span":1.0}' \
        --use_gt_correspondences=false --min_nbr_matches=100 \
        --flow_backbone=PDCNet \
        --max_iter=15000 --rematch_at_ratio=0.15 ;;
    *) echo "unknown row $row" ;;
  esac
done
echo "=== all rows done ($(date -u +%H:%M:%S)) ==="
