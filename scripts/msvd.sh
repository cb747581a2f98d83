#!/usr/bin/env bash
# MSVD experiments (reference scripts/msvd.sh).
set -e
num=${1:-22}
DATA_DIR=${2:-${DATA_DIR:-$HOME/dataset/msvd}}
OUTPUT_ROOT=${3:-${OUTPUT_ROOT:-$HOME/output/msvd}}

common=(
  --do_train 1 --do_eval 1 --datatype msvd
  --data_path "$DATA_DIR/msvd_data" --features_path "$DATA_DIR/videos"
  --output_dir "$OUTPUT_ROOT/eclip_msvd_$num"
  --max_words 32 --max_frames 12 --feature_framerate 3
  --batch_size 128 --batch_size_val 64 --epochs 5
  --optim AdamW --lr 2e-3 --coef_lr 1e-3 --wd 0.2 --warmup_proportion 0.1
  --loose_type --sim_header meanP --slice_framepos 2 --precision amp
  --pretrained_clip_name ViT-B/32 --num_thread_reader 8
)
case $num in
22) # kmediods++, 12->4 (reference scripts/msvd.sh:72-83)
  python main.py "${common[@]}" --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 12 12 12 12 12 12 4 4 4 4 4 4 ;;
*) echo "unknown experiment $num" && exit 1 ;;
esac
