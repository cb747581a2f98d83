#!/usr/bin/env bash
# ActivityNet paragraph-retrieval experiments (reference scripts/activitynet.sh).
set -e
num=${1:-1}
DATA_DIR=${2:-${DATA_DIR:-$HOME/dataset/activitynet}}
OUTPUT_ROOT=${3:-${OUTPUT_ROOT:-$HOME/output/activitynet}}

common=(
  --do_train 1 --do_eval 1 --datatype activity
  --data_path "$DATA_DIR/activity_data" --features_path "$DATA_DIR/videos"
  --output_dir "$OUTPUT_ROOT/eclip_act_$num"
  --max_words 77 --max_frames 60 --feature_framerate 3
  --batch_size 128 --batch_size_val 32 --epochs 8
  --optim AdamW --lr 2e-3 --coef_lr 1e-3 --wd 0.2 --warmup_proportion 0.1
  --loose_type --sim_header meanP --slice_framepos 2 --precision amp
  --pretrained_clip_name ViT-B/32 --num_thread_reader 8
)
case $num in
1) # 60 -> 15 frames after block 6 (reference scripts/activitynet.sh:104-145)
  python main.py "${common[@]}" --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 60 60 60 60 60 60 15 15 15 15 15 15 ;;
*) echo "unknown experiment $num" && exit 1 ;;
esac
