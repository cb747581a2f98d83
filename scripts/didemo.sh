#!/usr/bin/env bash
# DiDeMo paragraph-retrieval experiments.
set -e
num=${1:-1}
DATA_DIR=${2:-${DATA_DIR:-$HOME/dataset/didemo}}
OUTPUT_ROOT=${3:-${OUTPUT_ROOT:-$HOME/output/didemo}}

common=(
  --do_train 1 --do_eval 1 --datatype didemo
  --data_path "$DATA_DIR/didemo_data" --features_path "$DATA_DIR/videos"
  --output_dir "$OUTPUT_ROOT/eclip_didemo_$num"
  --max_words 64 --max_frames 32 --feature_framerate 3
  --batch_size 128 --batch_size_val 32 --epochs 5
  --optim AdamW --lr 2e-3 --coef_lr 1e-3 --wd 0.2 --warmup_proportion 0.1
  --loose_type --sim_header meanP --slice_framepos 2 --precision amp
  --pretrained_clip_name ViT-B/32 --num_thread_reader 8
)
case $num in
1)
  python main.py "${common[@]}" --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 32 32 32 32 32 32 8 8 8 8 8 8 ;;
*) echo "unknown experiment $num" && exit 1 ;;
esac
