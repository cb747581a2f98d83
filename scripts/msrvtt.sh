#!/usr/bin/env bash
# MSR-VTT experiments (canonical configs mirror reference scripts/msrvtt.sh).
# Usage: bash scripts/msrvtt.sh <num> [DATA_DIR] [OUTPUT_ROOT]
set -e
num=${1:?experiment number, e.g. 62}
DATA_DIR=${2:-${DATA_DIR:-$HOME/dataset/msrvtt}}
OUTPUT_ROOT=${3:-${OUTPUT_ROOT:-$HOME/output/msrvtt}}

train_csv="$DATA_DIR/msrvtt_data/MSRVTT_train.7k.csv"
val_csv="$DATA_DIR/msrvtt_data/MSRVTT_JSFUSION_test.csv"
data_path="$DATA_DIR/msrvtt_data/MSRVTT_data.json"
features_path="$DATA_DIR/MSRVTT_Videos"

common=(
  --do_train 1 --do_eval 1 --datatype msrvtt
  --train_csv "$train_csv" --val_csv "$val_csv"
  --data_path "$data_path" --features_path "$features_path"
  --output_dir "$OUTPUT_ROOT/eclip_msrvtt_$num"
  --max_words 32 --max_frames 12 --feature_framerate 3
  --batch_size 128 --batch_size_val 128 --epochs 5
  --optim AdamW --lr 2e-3 --coef_lr 1e-3 --wd 0.2 --warmup_proportion 0.1
  --loose_type --sim_header meanP --slice_framepos 2
  --expand_msrvtt_sentences --precision amp
  --pretrained_clip_name ViT-B/32 --num_thread_reader 8
)

case $num in
62) # kmediods++, frames 12->6 (reference scripts/msrvtt.sh:78-93)
  python main.py "${common[@]}" \
    --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 12 12 12 12 12 12 6 6 6 6 6 6
  ;;
63) # kmediods++, frames 12->4 (reference scripts/msrvtt.sh:94-108)
  python main.py "${common[@]}" \
    --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 12 12 12 12 12 12 4 4 4 4 4 4
  ;;
80) # two-stage: 12 frames x7 blocks then 4 (reference scripts/msrvtt.sh:109-123)
  python main.py "${common[@]}" \
    --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49 \
    --target_frames_blocks 12 12 12 12 12 12 12 4 4 4 4 4
  ;;
b16) # ViT-B/16 stress config
  python main.py "${common[@]}" --pretrained_clip_name ViT-B/16 \
    --cluster_inter 1 --cluster_algo kmediods++ \
    --cluster_num_blocks 196 196 196 196 196 196 160 160 160 160 160 160 \
    --target_frames_blocks 12 12 12 12 12 12 6 6 6 6 6 6
  ;;
*) echo "unknown experiment $num" && exit 1 ;;
esac
