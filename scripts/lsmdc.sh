#!/usr/bin/env bash
# LSMDC experiments (reference scripts/lsmdc.sh).
set -e
num=${1:?experiment number: 04|09|22|23}
DATA_DIR=${2:-${DATA_DIR:-$HOME/dataset/lsmdc}}
OUTPUT_ROOT=${3:-${OUTPUT_ROOT:-$HOME/output/lsmdc}}

common=(
  --do_train 1 --do_eval 1 --datatype lsmdc
  --data_path "$DATA_DIR/lsmdc_data" --features_path "$DATA_DIR/videos"
  --output_dir "$OUTPUT_ROOT/eclip_lsmdc_$num"
  --max_words 32 --max_frames 12 --feature_framerate 3
  --batch_size 128 --batch_size_val 128 --epochs 5
  --optim AdamW --lr 2e-3 --coef_lr 1e-3 --wd 0.2 --warmup_proportion 0.1
  --loose_type --sim_header meanP --slice_framepos 2 --precision amp
  --pretrained_clip_name ViT-B/32 --num_thread_reader 8
)
kb32="--cluster_num_blocks 49 49 49 49 49 49 49 49 49 49 49 49"

case $num in
04) python main.py "${common[@]}" --cluster_inter 1 --cluster_algo kmediods++ $kb32 \
      --target_frames_blocks 12 12 12 12 12 12 6 6 6 6 6 6 ;;
09) python main.py "${common[@]}" --cluster_inter 1 --cluster_algo kmediods++ $kb32 \
      --target_frames_blocks 12 12 12 12 12 12 4 4 4 4 4 4 ;;
22) python main.py "${common[@]}" --cluster_inter 1 --cluster_algo spectral \
      --spectral_graph KNN $kb32 \
      --target_frames_blocks 12 12 12 12 12 12 6 6 6 6 6 6 ;;
23) python main.py "${common[@]}" --cluster_inter 1 --cluster_algo spectral \
      --spectral_graph KNN $kb32 \
      --target_frames_blocks 12 12 12 12 12 12 4 4 4 4 4 4 ;;
*) echo "unknown experiment $num" && exit 1 ;;
esac
