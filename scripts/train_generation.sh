#!/usr/bin/env bash
# Launch-script counterpart of the reference's script/train_generation.sh:
# same hyperparameters (opt-350m-class run: context=all, neighbor_mode=raw,
# lr 1e-4, per-device batch 2, grad-accum 16, 50 epochs x 10000 steps),
# TPU-native precision (--bf16; the reference's --fp16 actually trains fp32,
# SURVEY Q6) and mesh flags in place of torchrun/NCCL env.
set -e

MODEL_NAME=${MODEL_NAME:-facebook/opt-350m}   # local dir => real weight import
TASK=${TASK:-section}
CONTEXT=${CONTEXT:-all}
NEIGHBOR_MODE=${NEIGHBOR_MODE:-raw}
PEFT_TYPE=${PEFT_TYPE:-none}
DATA_DIR=${DATA_DIR:-./wikiweb2m/raw}
MESH=${MESH:-}            # e.g. "4,1" for 4-chip data parallel, "4,2" dp x tp

exec python -m mmgl_tpu.cli \
  --model_name_or_path "$MODEL_NAME" \
  --task "$TASK" \
  --context "$CONTEXT" \
  --neighbor_mode "$NEIGHBOR_MODE" \
  --peft_type "$PEFT_TYPE" \
  --data_dir "$DATA_DIR" \
  --max_input_length 512 \
  --max_output_length 128 \
  --per_device_train_batch_size 2 \
  --per_device_val_batch_size 2 \
  --grad_accumulation_steps 16 \
  --learning_rate 1e-4 \
  --epochs 50 \
  --steps_per_epoch 10000 \
  --val_steps_per_epoch 1000 \
  --bf16 true \
  --cache_neighbor_embeddings true \
  ${MESH:+--mesh_shape "$MESH"} \
  "$@"
