#!/usr/bin/env bash
# Canonical MOSEI training command — the TPU-native equivalent of the
# reference's run.sh (same flag surface; reference run.sh:1-16).
# Additive flags shown commented are the production configuration.
python3 -m multimodal_transformer_robustness_tpu.cli.main \
  --dataset mosei_senti \
  --attn_dropout 0.1 0.1 0.0 0.0 \
  --modality_pool 2 \
  --num_epochs 20 \
  --lr 0.0001 \
  --when 120 \
  --dimension 200 \
  --num_heads 8 \
  --head_dim 25 \
  --layers_single_attn 3 \
  --layers_self_attn 2 \
  --batch_size 16 \
  --experiment_type test_single \
  --data_path "${MOSEI_DATA:-/data/dataset/MOSEI/processed/all}" \
  --model_path "${MODEL_PATH:-./model_ck}" \
  "$@"
  # Production additions (TPU-native; see README "Measured results"):
  #   --compute_dtype bfloat16 --batch_size 1024   # throughput-optimal
  #   --cache_text                                 # frozen BERT once per dataset
  #   --device_data                                # whole-dataset HBM residency
  #   --resume                                     # exact continue after interrupt
  #   --bert_dir <hf-bert-dir>                     # real pretrained weights
