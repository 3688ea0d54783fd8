#!/bin/bash
# Stage 1 (reference scripts/train/ffhq/stage1.sh:36-55): train E0 against the
# frozen GAN. Loss recipe mirrors the reference flag-for-flag:
#   --l2_lambda 1 --vgg_lambda 0.8 --id_lambda 0.1 --latent_gt_lambda 1
#   --surf_sdf_lambda 1 --surf_normal_lambda 1 --uniform_pts_sdf_lambda 0.2
#   --eikonal_lambda 0.1 --lr 5e-5 --N_samples 18 (stage1_config)
# Pass --lpips-ckpt/--arcface-ckpt to use the real perceptual nets.
# TPU perf opt-ins (config defaults are reference-exact f32; env-override any back):
#   bf16+fast_sin frozen-teacher targets, bf16 conv-stack activations, and the
#   bf16 differentiated field (-13% step time, tolerance-pinned by test_precision)
python scripts/train.py --stage 1 \
  --sample-field-dtype "${SAMPLE_FIELD_DTYPE:-bfloat16}" \
  --dtype "${DTYPE:-bfloat16}" --field-dtype "${FIELD_DTYPE:-bfloat16}" \
  --iters "${ITERS:-100000}" --batch "${BATCH:-4}" --lr 5e-5 \
  --l2-lambda 1 --vgg-lambda 0.8 --id-lambda 0.1 --latent-gt-lambda 1 \
  --surf-sdf-lambda 1 --surf-normal-lambda 1 --uniform-pts-sdf-lambda 0.2 \
  --eikonal-lambda 0.1 \
  --val-every 2000 --ckpt-every 1000 --saveimg-every 100 \
  --work-dir "${WORK_DIR:-runs/train/stage1}" "$@"
