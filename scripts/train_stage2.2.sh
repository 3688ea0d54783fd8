#!/bin/bash
# Stage 2.2 (reference scripts/train/ffhq/stage2.2.sh): full runner with the SFT
# fusion block; --fix_ada freezes the aligner; adversarial term (adv_lambda 0.01,
# discriminator_lambda 0.01, r1 60) with the full-res D interleaved; EMA;
# progressive pose curriculum. Reference lambdas: --l2_lambda 1 --vgg_lambda 1
# --id_lambda 0.1 --res_lambda 1 --lr 5e-5.
# Pass --data /path/to/ffhq for real D training images (reference dataset_path).
# TPU perf opt-ins (config defaults are reference-exact f32; env-override any back):
#   bf16+fast_sin frozen-teacher targets, bf16 conv-stack activations, and the
#   bf16 differentiated field (-13% step time, tolerance-pinned by test_precision)
python scripts/train.py --stage 2.2 \
  --sample-field-dtype "${SAMPLE_FIELD_DTYPE:-bfloat16}" \
  --dtype "${DTYPE:-bfloat16}" --field-dtype "${FIELD_DTYPE:-bfloat16}" \
  --iters "${ITERS:-50000}" --batch "${BATCH:-4}" --lr 5e-5 \
  --l2-lambda 1 --vgg-lambda 1 --id-lambda 0.1 --res-lambda 1.0 \
  --fix-ada --ema --pose-curriculum \
  --adv-lambda 0.01 --r1 60 --d-reg-every 16 \
  --val-every 2000 --ckpt-every 1000 --saveimg-every 100 \
  --work-dir "${WORK_DIR:-runs/train/stage2.2}" ${CKPT:+--ckpt "$CKPT"} "$@"
