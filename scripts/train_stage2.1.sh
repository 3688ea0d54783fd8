#!/bin/bash
# Stage 2.1 (reference scripts/train/ffhq/stage2.1.sh): cycle-train the E1 local
# branch (netLocal + ADA aligner), E0 frozen. Reference lambdas:
#   --l2_lambda 1 --vgg_lambda 0.8 --id_lambda 0.1 --res_lambda 1 --lr 5e-5
#   (shape lambdas all 0 in this stage)
# TPU perf opt-ins (config defaults are reference-exact f32; env-override any back):
#   bf16+fast_sin frozen-teacher targets, bf16 conv-stack activations, and the
#   bf16 differentiated field (-13% step time, tolerance-pinned by test_precision)
python scripts/train.py --stage 2.1 \
  --sample-field-dtype "${SAMPLE_FIELD_DTYPE:-bfloat16}" \
  --dtype "${DTYPE:-bfloat16}" --field-dtype "${FIELD_DTYPE:-bfloat16}" \
  --iters "${ITERS:-50000}" --batch "${BATCH:-4}" --lr 5e-5 \
  --l2-lambda 1 --vgg-lambda 0.8 --id-lambda 0.1 --res-lambda 1.0 \
  --pose-curriculum \
  --val-every 2000 --ckpt-every 1000 --saveimg-every 100 \
  --work-dir "${WORK_DIR:-runs/train/stage2.1}" ${CKPT:+--ckpt "$CKPT"} "$@"
