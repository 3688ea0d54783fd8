#!/bin/bash
# Stage 2.1 (reference scripts/train/ffhq/stage2.1.sh): cycle-train the E1 local
# branch (netLocal + ADA aligner), E0 frozen, res_lambda 1.
python scripts/train.py --stage 2.1 \
  --iters "${ITERS:-50000}" --batch "${BATCH:-4}" --lr 1e-4 --res-lambda 1.0 \
  --pose-curriculum \
  --val-every 2000 --ckpt-every 1000 \
  --work-dir "${WORK_DIR:-runs/train/stage2.1}" ${CKPT:+--ckpt "$CKPT"} "$@"
