#!/bin/bash
# Stage 1 (reference scripts/train/ffhq/stage1.sh): train E0 against the frozen GAN
# with 2D rec + latent-gt + 3D shape supervision.
python scripts/train.py --stage 1 \
  --iters "${ITERS:-100000}" --batch "${BATCH:-4}" --lr 1e-4 \
  --val-every 2000 --ckpt-every 1000 \
  --work-dir "${WORK_DIR:-runs/train/stage1}" "$@"
