#!/usr/bin/env bash
# Fetch the reference pretrained checkpoints (converted on load by
# patch2pix_tpu.evaluation.load_model / --pretrain):
#   patch2pix_pretrained.pth  — full Patch2Pix weights
#   ncn_ivd_5ep.pth           — NCNet pretrained 5 epochs on IVD
# Same artifacts as /root/reference/pretrained/download.sh.
set -e
OUT=${1:-pretrained}
mkdir -p "$OUT"
cd "$OUT"
command -v gdown >/dev/null || { echo "needs gdown (pip install gdown)"; exit 1; }
gdown --id 1hbM9apjPy6c1ZL5JzV9IlWKc4B1p5_uz -O patch2pix_pretrained.pth
gdown --id 1lHFqRf4siGpGDuVRfpkDHsHzbovtRl9G -O ncn_ivd_5ep.pth
echo "done: $(ls -la)"
