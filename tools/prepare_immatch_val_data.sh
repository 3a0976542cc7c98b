#!/usr/bin/env bash
# Fetch the 5 PhotoTourism validation scenes used by the per-epoch
# image-matching validation (same data contract as the reference's
# /root/reference/data/prepare_immatch_val_data.sh).
set -e

DATA_DIR=${1:-data/immatch_benchmark/val_dense}
mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

for scene in reichstag sacre_coeur st_peters_square taj_mahal temple_nara_japan; do
    if [ -d "$scene" ]; then
        echo "$scene already present, skipping"
        continue
    fi
    echo "Fetching $scene ..."
    wget -q "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/${scene}.tar.gz"
    tar -xzf "${scene}.tar.gz"
    rm -f "${scene}.tar.gz"
done

echo "Done. Now run: python tools/precompute_immatch_val_ovs.py --data_root $DATA_DIR"
