#!/usr/bin/env bash
# Fetch the SuiteSparse benchmark corpus (same 8-matrix, 3-tier set as the
# reference's scripts/download_matrices.sh). Requires network access; in the
# air-gapped build environment use the synthetic generators
# (mark:N, laplace2d:N, grcar:N, clement:N) instead.
set -euo pipefail

DEST="${1:-matrices}"
mkdir -p "$DEST"

BASE="https://suitesparse-collection-website.herokuapp.com/mat"

# easy tier
EASY=(HB/1138_bus Bai/mhd1280b Bai/rdb1250)
# medium tier
MEDIUM=(HB/bcsstk16 HB/bcsstk18 Nasa/nasasrb)
# hard tier (af23560: ~30s for top-3 LR with ARPACK on a laptop)
HARD=(Bai/af23560 Bai/olm5000)

for m in "${EASY[@]}" "${MEDIUM[@]}" "${HARD[@]}"; do
    name=$(basename "$m")
    if [[ -f "$DEST/$name.mat" ]]; then
        echo "have $name.mat"
    else
        echo "fetching $m"
        wget -q -O "$DEST/$name.mat" "$BASE/$m.mat"
    fi
done
echo "done -> $DEST/"
