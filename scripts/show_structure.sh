#!/bin/bash
# Print the project layout and where to start (reference scripts/show_structure.sh analog).
cd "$(dirname "$0")/.." || exit 1

echo "============================================"
echo "lss-carla-tpu — project structure"
echo "============================================"
if command -v tree >/dev/null 2>&1; then
    tree -L 2 --dirsfirst --charset ascii \
        -I '__pycache__|*.pyc|.git|wandb|runs|*.png|*.jpg|viz_outputs'
else
    find . -maxdepth 2 -not -path '*/.git*' -not -path '*/__pycache__*' \
        -not -name '*.pyc' -not -path './runs*' -not -path './viz_outputs*' \
        | sort | sed 's|^\./||; s|[^/]*/|  |g'
fi

echo ""
echo "Key files:"
echo "  Training CLI:   train_simbev.py  (nuScenes: scripts/train_nuscenes.py)"
echo "  Configs:        configs/simbev_default.sh, configs/simbev_small.sh"
echo "  Data loaders:   lss_carla_tpu/data/{simbev,nuscenes,loader}.py"
echo "  Model:          lss_carla_tpu/models/lss.py"
echo "  Splat kernels:  lss_carla_tpu/ops/{splat,splat_pallas}.py"
echo "  Distributed:    lss_carla_tpu/parallel/"
echo "  Serving:        lss_carla_tpu/serving.py, lss_carla_tpu/server.py"
echo "  Eval/viz:       lss_carla_tpu/explore.py"
echo "  Debug harness:  debug/"
echo "  Docs:           docs/   Quick start: QUICKSTART.md"
echo "============================================"
