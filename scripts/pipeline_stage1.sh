#!/usr/bin/env bash
# Stage-1 job farm — reference gs-simp/train.sh + scripts/gen_seq.sh:
# reconstruct several scenes, then generate orbit sequences per case.
# Usage: scripts/pipeline_stage1.sh <dataset_root> <scene[:case]>...
set -euo pipefail
DATA=${1:?dataset root}
shift
for entry in "$@"; do
  scene=${entry%%:*}
  case=${entry#*:}
  (
    python -m multiview_inpaint_tpu.pipelines.train_gs \
      -s "$DATA/$scene" -m "output/$scene"
    python -m multiview_inpaint_tpu.pipelines.gen_pc -m "output/$scene"
    if [[ -f "bds/del/$scene.obj" ]]; then
      python -m multiview_inpaint_tpu.pipelines.delete \
        -m "output/$scene" --box "bds/del/$scene.obj"
    fi
    if [[ "$case" != "$entry" ]]; then
      python -m multiview_inpaint_tpu.pipelines.gen_seq \
        -s "$DATA/$scene" -m "output/$scene" --scene_id "${scene}_${case}"
    fi
  ) &
done
wait
