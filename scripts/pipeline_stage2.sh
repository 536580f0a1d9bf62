#!/usr/bin/env bash
# Stage 2-5 for one case — reference scripts/{sds,sds_seq,rec,vis}.sh:
# coarse SDS geometry -> coarse renders + depth hints -> SVD inpainting
# -> masks -> stage-2 reconstruction -> videos.
# Usage: scripts/pipeline_stage2.sh <dataset_root> <scene> <case> <ctrl_id>
set -euo pipefail
DATA=${1:?dataset root}
SCENE=${2:?scene}
CASE=${3:?case}
CTRL=${4:-0}
SID="${SCENE}_${CASE}"

python -m multiview_inpaint_tpu.pipelines.sds_train \
  --scene_id "$SID" -s "$DATA/$SCENE" -m "output_sds/$SID" \
  --bg_model "output/$SCENE" ${SD_CKPT:+--sd_ckpt "$SD_CKPT"} \
  ${TEXT_EMBS:+--text_embs "$TEXT_EMBS"} ${SD_CKPT:+ } ${SD_CKPT:---no_sds}

python -m multiview_inpaint_tpu.pipelines.gen_seq \
  -s "$DATA/$SCENE" -m "output_sds/$SID" --scene_id "$SID" --sds \
  --iteration 5000
python -m multiview_inpaint_tpu.pipelines.gen_depth \
  --scene_id "$SID" -s "$DATA/$SCENE" -m "output/$SCENE" \
  --sds_model "output_sds/$SID"

python -m multiview_inpaint_tpu.pipelines.svd_test --data_root inpaint \
  ${SVD_BASE:+--base_ckpt "$SVD_BASE"} ${SVD_CTRL:+--ctrl_ckpt "$SVD_CTRL"}

python -m multiview_inpaint_tpu.pipelines.seg_masks \
  --scene_id "$SID" --ctrl_id "$CTRL" --auto
python -m multiview_inpaint_tpu.pipelines.inpaint_rec \
  --scene_id "$SID" --ctrl_id "$CTRL" -s "$DATA/$SCENE" \
  -m "output_rec/$SID" --bg_model "output/$SCENE"

python -m multiview_inpaint_tpu.pipelines.vis_render \
  --scene_id "$SID" -s "$DATA/$SCENE" -m "output/$SCENE" \
  --ctrl_id "$CTRL"
python -m multiview_inpaint_tpu.pipelines.vis \
  --frames_dir "vis/vis_video/inpainted/$SID/ctrl_$CTRL/renders"
