# Training / inference recipes (ref: scripts/examples.sh, finetune_lgm.sh).
# Single host (all local chips become the dp axis automatically):
python -m lgm_tpu.train big --workspace workspace_big --data-mode lvis \
    --data-path-rendering /data/lvis
# Debug-scale run on synthetic data:
python -m lgm_tpu.train small --workspace workspace_debug --total-steps 2000
# LVIS finetune recipe (ref: scripts/finetune_lgm.sh: fovy 60, output 320,
# 6 input views):
python -m lgm_tpu.train big --workspace workspace_ft --data-mode lvis \
    --data-path-rendering /data/lvis --fovy 60 --output-size 320 --num-input-views 6 \
    --resume workspace_big/ckpt_30000
# Diffusion U-Net finetune (multi-view eps-loss; BASELINE cfg 5):
python -m lgm_tpu.diffusion.train --pipeline mvdream --ckpt /ckpts/mvdream \
    --workspace ws_mvft --data-mode lvis --data-path /data/lvis \
    --batch-size 4 --total-steps 10000 --export ws_mvft/pipeline
# Inference from four prepared views:
python -m lgm_tpu.infer big --resume workspace_big/ckpt_30000 \
    --mv-images v0.png v1.png v2.png v3.png --workspace out
# Mesh export:
python -m lgm_tpu.convert big --test-path out/v0.ply
# Pod-scale (BASELINE cfg 5): 2-way view sharding (sharded-Gaussian
# all-gather along vp) + ZeRO-1 optimizer-state sharding over dp:
python -m lgm_tpu.train big --workspace ws_pod --data-mode lvis \
    --data-path-rendering /data/lvis --vp 2 --zero1 true
# Multi-host: run the same train command on every host after setting
# JAX distributed env (jax.distributed.initialize is called when
# LGM_TPU_MULTIHOST=1).
# Preemptible pods: SIGTERM saves a full-state checkpoint; restart with
# --resume auto to continue from the newest one in the workspace:
python -m lgm_tpu.train big --workspace ws_pod --resume auto
# Diffusion finetune EMA (on by default; exported weights are the EMA
# shadow). Disable with --ema-decay 0:
python -m lgm_tpu.diffusion.train --pipeline mvdream --ema-decay 0.9999
# Data loading decodes through the native C++ runtime when it builds
# (native/dataload.cpp); force the cv2 fallback with:
LGM_TPU_NATIVE_LOADER=0 python -m lgm_tpu.train big --data-mode lvis ...
# NaN hunting (trades speed for checks; see SURVEY §5.2 — the reference
# has no sanitizers):
python -m lgm_tpu.train small --debug-nans true --total-steps 100
