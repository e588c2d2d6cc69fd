# default runtime (reference _base_/default_runtime.py semantics,
# re-authored: JSONL text logging, no wandb by default)
log_config = dict(
    interval=50,
    hooks=[dict(type="TextLoggerHook", by_epoch=False)])
dist_params = dict(backend="ici")   # XLA collectives over ICI (SURVEY 2.3)
log_level = "INFO"
load_from = None
resume_from = None
workflow = [("train", 1)]
cudnn_benchmark = True              # tolerated no-op key (torch heritage)
