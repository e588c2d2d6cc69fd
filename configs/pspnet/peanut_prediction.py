# The PEANUT target-prediction model (parity with the reference's
# /root/reference/nav/pred_model_cfg.py:1-42): PSPNet-R50v1c over 14-channel
# semantic maps, 6 goal classes, multi-label BCE with a 0.4-weight FCN aux.
_base_ = "../_base_/models/pspnet_r50.py"

model = dict(
    backbone=dict(in_channels=14),
    decode_head=dict(
        num_classes=6,
        loss_decode=dict(type="MultiLabelBCELoss", loss_weight=1.0),
    ),
    auxiliary_head=dict(
        num_classes=6,
        loss_decode=dict(type="MultiLabelBCELoss", loss_weight=0.4),
    ),
)

# training recipe (reference pred_model_cfg.py:137-142)
optimizer = dict(type="Adam", lr=0.0005)
lr_config = dict(policy="poly", power=0.9, min_lr=1e-05, by_epoch=False)
runner = dict(type="IterBasedRunner", max_iters=60000)
checkpoint_config = dict(by_epoch=False, interval=2000)
log_config = dict(interval=500)
evaluation = dict(interval=60001, metric="mIoU", pre_eval=True)
data = dict(samples_per_gpu=8, workers_per_gpu=8)
crop_size = (960, 960)
