# K-Net iterative kernel-update head over ResNetV1c-50-d8 (zoo)
_base_ = "../_base_/models/pspnet_r50.py"
model = dict(
    decode_head=dict(
        _delete_=True,
        type="IterativeDecodeHead", in_channels=2048, in_index=3,
        channels=256, num_stages=3, num_heads=8,
        feedforward_channels=1024, num_classes=19, dropout_ratio=0.1,
        align_corners=False),
)
