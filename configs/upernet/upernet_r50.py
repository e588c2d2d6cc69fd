# UPerNet ResNetV1c-50 (zoo)
_base_ = "../_base_/models/pspnet_r50.py"
model = dict(
    backbone=dict(strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1)),
    decode_head=dict(
        _delete_=True,
        type="UPerHead", in_channels=(256, 512, 1024, 2048), channels=512,
        num_classes=19, dropout_ratio=0.1, align_corners=False),
)
