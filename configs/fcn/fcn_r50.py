# FCN ResNetV1c-50-d8 (zoo)
_base_ = "../_base_/models/pspnet_r50.py"

model = dict(
    decode_head=dict(
        _delete_=True,
        type="FCNHead",
        in_channels=2048,
        in_index=3,
        channels=512,
        num_convs=2,
        concat_input=True,
        dropout_ratio=0.1,
        num_classes=19,
        align_corners=False,
    ),
)
