# DMNet over ResNetV1c-50-d8 (zoo)
_base_ = "../_base_/models/pspnet_r50.py"
model = dict(
    decode_head=dict(
        _delete_=True,
        type="DMHead", in_channels=2048, in_index=3, channels=512,
        filter_sizes=(1, 3, 5, 7), num_classes=19, dropout_ratio=0.1,
        align_corners=False),
)
