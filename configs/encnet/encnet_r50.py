# EncNet over ResNetV1c-50-d8 (zoo)
_base_ = "../_base_/models/pspnet_r50.py"
model = dict(
    decode_head=dict(
        _delete_=True,
        type="EncHead", in_channels=(512, 1024, 2048), in_index=(1, 2, 3),
        channels=512, num_codes=32, use_se_loss=True, add_lateral=False,
        num_classes=19, dropout_ratio=0.1, align_corners=False),
)
