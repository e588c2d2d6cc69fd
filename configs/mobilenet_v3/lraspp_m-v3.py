# LR-ASPP over MobileNetV3-large (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="MobileNetV3", arch="large", out_indices=(1, 3, 16)),
    decode_head=dict(type="LRASPPHead", in_channels=(16, 24, 960),
                     in_index=(0, 1, 2), channels=128, num_classes=19,
                     dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
