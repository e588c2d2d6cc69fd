# PSPNet over MobileNetV2-d8 (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="MobileNetV2", strides=(1, 2, 2, 2, 1, 1, 1),
                  dilations=(1, 1, 1, 1, 1, 2, 4), out_indices=(1, 2, 4, 6)),
    decode_head=dict(type="PSPHead", in_channels=320, in_index=3,
                     channels=512, num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    auxiliary_head=dict(type="FCNHead", in_channels=96, in_index=2,
                        channels=256, num_convs=1, concat_input=False,
                        num_classes=19, dropout_ratio=0.1,
                        align_corners=False),
    test_cfg=dict(mode="whole"),
)
