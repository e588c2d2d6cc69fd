# Fast-SCNN (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="FastSCNN"),
    decode_head=dict(type="DepthwiseSeparableFCNHead", in_channels=128,
                     channels=128, num_convs=1, in_index=2, num_classes=19,
                     dropout_ratio=0.1, align_corners=False),
    auxiliary_head=dict(type="FCNHead", in_channels=64, channels=32,
                        num_convs=1, concat_input=False, in_index=0,
                        num_classes=19, dropout_ratio=0.1,
                        align_corners=False),
    test_cfg=dict(mode="whole"),
)
