# CGNet + FCN head (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="CGNet", num_channels=(16, 32, 64),
                  num_blocks=(2, 2)),
    decode_head=dict(type="FCNHead", in_channels=128, channels=32,
                     num_convs=1, concat_input=False, in_index=2,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
