# BiSeNetV2 (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="BiSeNetV2", detail_channels=(16, 16, 32),
                  semantic_channels=(8, 16, 32, 64), bga_channels=32),
    decode_head=dict(type="FCNHead", in_channels=32, channels=32,
                     num_convs=1, concat_input=False, in_index=0,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
