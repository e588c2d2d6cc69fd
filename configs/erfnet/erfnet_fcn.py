# ERFNet + FCN head (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="ERFNet", enc_stage_non_bottlenecks=(2, 2),
                  dec_stages_non_bottleneck=(1, 1)),
    decode_head=dict(type="FCNHead", in_channels=16, channels=16,
                     num_convs=1, concat_input=False, in_index=0,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
