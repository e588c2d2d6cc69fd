# STDC1 context-path net (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="STDCContextPathNet",
                  backbone_cfg=dict(type="STDCNet", stdc_type="STDCNet1",
                                    channels=(8, 8, 32, 64, 128)),
                  out_channels=32, ffm_channels=48),
    decode_head=dict(type="FCNHead", in_channels=48, channels=32,
                     num_convs=1, concat_input=False, in_index=0,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    auxiliary_head=dict(type="STDCHead", in_channels=32, channels=16,
                        in_index=3, num_classes=2, dropout_ratio=0.1,
                        align_corners=False),
    test_cfg=dict(mode="whole"),
)
