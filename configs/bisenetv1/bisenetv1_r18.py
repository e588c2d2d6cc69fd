# BiSeNetV1 over ResNet-18 context path (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="BiSeNetV1",
                  backbone_cfg=dict(type="ResNet", depth=18,
                                    base_channels=16, stem_channels=16),
                  spatial_channels=(16, 16, 16, 32),
                  context_channels=(32, 64, 128), out_channels=64),
    decode_head=dict(type="FCNHead", in_channels=64, channels=32,
                     num_convs=1, concat_input=False, in_index=0,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    auxiliary_head=dict(type="FCNHead", in_channels=32, channels=16,
                        num_convs=1, concat_input=False, in_index=1,
                        num_classes=19, dropout_ratio=0.1,
                        align_corners=False),
    test_cfg=dict(mode="whole"),
)
