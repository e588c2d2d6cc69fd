# ICNet (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="ICNet", depth_blocks=(2, 2, 2, 2),
                  psp_out_channels=64, out_channels=(16, 32, 32)),
    neck=dict(type="ICNeck", in_channels=(16, 32, 32), out_channels=32),
    decode_head=dict(type="FCNHead", in_channels=32, channels=32,
                     num_convs=1, concat_input=False, in_index=-1,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
